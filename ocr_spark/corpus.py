"""Fixture corpus: verbatim reference test inputs + deterministic variants.

Texts are vendored verbatim (whitespace-exact) from
/root/reference/tests/test_use_cases.py and FIXTURES.md §3 — they are test
DATA, not code.  ``variants()`` derives token-salted copies (numbers,
amounts, dates templated) so the corpus scales deterministically to any
size without external data (seeded by index, order-independent).
"""

from __future__ import annotations

import hashlib

# tests/test_use_cases.py:28-43
F_SIMPLE = """
        ENTREPRISE ABC
        123 Rue de la Paix
        75001 Paris
        SIRET: 12345678901234
        TVA: FR12345678901

        FACTURE F2025-001
        Date: 19/08/2025

        Client: Société XYZ

        Prestation de service    1    500.00    500.00
        TVA 20%                              100.00
        Total TTC                            600.00
        """

# tests/test_use_cases.py:60-85
F_COMPLEX = """
        SARL TECH SOLUTIONS
        456 Avenue des Champs
        69000 Lyon
        SIRET: 98765432109876
        N° TVA Intracommunautaire: FR98765432109

        FACTURE N° FACT-2025-0042
        Date d'émission: 15/08/2025
        Date d'échéance: 15/09/2025

        Facturé à:
        ENTREPRISE CLIENT SARL
        789 Boulevard Central
        13000 Marseille

        Désignation                    Qté    P.U. HT    Total HT
        Développement application       10     150.00    1500.00
        Formation utilisateurs           2     300.00     600.00
        Maintenance mensuelle            1     200.00     200.00

        Sous-total HT                                   2300.00
        TVA 20%                                          460.00
        Total TTC                                       2760.00
        Net à payer                                     2760.00
        """

# tests/test_use_cases.py:108-111
F_MISSING = """
        FACTURE
        Total: 1200.00 €
        """

# tests/test_use_cases.py:322-334
F_FRENCH = """
        SARL EXEMPLE
        SIRET: 12345678901234
        N° TVA: FR12345678901

        FACTURE N° F2025-001
        Date: 19/08/2025

        Prestations                     1000.00 €
        TVA 20%                          200.00 €
        Total TTC                       1200.00 €
        """

# tests/test_use_cases.py:348-352
F_VAT = """
        Montant HT: 1000.00 €
        TVA 20%: 200.00 €
        Total TTC: 1200.00 €
        """

# FIXTURES.md §3 F-SWISS (synthesized from test_results.json + the Swiss
# extractor's pattern vocabulary)
F_SWISS = (
    "N° de facture : 110 009 850 987 Date : 17 février 2025 "
    "Montant à payer CHF 1'858.73 Total (hors TVA) CHF 1'722.38 TVA CHF 136.35"
)

# A Swiss-flavored multi-line variant exercising supplier-dim matching
F_SWISS_ROMANDE = (
    "Romande Energie SA\nRue de Lausanne 53, 1260 Nyon\n"
    "Facture électricité SITSE\n"
    "N° de facture : 24 044 118 Date : 26 avril 2024\n"
    "Electricité CHF 120.00 TVA CHF 8.10\n"
    "Montant à payer CHF 128.10"
)

BASE_FIXTURES: dict[str, str] = {
    "F-SIMPLE": F_SIMPLE,
    "F-COMPLEX": F_COMPLEX,
    "F-MISSING": F_MISSING,
    "F-FRENCH": F_FRENCH,
    "F-VAT": F_VAT,
    "F-SWISS": F_SWISS,
    "F-SWISS-ROMANDE": F_SWISS_ROMANDE,
}

# FIXTURES.md §2 — dimension seed rows (from insert_test_data.py:40-117);
# dim order = load order = match priority.
COMPANIES = [
    {
        "erp_code": "SITSE",
        "name": "SITSE Services Industriels de Terre-Sainte et Environs",
        "address": "7 rond point de stockholm, 1260 Nyon, Suisse",
    }
]
SUPPLIERS = [
    {
        "social_reason": "YAPI Electromécanique SA",
        "rcs": "CHE-234.567.890",
        "address": "Rue de la Gare 12, 1260 Nyon, Suisse",
        "email": "contact@yapi-electro.ch",
        "phone_number": "+41 22 361 12 34",
        "contact_name": "Jean-Pierre Müller",
    },
    {
        "social_reason": "STS Soudure - Tuyauterie - Service",
        "rcs": "CHE-345.678.901",
        "address": "Zone Industrielle, Chemin des Plantaz 15, 1260 Nyon, Suisse",
        "email": "info@sts-nyon.ch",
        "phone_number": "+41 22 361 45 67",
        "contact_name": "Pierre Martin",
    },
    {
        "social_reason": "SI NYON",
        "rcs": "CHE-456.789.012",
        "address": "Services Industriels de Nyon, Place du Château 3, 1260 Nyon, Suisse",
        "email": "services@nyon.ch",
        "phone_number": "+41 22 316 40 40",
        "contact_name": "Marie Leroy",
    },
    {
        "social_reason": "Romande Energie Nyon",
        "rcs": "CHE-567.890.123",
        "address": "Rue de Lausanne 53, 1260 Nyon, Suisse",
        "email": "nyon@romande-energie.ch",
        "phone_number": "+41 22 316 95 95",
        "contact_name": "Laurent Blanc",
    },
]

_NAMES = list(BASE_FIXTURES)


def _h(s: str) -> int:
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")


def variant_text(index: int) -> tuple[str, str]:
    """Deterministic corpus item #index → (variant_name, text).

    Salting replaces digit groups with index-derived ones so invoice
    numbers, amounts and dates differ across variants while keeping the
    extraction structure; derivation depends only on ``index``.
    """
    base_name = _NAMES[index % len(_NAMES)]
    text = BASE_FIXTURES[base_name]
    salt = _h(f"corpus-{index}")
    day = 1 + salt % 28
    month = 1 + (salt // 28) % 12
    amt = 100 + salt % 9000
    num = 1000 + salt % 900000
    text = (
        text.replace("F2025-001", f"F2025-{num % 1000:03d}")
        .replace("FACT-2025-0042", f"FACT-2025-{num % 10000:04d}")
        .replace("19/08/2025", f"{day:02d}/{month:02d}/2025")
        .replace("110 009 850 987", f"{num} {amt}")
        .replace("1200.00", f"{amt}.00")
        .replace("2760.00", f"{amt + 460}.00")
        .replace("2300.00", f"{amt}.00")
    )
    return f"{base_name}#v{index}", text


def corpus(n: int) -> list[tuple[str, str]]:
    """First the base fixtures (verbatim), then salted variants up to n."""
    items = list(BASE_FIXTURES.items())
    for i in range(max(0, n - len(items))):
        items.append(variant_text(i))
    return items[:n]
