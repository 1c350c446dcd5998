"""Span-level content resolution, field extraction, and output assembly.

This is the one batch entrypoint (:func:`process_batch`) that both the
Spark `mapInArrow` stage and the golden-fixture generator call, so the
span-sequence invariant ``(kind, text, media_ref, order)`` (FIXTURES.md §4)
has a single source of truth.

Per input span, in offset order, the output sequence is:

  1. one normalized-text span  (kind='text', media_ref carried through,
     text = kind-specific normalized content), then
  2. one ``field:<name>`` span per non-null extracted field, in the fixed
     order of :data:`ocr_spark.schemas.FIELD_SPAN_ORDER`, media_ref "".

Field values come from the reference's merge lattice
(/root/reference/src/services/invoice_service.py:249-362): LLM family
first, Swiss family as falsy-fallback, then defaults.  The Swiss DB
lookups (company/supplier) contribute nothing — the reference's SQL
queries name columns that don't exist (``supplier_name``,
``company_erp_code`` vs the LLM path's working ``social_reason`` query),
fail, and return None (swiss_invoice_extractor.py:136-142,177-182 vs
database/models.py:20-48) — so the lattice here models them as None.
"""

from __future__ import annotations

from datetime import date
from decimal import Decimal

import pandas as pd

from ocr_spark.kernel import basic, htmlx, llm, pdfdoc, swiss, textnorm
from ocr_spark.schemas import FIELD_SPAN_ORDER

DEFAULT_AS_OF = date(2025, 8, 19)  # pipeline as_of_date (FIXTURES.md §5)
IMAGE_MARKER = b"FAKEIMG:"


def resolve_content(kind: str, text: str | None, payload: bytes | None) -> str:
    """Raw text content of a span, before any extractor-family cleaning."""
    if kind in ("text", "ocr"):
        return text or ""
    if kind == "html":
        return htmlx.extract_main_text_one(text or "")
    if kind == "pdf":
        if payload is None:
            return ""
        try:
            return "\n".join(t for _, t in pdfdoc.parse_pages(payload))
        except NotImplementedError:
            return ""
    if kind == "image":
        # deterministic stub: real raster decode + OCR needs cv2/tesseract,
        # absent here; payloads carry a marker with the "OCR" text.
        if payload and payload.startswith(IMAGE_MARKER):
            return payload[len(IMAGE_MARKER):].decode("utf-8", errors="replace")
        return ""
    return text or ""


def normalize_content(kind: str, content: str) -> str:
    """Kind-specific normalized text for the output 'text' span."""
    series = pd.Series([content])
    if kind == "ocr":
        return textnorm.normalize_ocr(series).iloc[0]
    return textnorm.clean_llm(series).iloc[0]


def _dec(v) -> Decimal | None:
    return v if isinstance(v, Decimal) else (None if v is None else Decimal(str(v)))


def merged_fields(
    contents: pd.Series,
    as_of_date: date = DEFAULT_AS_OF,
    companies: list[dict] | None = None,
    suppliers: list[dict] | None = None,
) -> pd.DataFrame:
    """LLM ▷ Swiss ▷ default merge over a batch of raw span contents.

    Column types: dates as datetime.date, money as Decimal, rest str/None.
    """
    l = llm.extract(contents, as_of_date=as_of_date, companies=companies, suppliers=suppliers)
    s = swiss.extract(contents)
    b = basic.extract(contents)

    rows = []
    for i in contents.index:
        lr, sr, br = l.loc[i], s.loc[i], b.loc[i]

        # invoice_service.py:249-263 — LLM number always present (md5 fallback)
        number = lr["invoice_number"] or sr["invoice_number"] or "INV-DEFAULT"
        # :266-277 — LLM date always present (as_of fallback)
        inv_date = lr["invoice_date"] or sr["invoice_date"]
        # :294-309 — LLM customer.name carries the ERP code; Swiss is None
        company = lr["company_erp_code"] or "SITSE"
        # :279-292
        supplier = lr["supplier_name"]
        if not supplier or supplier == "Fournisseur Inconnu":
            supplier = "Fournisseur Inconnu"
        # :313-321
        currency = lr["currency"] or sr["currency"] or "CHF"
        # :323-356 — falsy coalesce (a 0.00 counts as absent), defaults 0.00
        ht = _dec(lr["total_ht"]) or _dec(sr["total_ht"]) or Decimal("0.00")
        tva = _dec(lr["tva"]) or _dec(sr["tva"]) or Decimal("0.00")
        ttc = _dec(lr["total_ttc"]) or _dec(sr["total_ttc"]) or Decimal("0.00")

        rows.append(
            {
                "invoice_number": number,
                "invoice_date": inv_date.isoformat() if inv_date else None,
                "due_date": lr["due_date"].isoformat() if lr["due_date"] else None,
                "currency": currency,
                "total_ht": str(ht),
                "tva": str(tva),
                "total_ttc": str(ttc),
                "amount_due": str(ttc),
                "siret": br["siret"],
                "vat_number": br["vat_number"],
                "supplier_name": supplier,
                "company_erp_code": company,
                "email": lr["email"],
                "phone": lr["phone"],
                "confidence": float(br["confidence"]),
            }
        )
    out = pd.DataFrame.from_records(rows)
    out.index = contents.index
    return out


def process_batch(
    batch: pd.DataFrame,
    as_of_date: date = DEFAULT_AS_OF,
    companies: list[dict] | None = None,
    suppliers: list[dict] | None = None,
) -> pd.DataFrame:
    """Span rows in → flat output-span rows out.

    Input columns:  doc_id, kind, text, media_ref, offset, payload(bytes|None)
    Output columns: doc_id, offset, seq, kind, text, media_ref
    (seq orders the spans emitted for one input span).
    """
    if len(batch) == 0:
        return pd.DataFrame(columns=["doc_id", "offset", "seq", "kind", "text", "media_ref"])

    contents = pd.Series(
        [
            resolve_content(k, t, p)
            for k, t, p in zip(batch["kind"], batch["text"], batch["payload"])
        ],
        index=batch.index,
    )
    fields = merged_fields(contents, as_of_date, companies, suppliers)

    out_rows = []
    for i in batch.index:
        row = batch.loc[i]
        norm = normalize_content(row["kind"], contents.loc[i])
        out_rows.append(
            {
                "doc_id": row["doc_id"],
                "offset": int(row["offset"]),
                "seq": 0,
                "kind": "text",
                "text": norm,
                "media_ref": row["media_ref"] or "",
            }
        )
        seq = 1
        frow = fields.loc[i]
        for name in FIELD_SPAN_ORDER:
            value = frow.get(name)
            if value is None or (isinstance(value, float) and pd.isna(value)):
                continue
            out_rows.append(
                {
                    "doc_id": row["doc_id"],
                    "offset": int(row["offset"]),
                    "seq": seq,
                    "kind": f"field:{name}",
                    "text": str(value),
                    "media_ref": "",
                }
            )
            seq += 1
    return pd.DataFrame.from_records(out_rows)
