"""Golden-fixture generator: EXECUTES the reference extractors.

Runs the reference code at /root/reference (read-only) on the fixture
corpus and records the actual outputs to tests/fixtures/goldens.json.
Golden values are executed behavior, never the reference test file's
expectations, which demonstrably diverge from the code (SURVEY.md §5.3).

Determinism fixes applied while generating (sanctioned, FIXTURES.md §5):
  * llm date fallback `date.today()` → 2025-08-19 (module-level date patch)
  * llm fallback number `INV-{now}-{md5[:8]}` → recorded as INV-{md5[:8]}

Usage: python tools/gen_goldens.py [n_corpus_items]
"""

from __future__ import annotations

import json
import sys
import types
from datetime import date
from decimal import Decimal
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
REFERENCE = Path("/root/reference")
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REFERENCE))

from ocr_spark.corpus import COMPANIES, SUPPLIERS, corpus  # noqa: E402


def _install_stubs() -> None:
    """Stub the reference's loguru/sqlalchemy/db deps (not installed here)."""

    class _Log:
        def __getattr__(self, _):
            return lambda *a, **k: None

    logger_mod = types.ModuleType("src.utils.logger")
    logger_mod.app_logger = _Log()
    sys.modules["src.utils.logger"] = logger_mod

    loguru = types.ModuleType("loguru")
    loguru.logger = _Log()
    sys.modules["loguru"] = loguru

    sqlalchemy = types.ModuleType("sqlalchemy")
    sqlalchemy.text = lambda q: q
    sys.modules["sqlalchemy"] = sqlalchemy
    sqlalchemy_orm = types.ModuleType("sqlalchemy.orm")
    sqlalchemy_orm.Session = object
    sys.modules["sqlalchemy.orm"] = sqlalchemy_orm
    sqlalchemy.orm = sqlalchemy_orm

    conn = types.ModuleType("src.database.connection")

    def _get_db():
        raise RuntimeError("no database in golden generation")
        yield  # pragma: no cover

    conn.get_db = _get_db
    sys.modules["src.database.connection"] = conn


def _jsonable(v):
    if isinstance(v, Decimal):
        return {"__decimal__": str(v)}
    if isinstance(v, date):
        return {"__date__": v.isoformat()}
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    return v


def main(n_items: int = 40) -> None:
    _install_stubs()

    from src.extraction.data_extractor import DataExtractor  # noqa: E402
    import src.extraction.llm_enhanced_extractor as llm_mod  # noqa: E402
    import src.extraction.ml_enhanced_extractor as ml_mod  # noqa: E402
    import src.extraction.swiss_invoice_extractor as swiss_mod  # noqa: E402

    # freeze `date.today()` (llm_enhanced_extractor.py:241)
    class _FrozenDate(date):
        @classmethod
        def today(cls):
            return cls(2025, 8, 19)

    llm_mod.date = _FrozenDate

    basic = DataExtractor()
    llm = object.__new__(llm_mod.LLMEnhancedExtractor)  # skip DB __init__
    llm.companies_data = [dict(c) for c in COMPANIES]
    llm.suppliers_data = [dict(s) for s in SUPPLIERS]
    swiss = swiss_mod.SwissInvoiceExtractor()

    # ML family: skip DB __init__; db.execute raises, which is exactly the
    # deployed behavior of the similarity/history queries (pg_trgm missing /
    # caught per-method), so every DB branch degrades as in production.
    class _FailingDB:
        def execute(self, *a, **k):
            raise RuntimeError("no database in golden generation")

        def close(self):  # __del__ calls this
            pass

    ml = object.__new__(ml_mod.MLEnhancedExtractor)
    ml.db = _FailingDB()

    goldens = {}
    for name, text in corpus(n_items):
        entry: dict = {"text": text}

        # --- basic family (DataExtractor.extract_invoice_data) -------------
        inv = basic.extract_invoice_data(text)
        d = inv.dict() if hasattr(inv, "dict") else inv.model_dump()
        d.get("metadata", {}).pop("processing_date", None)
        entry["basic"] = _jsonable(d)

        # --- llm family helpers (on the llm-cleaned text) -------------------
        clean = llm._clean_and_prepare_text(text)
        number = llm._llm_extract_invoice_number(clean)
        if number.startswith("INV-") and len(number.split("-")) == 3:
            # fallback shape INV-<ts>-<md5[:8]> → determinize (FIXTURES.md §5)
            number = f"INV-{number.rsplit('-', 1)[1]}"
        dates = llm._llm_extract_dates(clean)
        amounts = llm._llm_extract_amounts(clean)
        validated = llm._intelligent_validation_and_correction(
            {"amounts": dict(amounts), "dates": dict(dates)}, clean
        )
        entry["llm"] = _jsonable(
            {
                "clean_text": clean,
                "invoice_number": number,
                "dates": validated["dates"],
                "amounts": validated["amounts"],
                "currency": llm._llm_extract_currency(clean),
                "contact": llm._llm_extract_contact_info(clean),
                "company": llm._find_company_in_text(clean),
                "supplier": llm._find_supplier_in_text(clean),
            }
        )

        # --- ml family (MLEnhancedExtractor minus the DB save) --------------
        ml_base = basic.extract_invoice_data(text)
        ml_e1 = ml._enhance_with_historical_data(ml_base, text)
        ml_e2 = ml._enhance_with_pattern_recognition(ml_e1, text)
        ml_v = ml._ml_validate_and_correct(ml_e2, text)
        entry["ml"] = _jsonable(
            {
                "number_ml": ml._extract_invoice_number_ml(text),
                "dates_ml": ml._extract_dates_ml(text),
                "amounts_ml": ml._extract_amounts_ml(text),
                "invoice_number": ml_v.invoice.number if ml_v.invoice else None,
                "invoice_date": ml_v.invoice.date if ml_v.invoice else None,
                "due_date": ml_v.invoice.due_date if ml_v.invoice else None,
                "subtotal_excl_vat": ml_v.totals.subtotal_excl_vat if ml_v.totals else None,
                "total_vat": ml_v.totals.total_vat if ml_v.totals else None,
                "total_incl_vat": ml_v.totals.total_incl_vat if ml_v.totals else None,
                "required_fields_present": ml_v.validation.required_fields_present,
                "data_quality_score": ml_v.validation.data_quality_score,
                "calculation_check": ml_v.validation.calculation_check,
            }
        )

        # --- swiss family helpers (DB lookups excluded — they always fail
        #     in the reference, see kernel/assemble.py docstring) ------------
        sclean = swiss._clean_text(text)
        try:
            samounts = swiss._extract_amounts(sclean)
            swiss_failed = False
        except Exception as exc:  # InvalidOperation escapes in the reference
            samounts, swiss_failed = {}, True
            print(f"  swiss amounts raised for {name}: {exc!r}")
        entry["swiss"] = _jsonable(
            {
                "clean_text": sclean,
                "invoice_number": swiss._extract_invoice_number(sclean),
                "invoice_date": swiss._extract_date(sclean),
                "currency": swiss._extract_currency(sclean),
                "amounts": samounts,
                "failed": swiss_failed,
            }
        )
        goldens[name] = entry

    out = REPO / "tests" / "fixtures" / "goldens.json"
    out.write_text(json.dumps(goldens, indent=1, ensure_ascii=False))
    print(f"wrote {out} ({len(goldens)} fixtures)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
