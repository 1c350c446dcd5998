"""Golden parquet for the flagship extraction_pipeline catalog query.

Round 1 left `extraction_pipeline` rows-only (the kernel is Python, so no
DuckDB twin can recompute it).  Instead the OUTPUT is pinned: this tool
runs the exact catalog query (q_extraction_pipeline — 100 synth docs →
invoices table) and writes the result to a committed golden parquet; the
oracle SQL is then simply `SELECT * FROM '<golden>'`, which DuckDB reads
and the driver hash-compares against the live Spark run.  Any kernel or
pipeline change that alters the output shows up as a CORRECTNESS
mismatch until this golden is regenerated (like tools/gen_goldens.py).

Usage: python tools/gen_pipeline_golden.py
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

FIXTURES = REPO / "tests" / "fixtures"


def main() -> None:
    from ocr_spark.queries import (
        q_extraction_pipeline,
        q_extraction_spans,
        q_invoice_goals,
        q_ml_training_data,
        q_ocr_words,
    )
    from ocr_spark.session import get_spark

    spark = get_spark("gen_pipeline_golden", master="local[4]", shuffle_partitions=4)
    try:
        for name, fn, order in [
            ("extraction_pipeline", q_extraction_pipeline, ["invoice_id"]),
            ("extraction_spans", q_extraction_spans, ["doc_id"]),
            ("ml_training_data", q_ml_training_data, ["ml_id"]),
            ("invoice_goals", q_invoice_goals, ["goal_id"]),
            ("ocr_words", q_ocr_words, ["doc_id", "media_ref", "offset", "page_no", "word_no"]),
        ]:
            out = fn(spark, sf_dir="unused")
            with tempfile.TemporaryDirectory() as tmp:
                # single file, sorted — byte-stable regeneration
                out.orderBy(*order).coalesce(1).write.mode("overwrite").parquet(tmp + "/g")
                part = next(Path(tmp, "g").glob("part-*.parquet"))
                dest = FIXTURES / f"{name}_golden.parquet"
                dest.parent.mkdir(parents=True, exist_ok=True)
                shutil.copyfile(part, dest)
            print(f"wrote {dest} ({out.count()} rows)")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
