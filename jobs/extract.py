#!/usr/bin/env python
"""The production extraction job (spark-submit entrypoint).

    spark-submit --master <cluster> --py-files ocr_spark.zip \
        jobs/extract.py --docs <dir>/documents --media <dir>/media \
        --out /data/extracted --snapshot snap-2026-08-17 \
        [--buckets 4096] [--page-split-bytes N] [--salt 0]

Reads the interleaved documents table (doc_id, spans[]) plus the media
payload side table, runs the fused extraction pipeline, and writes
extracted_spans through the manifest-checkpointed sink — a killed run
re-submitted with the SAME --snapshot resumes at bucket granularity
(completed buckets are anti-joined away; orphan files from crashed epochs
stay invisible to readers).

Local smoke:
    python jobs/extract.py --docs .bench/synth_5000/documents \
        --media .bench/synth_5000/media --out /tmp/extracted --snapshot s1
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents parquet dir/file")
    ap.add_argument("--media", default=None, help="media parquet dir/file")
    ap.add_argument("--out", required=True, help="output root (data/ + manifests/)")
    ap.add_argument("--snapshot", required=True, help="input snapshot id (resume key)")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--salt", type=int, default=0)
    ap.add_argument("--page-split-bytes", type=int, default=None)
    ap.add_argument(
        "--invoices-out",
        default=None,
        help="also write the flat invoices table (parquet dir); the shared-"
        "FIELDS pipeline derives it from the SAME kernel execution as the "
        "spans output — writing both costs one extraction pass, not two",
    )
    ap.add_argument("--master", default=None, help="override (default: env/local)")
    args = ap.parse_args()

    from ocr_spark.corpus import COMPANIES, SUPPLIERS
    from ocr_spark.operators.extract import build_pipeline
    from ocr_spark.schemas import DOCUMENTS, MEDIA
    from ocr_spark.session import get_spark
    from ocr_spark.sources.manifests import checkpointed_write

    spark = get_spark("ocr_spark_extract", master=args.master)
    t0 = time.monotonic()
    docs = spark.read.schema(DOCUMENTS).parquet(args.docs)
    media = spark.read.schema(MEDIA).parquet(args.media) if args.media else None
    frames = build_pipeline(
        spark,
        docs,
        media,
        companies=COMPANIES,
        suppliers=SUPPLIERS,
        salt=args.salt,
        page_split_bytes=args.page_split_bytes,
    )
    stats = checkpointed_write(
        spark,
        frames.extracted_spans,
        args.out,
        n_buckets=args.buckets,
        input_snapshot=args.snapshot,
    )
    if args.invoices_out:
        frames.invoices.write.mode("overwrite").parquet(args.invoices_out)
        stats["invoices_out"] = args.invoices_out
    frames.unpersist()
    stats["wall_sec"] = round(time.monotonic() - t0, 2)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
