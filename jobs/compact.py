#!/usr/bin/env python
"""Table-maintenance job: compact a manifest-sink output.

    spark-submit --master <cluster> --py-files ocr_spark.zip \
        jobs/compact.py --out /data/extracted [--key-col doc_id] \
        [--min-epochs 2] [--vacuum]

Rewrites every live epoch into one file per bucket and atomically
supersedes the old epochs through the compactions/ commit record (the
Iceberg rewrite_data_files + expire_snapshots analogue). Safe to run
beside readers at any time: the switch is a single file materialization,
and a killed compactor leaves only invisible orphan files. Run with
--vacuum to also delete the superseded epoch directories, or leave them
for a later sweep.

Local smoke:
    python jobs/compact.py --out /tmp/extracted --vacuum
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="sink root (data/ + manifests/)")
    ap.add_argument("--key-col", default="doc_id")
    ap.add_argument("--min-epochs", type=int, default=2)
    ap.add_argument("--vacuum", action="store_true")
    ap.add_argument("--max-file-rows", type=int, default=None)
    ap.add_argument(
        "--target-file-bytes", type=int, default=None,
        help="derive the per-file row cap from the manifests' byte/row "
        "metrics so compacted files land at or under this size "
        "(ignored when --max-file-rows is given)",
    )
    ap.add_argument(
        "--cluster-by", default=None,
        help="comma-separated sort columns: rolled files cover near-"
        "disjoint ranges and get per-file zone maps (prune_plan then "
        "prunes at file granularity)",
    )
    ap.add_argument(
        "--zorder", action="store_true",
        help="Z-order (Morton) the --cluster-by columns instead of "
        "lexicographic sort, so every cluster column prunes",
    )
    ap.add_argument("--zorder-bits", type=int, default=6)
    ap.add_argument(
        "--max-live-epochs", type=int, default=None,
        help="policy mode: compact only when live epochs exceed this "
        "(the maintenance-loop trigger; skips cheaply otherwise)",
    )
    ap.add_argument(
        "--expire-older-than-days", type=float, default=None,
        help="after compacting, run the retention sweep: drop history "
        "older than this many days (live tags always survive)",
    )
    args = ap.parse_args()

    import time

    from ocr_spark.session import get_spark
    from ocr_spark.sources.manifests import compact, expire, maybe_compact

    spark = get_spark(app_name="ocr_spark_compact")
    opts = dict(
        key_col=args.key_col,
        vacuum=args.vacuum,
        max_file_rows=args.max_file_rows,
        target_file_bytes=args.target_file_bytes,
        cluster_by=args.cluster_by.split(",") if args.cluster_by else None,
        zorder=args.zorder,
        zorder_bits=args.zorder_bits,
    )
    if args.max_live_epochs is not None:
        stats = maybe_compact(spark, args.out, args.max_live_epochs, **opts)
    else:
        stats = compact(spark, args.out, min_epochs=args.min_epochs, **opts)
    if args.expire_older_than_days is not None:
        stats["expire"] = expire(
            spark, args.out, time.time() - args.expire_older_than_days * 86400.0
        )
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
