"""Measure the z-order clustering win (VERDICT r04 next-step #7).

Builds the same committed table from sf orders three ways — unclustered
compaction, lexicographic cluster_by=[o_orderdate, o_totalprice], and
z-order over the same two columns — then, for a leading-column
predicate, a SECOND-column predicate, and a 2-D box, reports per
variant: files pruned (kept/total), bytes under the surviving paths,
and the wall time of the pruned scan+agg.  The selectivity story being
measured: lexicographic clustering localizes only the FIRST sort key;
z-order keeps per-file min/max tight on EVERY cluster column, so the
second-column predicate is where the two diverge.

Usage: python tools/zorder_bench.py [--sf-dir /root/testdata/sf0.1]
Appends nothing; prints one JSON line — paste the table into
BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

DATE_PRED = [("o_orderdate", "between", ("1997-01-01", "1997-08-01"))]
PRICE_PRED = [("o_totalprice", "between", (200000.0, 250000.0))]
BOX_PRED = DATE_PRED + PRICE_PRED
PREDS = [("date(lead)", DATE_PRED), ("price(2nd)", PRICE_PRED), ("box(2d)", BOX_PRED)]


def _bytes_under(paths: list[str]) -> int:
    total = 0
    for p in paths:
        if os.path.isfile(p):
            total += os.path.getsize(p)
        else:
            for root, _dirs, files in os.walk(p):
                total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--n-buckets", type=int, default=4)
    ap.add_argument("--max-file-rows", type=int, default=2500)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ocr_spark.session import get_spark
    from ocr_spark.sources import manifests as mf

    spark = get_spark(
        "zorder_bench", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    base = REPO / ".bench" / "zorder_ab"
    shutil.rmtree(base, ignore_errors=True)
    try:
        orders = (
            spark.read.parquet(os.path.join(args.sf_dir, "orders.parquet"))
            .withColumnRenamed("o_orderkey", "doc_id")
        )
        variants = {
            "unclustered": {},
            "lexicographic": {"cluster_by": ["o_orderdate", "o_totalprice"]},
            "zorder": {
                "cluster_by": ["o_orderdate", "o_totalprice"],
                "zorder": True,
            },
        }
        results: dict[str, dict] = {}
        for name, kw in variants.items():
            out = str(base / name)
            mf.checkpointed_write(
                spark, orders, out, n_buckets=args.n_buckets,
                input_snapshot="ab-s1",
                stats_cols=["o_orderdate", "o_totalprice"],
            )
            mf.compact(
                spark, out, key_col="doc_id",
                stats_cols=["o_orderdate", "o_totalprice"],
                max_file_rows=args.max_file_rows, min_epochs=1, **kw,
            )
            per_pred = {}
            for pname, pred in PREDS:
                plan = mf.prune_plan(spark, out, pred)
                # wall: pruned read + residual filter + agg (best of 2)
                best = float("inf")
                for _ in range(2):
                    t0 = time.monotonic()
                    df = mf.pruned_read(spark, out, pred)
                    for col, _op, (lo, hi) in pred:
                        c = F.col(col)
                        if col == "o_orderdate":
                            df = df.filter(
                                c.between(F.to_timestamp(F.lit(lo)), F.to_timestamp(F.lit(hi)))
                            )
                        else:
                            df = df.filter(c.between(lo, hi))
                    n = df.agg(
                        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s")
                    ).collect()[0]["n"]
                    best = min(best, time.monotonic() - t0)
                per_pred[pname] = {
                    "kept_files": plan["kept_files"],
                    "total_files": plan["total_files"],
                    "kept_groups": plan["kept_groups"],
                    "total_groups": plan["total_groups"],
                    "scan_mb": round(_bytes_under(plan["paths"]) / 1e6, 2),
                    "scan_sec": round(best, 3),
                    "rows": int(n),
                }
            full_mb = round(
                _bytes_under([str(Path(out) / "data")]) / 1e6, 2
            )
            results[name] = {"table_mb": full_mb, **per_pred}
        print(json.dumps({"zorder_ab": results, "sf_dir": args.sf_dir,
                          "n_buckets": args.n_buckets,
                          "max_file_rows": args.max_file_rows}))
    finally:
        spark.stop()
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
