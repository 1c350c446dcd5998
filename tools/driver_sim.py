"""Pre-flight simulation of the per-round correctness driver.

Runs the FIRST 50 CATALOG rows (the driver's window) at sf0.01 through
the same seam the driver uses — Spark ``toPandas()`` vs DuckDB
``.df()`` — and compares row count, column names, and a canonicalized
value hash.  The canonicalizer is the one validated in
tests/test_driver_parity.py (it reproduces the r02 list-cell and r04
Decimal red rows on the pre-fix trees, and the r03 date-row greens).

Usage::

    python tools/driver_sim.py [--sf-dir /root/testdata/sf0.01] [--window 50]

Prints one status line per row and a final summary; exits non-zero if
any row would be red.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import duckdb  # noqa: E402

from ocr_spark.queries import CATALOG  # noqa: E402
from ocr_spark.session import get_spark  # noqa: E402
from ocr_spark.sources.tables import TESTDATA_TABLES  # noqa: E402
from test_driver_parity import _canon_frame  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--only", default=None, help="comma-separated row names")
    args = ap.parse_args()

    spark = get_spark("driver_sim", master="local[32]", shuffle_partitions=32)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    names = list(CATALOG)[: args.window]
    if args.only:
        names = [n for n in args.only.split(",") if n in CATALOG]

    red: list[str] = []
    for name in names:
        fn, sql = CATALOG[name]
        t0 = time.time()
        try:
            spdf = fn(spark, args.sf_dir).toPandas()
        except Exception as exc:  # pragma: no cover - report-and-continue
            print(f"{name}: ERR spark {type(exc).__name__}: {exc}")
            red.append(name)
            continue
        if sql is None:
            print(f"{name}: rows-only ({len(spdf)} rows) {time.time() - t0:.1f}s")
            continue
        try:
            dpdf = con.execute(sql).df()
        except Exception as exc:  # pragma: no cover
            print(f"{name}: ERR oracle {type(exc).__name__}: {exc}")
            red.append(name)
            continue
        rows_ok = len(spdf) == len(dpdf)
        schema_ok = sorted(spdf.columns) == sorted(dpdf.columns)
        hash_ok = rows_ok and schema_ok and _canon_frame(spdf) == _canon_frame(dpdf)
        status = "green" if (rows_ok and schema_ok and hash_ok) else "RED"
        print(
            f"{name}: {status} rows={len(spdf)}/{len(dpdf)} "
            f"schema={schema_ok} hash={hash_ok} {time.time() - t0:.1f}s"
        )
        if status == "RED":
            red.append(name)
            if not schema_ok:
                print(f"  spark cols: {sorted(spdf.columns)}")
                print(f"  oracle cols: {sorted(dpdf.columns)}")
            elif rows_ok:
                s, d = _canon_frame(spdf), _canon_frame(dpdf)
                for a, b in [(a, b) for a, b in zip(s, d) if a != b][:2]:
                    print(f"  spark : {a[:300]}")
                    print(f"  oracle: {b[:300]}")

    print(f"\n{len(names) - len(red)}/{len(names)} green" + (f"; RED: {red}" if red else ""))
    spark.stop()
    sys.exit(1 if red else 0)


if __name__ == "__main__":
    main()
