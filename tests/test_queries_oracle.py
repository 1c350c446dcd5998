"""Spark-vs-DuckDB oracle equality for every catalog query (the same
row-count + schema + order-insensitive value-hash contract the driver
applies at sf=0.01; here run at sf=0.001 by default for speed, overridable
via OCR_SPARK_SF_DIR)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from ocr_spark.queries import CATALOG
from ocr_spark.sources.tables import TESTDATA_TABLES

SF_DIR = os.environ.get("OCR_SPARK_SF_DIR", "/root/testdata/sf0.001")

ORACLE_QUERIES = [name for name, (_f, sql) in CATALOG.items() if sql is not None]
ROWS_ONLY_QUERIES = [name for name, (_f, sql) in CATALOG.items() if sql is None]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    fn, sql = CATALOG[name]
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) > 0, (
        f"{name}: zero rows — a vacuous match proves nothing; widen the "
        "query's bounds or fix the construction"
    )
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sset, dset = _rowset(scols, srows), _rowset(dcols, drows)
    mism = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
    assert sset == dset, f"{name}: value mismatch, first diffs: {mism}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    fn, _ = CATALOG[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


@pytest.mark.parametrize("seed", [7, 99, 1234])
def test_sessionize_scalable_equivalence_random(spark, tmp_path, seed):
    """Beyond the testdata oracle: chunk-and-merge sessionization must
    equal the plain per-user window on adversarial random event sets
    (bursts straddling chunk boundaries, ties, single-event users)."""
    import random

    from datetime import datetime, timedelta

    from ocr_spark.queries import q_sessionize, q_sessionize_scalable

    rng = random.Random(seed)
    base = datetime(2025, 1, 1)
    rows = []
    eid = 0
    for user in range(25):
        t = base + timedelta(seconds=rng.randrange(0, 86400))
        for _ in range(rng.randrange(1, 60)):
            # mix sub-gap steps, exact-gap ties, and session breaks; some
            # land exactly on 6h chunk boundaries
            step = rng.choice([0, 1, 1799, 1800, 1801, 7200, 21600, 40000])
            t = t + timedelta(seconds=step)
            rows.append((user, t, eid))
            eid += 1
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    d = str(tmp_path / f"events_{seed}")
    ev.write.parquet(d + "/events.parquet")
    plain = {tuple(r) for r in q_sessionize(spark, d).collect()}
    scalable = {tuple(r) for r in q_sessionize_scalable(spark, d).collect()}
    assert plain == scalable
