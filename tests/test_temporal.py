"""asof_join / interval_join semantics vs independent references:
pandas.merge_asof for the as-of join, a naive theta-join for the
interval join (plus duplicate preservation and bucket-width invariance
— the bucketization must be an implementation detail, not a semantic)."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pandas as pd
import pytest

from pyspark.sql import functions as F

from ocr_spark.operators.temporal import asof_join, interval_join

T0 = datetime(2024, 1, 1)


def _mk_events(n, keys, seed, id_prefix=0):
    rng = random.Random(seed)
    # distinct timestamps per key so reference tie semantics can't differ
    rows, used = [], set()
    while len(rows) < n:
        k = rng.choice(keys)
        sec = rng.randrange(0, 10_000)
        if (k, sec) in used:
            continue
        used.add((k, sec))
        rows.append((k, T0 + timedelta(seconds=sec), id_prefix + len(rows), rng.random()))
    return rows


def _pd_asof(lrows, rrows, direction, tolerance=None):
    l = pd.DataFrame(lrows, columns=["k", "ts", "lid", "lval"]).sort_values("ts")
    r = pd.DataFrame(rrows, columns=["k", "ts", "rid", "rval"]).sort_values("ts")
    tol = pd.Timedelta(seconds=tolerance) if tolerance is not None else None
    m = pd.merge_asof(
        l, r, on="ts", by="k", direction=direction, tolerance=tol,
        suffixes=("", "_r"),
    )
    return {
        (row.k, row.lid): (None if pd.isna(row.rid) else int(row.rid))
        for row in m.itertuples()
    }


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tolerance", [None, 600.0])
def test_asof_matches_pandas(spark, direction, tolerance):
    lrows = _mk_events(80, [1, 2, 3], seed=7)
    rrows = _mk_events(60, [1, 2, 4], seed=11, id_prefix=1000)  # key 4: no left, key 3: no right
    l = spark.createDataFrame(lrows, "k long, ts timestamp, lid long, lval double")
    r = spark.createDataFrame(rrows, "k long, ts timestamp, rid long, rval double")
    out = asof_join(
        l, r.withColumnRenamed("ts", "rts"),
        on="k", left_ts="ts", right_ts="rts",
        right_cols=["rid", "rval"], direction=direction, tolerance=tolerance,
    )
    got = {(row.k, row.lid): row.rid for row in out.collect()}
    assert got == _pd_asof(lrows, rrows, direction, tolerance)
    # left-join contract: every left row survives exactly once
    assert out.count() == len(lrows)


def test_asof_exact_ts_matches(spark):
    """A right row AT the left timestamp matches (>= semantics, like
    pandas allow_exact_matches and DuckDB ASOF)."""
    l = spark.createDataFrame([(1, T0, 1)], "k long, ts timestamp, lid long")
    r = spark.createDataFrame([(1, T0, 9)], "k long, ts timestamp, rid long")
    out = asof_join(l, r, on="k", right_cols=["rid"]).collect()
    assert out[0].rid == 9 and out[0].matched_ts == T0


def test_asof_multi_key(spark):
    l = spark.createDataFrame(
        [(1, "a", T0 + timedelta(seconds=5), 1), (1, "b", T0 + timedelta(seconds=5), 2)],
        "k long, g string, ts timestamp, lid long",
    )
    r = spark.createDataFrame(
        [(1, "a", T0, 10), (1, "b", T0 + timedelta(seconds=9), 20)],
        "k long, g string, ts timestamp, rid long",
    )
    got = {row.lid: row.rid for row in
           asof_join(l, r, on=["k", "g"], right_cols=["rid"]).collect()}
    assert got == {1: 10, 2: None}


def _naive_overlap(lrows, rrows):
    out = []
    for (lk, ls, le, lid) in lrows:
        for (rk, rs, re_, rid) in rrows:
            if lk == rk and ls <= re_ and rs <= le:
                out.append((lk, lid, rid))
    return sorted(out)


def _mk_intervals(n, keys, seed, id_prefix=0):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        s = rng.randrange(0, 50_000)
        rows.append((rng.choice(keys), float(s), float(s + rng.randrange(0, 5_000)), id_prefix + i))
    return rows


@pytest.mark.parametrize("bucket", [100.0, 1000.0, 100_000.0])
def test_interval_join_matches_naive(spark, bucket):
    """Result is the exact theta-join answer for ANY bucket width —
    including one wider than every interval (single shared bin)."""
    lrows = _mk_intervals(60, [1, 2, 3], seed=3)
    rrows = _mk_intervals(50, [1, 2, 4], seed=5, id_prefix=1000)
    l = spark.createDataFrame(lrows, "k long, s double, e double, lid long")
    r = spark.createDataFrame(rrows, "k long, rs double, re double, rid long")
    out = interval_join(l, r, on="k", left_start="s", left_end="e",
                        right_start="rs", right_end="re", bucket=bucket)
    got = sorted((row.k, row.lid, row.rid) for row in out.collect())
    assert got == _naive_overlap(lrows, rrows)


def test_interval_join_preserves_duplicates(spark):
    """Input duplicates are legitimate rows — the multi-bin dedup must
    not collapse them (a DISTINCT pass would)."""
    l = spark.createDataFrame([(1, 0.0, 500.0, 7), (1, 0.0, 500.0, 7)],
                              "k long, s double, e double, lid long")
    r = spark.createDataFrame([(1, 100.0, 200.0, 9)],
                              "k long, rs double, re double, rid long")
    out = interval_join(l, r, on="k", left_start="s", left_end="e",
                        right_start="rs", right_end="re", bucket=100.0)
    assert out.count() == 2


def test_interval_join_timestamp_cols(spark):
    l = spark.createDataFrame(
        [(1, T0, T0 + timedelta(hours=2), 1)],
        "k long, s timestamp, e timestamp, lid long",
    )
    r = spark.createDataFrame(
        [(1, T0 + timedelta(hours=1), T0 + timedelta(hours=3), 2),
         (1, T0 + timedelta(hours=3), T0 + timedelta(hours=4), 3)],
        "k long, rs timestamp, re timestamp, rid long",
    )
    out = interval_join(l, r, on="k", left_start="s", left_end="e",
                        right_start="rs", right_end="re", bucket=3600.0)
    assert [row.rid for row in out.collect()] == [2]


def test_interval_join_rejects_column_collision(spark):
    l = spark.createDataFrame([(1, 0.0, 1.0, 5)], "k long, s double, e double, x long")
    r = spark.createDataFrame([(1, 0.0, 1.0, 6)], "k long, rs double, re double, x long")
    with pytest.raises(ValueError, match="collide"):
        interval_join(l, r, on="k", left_start="s", left_end="e",
                      right_start="rs", right_end="re")
