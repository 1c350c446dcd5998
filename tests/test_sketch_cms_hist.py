"""Count-min sketch and histogram-quantile properties: the CMS never
undercounts, collisions only inflate, both structures merge cell-wise,
and the histogram estimate lands within one bin width of the exact
interpolated percentile."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.sketch import (
    cms_estimate,
    cms_sketch,
    hist_bins,
    hist_quantiles,
)

DEPTH, WIDTH = 4, 64  # tiny width → guaranteed collisions on 500 values


@pytest.fixture(scope="module")
def values(spark):
    # zipf-ish: value i appears (503 - i) // 7 + 1 times — deterministic
    rows = [(f"tok{i}",) for i in range(500) for _ in ((503 - i) // 7 + 1) * [0]]
    return spark.createDataFrame(rows, "v string")


def test_cms_never_undercounts(spark, values):
    sk = cms_sketch(values, "v", depth=DEPTH, width=WIDTH)
    exact = {r.v: r.c for r in values.groupBy("v").agg(F.count("*").alias("c")).collect()}
    est = {
        r.v: r.est_cnt
        for r in cms_estimate(
            sk, values.select("v").distinct(), "v", depth=DEPTH, width=WIDTH
        ).collect()
    }
    assert est.keys() == exact.keys()
    assert all(est[v] >= exact[v] for v in exact)
    assert any(est[v] > exact[v] for v in exact)  # width=64 must collide


def test_cms_unseen_value_bounded(spark, values):
    sk = cms_sketch(values, "v", depth=DEPTH, width=WIDTH)
    q = spark.createDataFrame([("never-seen",)], "v string")
    (row,) = cms_estimate(sk, q, "v", depth=DEPTH, width=WIDTH).collect()
    n = values.count()
    assert 0 <= row.est_cnt <= 2 * n / WIDTH * 4  # loose CMS bound


def test_cms_merge_is_cellwise_sum(spark, values):
    """sketch(A ∪ B) == cell-wise sum of sketch(A) and sketch(B)."""
    split = F.substring(F.md5("v"), 1, 1) < "8"
    a, b = values.filter(split), values.filter(~split)
    whole = {
        (r.r, r.b): r.cnt for r in cms_sketch(values, "v", DEPTH, WIDTH).collect()
    }
    merged: dict = {}
    for part in (a, b):
        for r in cms_sketch(part, "v", DEPTH, WIDTH).collect():
            merged[(r.r, r.b)] = merged.get((r.r, r.b), 0) + r.cnt
    assert merged == whole


def test_hist_quantile_within_one_bin(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    lo, hi, n_bins = 900.0, 105000.0, 200
    w = (hi - lo) / n_bins
    qs = [0.5, 0.9, 0.99]
    est = {r.q: r.est for r in hist_quantiles(li, "l_extendedprice", lo, hi, n_bins, qs).collect()}
    exact = li.select(
        F.expr(f"percentile(l_extendedprice, array({','.join(map(str, qs))}))").alias("p")
    ).collect()[0].p
    for q, ex in zip(qs, exact):
        assert abs(est[q] - ex) <= w, (q, est[q], ex)


def test_hist_bins_merge(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    lo, hi, n_bins = 900.0, 105000.0, 50
    whole = {r.b: r.cnt for r in hist_bins(li, "l_extendedprice", lo, hi, n_bins).collect()}
    merged: dict = {}
    for part in (li.filter(F.col("l_orderkey") % 2 == 0), li.filter(F.col("l_orderkey") % 2 == 1)):
        for r in hist_bins(part, "l_extendedprice", lo, hi, n_bins).collect():
            merged[r.b] = merged.get(r.b, 0) + r.cnt
    assert merged == whole


def test_hist_out_of_range_clamps(spark):
    df = spark.createDataFrame([(-5.0,), (0.5,), (9.5,), (50.0,)], "x double")
    bins = {r.b: r.cnt for r in hist_bins(df, "x", 0.0, 10.0, 10).collect()}
    assert bins == {0: 2, 9: 2}
