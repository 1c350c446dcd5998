"""Constraint checking on planted violations: every metric must price
the defect exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators import checks


def test_report_prices_planted_defects(spark):
    rows = [
        (1, 10.0, "A"),
        (2, 20.0, "A"),
        (2, -5.0, "B"),     # dup key + below range
        (None, 30.0, "C"),  # null key + bad status
        (4, 200.0, "A"),    # above range
    ]
    df = spark.createDataFrame(rows, "k int, v double, s string")
    rep = checks.check_report(
        df,
        [
            checks.completeness("k"),
            checks.uniqueness("k"),
            checks.in_range("v", 0.0, 100.0),
            checks.in_set("s", ["A", "B"]),
        ],
    ).collect()[0]
    assert abs(rep["complete_k"] - 4 / 5) < 1e-9
    assert abs(rep["unique_k"] - 3 / 5) < 1e-9          # {1,2,4} of 5 rows
    assert abs(rep["range_v"] - 3 / 5) < 1e-9           # 10,20,30 in range
    assert abs(rep["set_s"] - 4 / 5) < 1e-9             # C fails


def test_referential_integrity_counts_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (3,), (9,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    rep = checks.referential_integrity(child, parent, "fk", "pk").collect()[0]
    assert rep["n_child"] == 4 and rep["n_orphans"] == 1
    assert abs(rep["ri"] - 0.75) < 1e-9
