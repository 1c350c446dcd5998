"""Deterministic, engine-portable cardinality sketching.

Spark ships HLL (``approx_count_distinct``) but its register layout is
engine-private — no DuckDB twin can replay it, so it can never pass the
hash-equality oracle. The K-minimum-values sketch (Bar-Yossef et al.
2002) gives the same one-pass bounded-memory estimate from nothing but
md5 + a top-k, which BOTH engines compute bit-identically: the sketch
VALUE (not just its accuracy) is reproducible anywhere.

Scale shape: distinct-hash partial aggregation, then a k-row
TakeOrderedAndProject — per-partition top-k merged on the driver, k
rows total in flight regardless of corpus size. The estimator touches
60-bit hex prefixes so the [0,1) mapping is exact in an IEEE double on
any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 hex chars = 60 bits: fits a signed 64-bit long exactly, and 2^60
# <= 2^63 means the double conversion below is exact (no rounding).
_PREFIX_HEX = 15
_PREFIX_SPACE = float(1 << (4 * _PREFIX_HEX))


def _unit_hash(h: Column) -> Column:
    """md5-hex column → exact uniform draw in [0, 1)."""
    return F.conv(F.substring(h, 1, _PREFIX_HEX), 16, 10).cast("long") / F.lit(
        _PREFIX_SPACE
    )


def kmv_sketch(values: DataFrame, value_col: str, k: int = 256) -> DataFrame:
    """The k smallest distinct md5 draws of a value column: rows
    ``(rank, h, u)`` with rank 1..k, h the md5 hex, u its [0,1) unit
    draw. Mergeable (union two sketches, re-take the k smallest) and
    deterministic — the same input yields the same k rows on any
    engine, any partitioning."""
    hashes = (
        values.select(F.md5(F.col(value_col).cast("string")).alias("h"))
        .distinct()
        .select("h", _unit_hash(F.col("h")).alias("u"))
        .orderBy("u", "h")
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy("u", "h")
    return hashes.select(
        F.row_number().over(w).alias("rank"), "h", "u"
    )


def kmv_sketch_by_group(
    values: DataFrame, value_col: str, group_col: str, k: int = 256
) -> DataFrame:
    """Per-group KMV sketches from ONE pass: ``(group, rank, h, u)``
    with rank 1..k inside each group. The rank window runs over the
    DISTINCT (group, hash) rows — vocabulary-sized partitions, the
    same Heaps-sublinear bound as token_topk — never over raw
    occurrences. Mergeable per group exactly like the global sketch
    (union, re-take the k smallest — tested)."""
    from pyspark.sql import Window

    hashes = (
        values.select(
            group_col, F.md5(F.col(value_col).cast("string")).alias("h")
        )
        .distinct()
        .select(group_col, "h", _unit_hash(F.col("h")).alias("u"))
    )
    w = Window.partitionBy(group_col).orderBy("u", "h")
    return hashes.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    ).select(group_col, "rank", "h", "u")


def kmv_estimate_by_group(
    values: DataFrame, value_col: str, group_col: str, k: int = 256
) -> DataFrame:
    """Per-group distinct-count estimates: ``(group, k_used, kth_u,
    est_distinct)`` — the grouped form of :func:`kmv_estimate` (exact
    when a group has fewer than k distinct values)."""
    sk = kmv_sketch_by_group(values, value_col, group_col, k)
    agg = sk.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("k_used"), F.max("u").alias("kth_u")
    )
    return agg.select(
        group_col,
        "k_used",
        "kth_u",
        F.when(F.col("k_used") < k, F.col("k_used").cast("double"))
        .otherwise((F.col("k_used") - 1) / F.col("kth_u"))
        .alias("est_distinct"),
    )


def kmv_estimate(values: DataFrame, value_col: str, k: int = 256) -> DataFrame:
    """One-row distinct-count estimate: ``(k_used, kth_u, est_distinct)``.

    est = (k − 1) / u_k (the classic unbiased KMV form); when the domain
    has fewer than k distinct values the sketch IS the exact answer and
    est_distinct reports that count instead.
    """
    sk = kmv_sketch(values, value_col, k)
    agg = sk.agg(
        F.count(F.lit(1)).alias("k_used"), F.max("u").alias("kth_u")
    )
    return agg.select(
        "k_used",
        "kth_u",
        F.when(F.col("k_used") < k, F.col("k_used").cast("double"))
        .otherwise((F.col("k_used") - 1) / F.col("kth_u"))
        .alias("est_distinct"),
    )
