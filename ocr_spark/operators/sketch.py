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


# --------------------------------------------------------------------------
# count-min sketch (heavy-hitter frequency estimation)
# --------------------------------------------------------------------------


def _cms_bucket(row: Column, value: Column, width: int) -> Column:
    """Row-r hash bucket of a value: md5("r:value") prefix mod width —
    the d pairwise-independent hash functions of Cormode & Muthukrishnan
    2005, realized as salted md5 so BOTH engines compute the identical
    table (Spark's xxhash64/DuckDB's hash never agree)."""
    h = F.md5(F.concat(row.cast("string"), F.lit(":"), value))
    return F.conv(F.substring(h, 1, _PREFIX_HEX), 16, 10).cast("long") % width


def cms_sketch(
    values: DataFrame, value_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Count-min sketch of a value column as rows ``(r, b, cnt)`` —
    depth×width counters, est(v) = min over rows of counter[r][bucket_r(v)]
    (always ≥ the true count; error ≤ 2·N/width w.p. 1−2^−depth).

    Mergeable (sum counters cell-wise) and engine-portable: integer
    counts + md5 buckets, so even the sketch VALUE oracles.

    Scale shape: occurrences first collapse to ``(value, cnt)`` — a
    map-side-combining keyed agg over the corpus — and the depth-explode
    walks that vocabulary-sized frame, never the raw occurrences; the
    final agg is depth·width rows regardless of corpus size.
    """
    vc = values.groupBy(F.col(value_col).cast("string").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    rows = vc.select(
        "v", "cnt", F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r")
    )
    return (
        rows.select("r", _cms_bucket(F.col("r"), F.col("v"), width).alias("b"), "cnt")
        .groupBy("r", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point frequency estimates ``(v, est_cnt)`` for each distinct query
    value: min over the sketch's depth rows, 0 when a bucket was never
    touched. The sketch side is depth·width rows — broadcast — so the
    probe is a map-side join however many queries arrive."""
    probes = (
        queries.select(F.col(value_col).cast("string").alias("v"))
        .distinct()
        .select(
            "v", F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r")
        )
        .select("v", "r", _cms_bucket(F.col("r"), F.col("v"), width).alias("b"))
    )
    return (
        probes.join(F.broadcast(sketch), on=["r", "b"], how="left")
        .groupBy("v")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )


# --------------------------------------------------------------------------
# fixed-bin histogram quantile estimation
# --------------------------------------------------------------------------


def hist_bins(
    values: DataFrame, value_col: str, lo: float, hi: float, n_bins: int
) -> DataFrame:
    """Equi-width histogram ``(b, cnt)`` over [lo, hi); values outside
    clamp into the edge bins. One keyed agg with map-side combine,
    n_bins rows out — and cell-wise ADDITIVE, so per-partition/per-day
    histograms merge by summing (the property engine-private quantile
    sketches like GK/KLL can't give an oracle for)."""
    w = (float(hi) - float(lo)) / n_bins
    x = F.col(value_col).cast("double")
    b = F.least(
        F.greatest(F.floor((x - F.lit(float(lo))) / F.lit(w)), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("long")
    return values.groupBy(b.alias("b")).agg(F.count(F.lit(1)).alias("cnt"))


def hist_quantiles(
    values: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    qs: list[float],
) -> DataFrame:
    """Histogram-interpolated quantile estimates ``(q, est)``: walk the
    cumulative bin counts to the covering bin of target = q·N, then
    interpolate linearly inside it — error bounded by one bin width for
    in-range data. The cumulative window runs over n_bins rows (a
    driver-bounded constant), never over the data."""
    from pyspark.sql import Window

    w = (float(hi) - float(lo)) / n_bins
    bins = hist_bins(values, value_col, lo, hi, n_bins)
    # both windows run over the ≤ n_bins histogram rows, so the single
    # partition is a bounded constant — and the input is scanned ONCE
    # (a separate total agg would clone the scan subplan)
    cum = bins.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn(
        "n",
        F.max("cum").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    qdf = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    hits = (
        cum.select("b", "cnt", "cum", "n", qdf)
        .withColumn("target", F.col("q") * F.col("n"))
        .filter(
            (F.col("cum") >= F.col("target"))
            & ((F.col("cum") - F.col("cnt")) < F.col("target"))
        )
    )
    est = F.lit(float(lo)) + F.lit(w) * (
        F.col("b") + (F.col("target") - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
    )
    return hits.select("q", est.alias("est"))
