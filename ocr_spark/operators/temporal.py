"""Temporal join operators Spark lacks as built-ins: as-of join and
interval (range-overlap) join.

Both are implemented as compositions of shuffle-bounded DataFrame ops —
never as an inequality theta-join, which Spark physically plans as a
BroadcastNestedLoopJoin / cartesian and which explodes at corpus scale.

``asof_join`` uses the classic union-and-window form: tag both sides,
union them into one frame, and carry the most recent right-side payload
forward with ``last(ignorenulls)`` over a per-key (ts, side) ordering.
One shuffle on the join key, zero row amplification — each left row is
matched in O(1) amortized within its partition, vs the O(|L|·|R|)
per-key blowup of the naive ``l.ts >= r.ts`` join.

``interval_join`` makes range-overlap joins shuffle-bounded by
bucketizing time: each interval lands in every fixed-width bucket it
overlaps (bounded amplification = span/bucket + 1), the join runs on
(key, bucket) equality — hash join, never nested-loop — and a
dedup-by-(left,right) pass drops the multi-bucket double matches.
This is the standard "binning" strategy range-join optimizers
(e.g. Databricks' range-join hint) apply under the hood.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _sort_key(c: Column, dtype: str) -> Column:
    """Monotone numeric sort key for a timestamp-or-numeric column.

    Timestamps cast to double = epoch seconds with fractional part
    (``unix_timestamp`` would truncate sub-second precision).
    """
    if dtype.startswith("timestamp") or dtype == "date":
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    matched_ts: str = "matched_ts",
) -> DataFrame:
    """Join each left row to the most recent right row at-or-before its
    timestamp (``direction='backward'``; ``'forward'`` = earliest
    at-or-after).  Left join semantics: unmatched left rows survive with
    null right columns.

    Right-side ties on (key, ts) are broken deterministically by the
    greatest payload tuple (struct comparison over ``right_cols`` in the
    given order) — pre-aggregate the right side to one row per (key, ts)
    if different tie semantics are needed.

    ``tolerance`` (seconds for timestamp columns, plain units otherwise)
    nulls out matches farther than the bound, like
    ``pandas.merge_asof(tolerance=...)``.

    Scale shape: ONE hash shuffle of |L|+|R| rows on the join key, one
    in-partition sort, no row amplification.  A key whose full history
    outgrows an executor partition needs the chunk-and-merge split
    (see ``q_sessionize_scalable``); event-style keys are fine.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    right_cols = list(right_cols)

    lt_dtype = dict(left.dtypes)[left_ts]
    rt_dtype = dict(right.dtypes)[right_ts]
    sign = F.lit(1.0) if direction == "backward" else F.lit(-1.0)

    payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        *keys,
        (sign * _sort_key(F.col(right_ts), rt_dtype)).alias("__k"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    lrow = F.struct(*[F.col(c) for c in left.columns])
    l = left.select(
        *keys,
        (sign * _sort_key(F.col(left_ts), lt_dtype)).alias("__k"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        lrow.alias("__lrow"),
    )
    # left carries __lrow; right side gets a null struct of the same type
    r = r.withColumn("__lrow", F.lit(None).cast(l.schema["__lrow"].dataType))

    # At equal ts a right row sorts before the left row (side 0 < 1), so
    # exact-timestamp matches are included — pandas allow_exact_matches
    # and DuckDB ASOF (>=) semantics.  Equal-ts right rows order by the
    # payload struct: "most recent" ties resolve to the max tuple.
    w = (
        Window.partitionBy(*keys)
        .orderBy("__k", "__side", "__payload")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance is not None:
        dist = F.abs(
            _sort_key(F.col("__lrow")[left_ts], lt_dtype)
            - _sort_key(F.col("__match")["__rts"], rt_dtype)
        )
        matched = matched.withColumn(
            "__match",
            F.when(dist <= F.lit(float(tolerance)), F.col("__match")),
        )
    out_cols = [F.col("__lrow")[c].alias(c) for c in left.columns]
    out_cols.append(F.col("__match")["__rts"].alias(matched_ts))
    out_cols += [F.col("__match")[c].alias(c) for c in right_cols]
    return matched.select(*out_cols)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket: float = 86400.0,
) -> DataFrame:
    """Inner join on key equality + interval overlap
    (``l.start <= r.end AND r.start <= l.end``, closed intervals),
    returning all left columns plus the right side's non-key columns.

    Column names must be disjoint apart from the key columns.

    Plan shape: both sides explode to one row per ``bucket``-width time
    bin their interval touches (``sequence(floor(s/b), floor(e/b))``)
    and the join runs on (key, bin) EQUALITY — a plain hash shuffle join
    AQE can size and skew-split, never a nested loop.  A pair sharing
    k > 1 bins would match k times; instead of a distinct pass (an extra
    shuffle that would also collapse genuine input duplicates), each hit
    is kept only in the FIRST bin both intervals touch
    (``bin == max(floor(l.start/b), floor(r.start/b))``) — exact,
    duplicate-preserving, zero extra shuffles.  Pick ``bucket`` near the
    typical interval span: amplification is span/bucket + 1 per row,
    while too-coarse buckets put unrelated intervals in one bin and grow
    the post-join filter's input.
    """
    keys = [on] if isinstance(on, str) else list(on)
    overlap_r = [c for c in right.columns if c not in keys]
    dup = [c for c in overlap_r if c in left.columns]
    if dup:
        raise ValueError(f"right columns collide with left: {dup}")
    b = F.lit(float(bucket))

    def start_bin(df: DataFrame, s: str) -> Column:
        return F.floor(_sort_key(F.col(s), dict(df.dtypes)[s]) / b).cast("long")

    def binned(df: DataFrame, s: str, e: str) -> DataFrame:
        ek = _sort_key(F.col(e), dict(df.dtypes)[e])
        bins = F.sequence(start_bin(df, s), F.floor(ek / b).cast("long"))
        return df.withColumn("__bin", F.explode(bins))

    lb = binned(left, left_start, left_end).withColumn(
        "__lsb", start_bin(left, left_start)
    )
    rb = (
        binned(right, right_start, right_end)
        .withColumn("__rsb", start_bin(right, right_start))
        .select(*keys, "__bin", "__rsb", *overlap_r)
    )
    joined = lb.join(rb, on=[*keys, "__bin"], how="inner").filter(
        (F.col(left_start) <= F.col(right_end))
        & (F.col(right_start) <= F.col(left_end))
        & (F.col("__bin") == F.greatest("__lsb", "__rsb"))
    )
    return joined.drop("__bin", "__lsb", "__rsb")
