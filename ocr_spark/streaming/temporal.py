"""Streaming as-of enrichment: join a stream of events to the most
recent row of a STATIC (slowly-changing) dimension snapshot at-or-before
each event's timestamp.

Because the right side is static, every micro-batch can be enriched
independently — the batch ``asof_join`` runs inside ``foreachBatch``
with zero stream state (no watermark, no state store), and restart
safety is the sink's concern exactly as in streaming/pipeline.py. This
is the common production shape (prices, exchange rates, dimension
versions land daily; events stream continuously). A true stream-stream
as-of needs watermark-bounded buffering of BOTH sides and is
deliberately out of scope — the batch operator documents the union-and-
window form a backfill would use.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.operators.temporal import asof_join


def asof_enrich_writer(
    stream: DataFrame,
    static_right: DataFrame,
    sink: Callable[[DataFrame, int], None],
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
):
    """``writeStream`` writer enriching each micro-batch via the batch
    as-of join and handing the result to ``sink(df, batch_id)``. The
    static side's plan is reused across batches — persist it (or let it
    broadcast, it is dimension-sized) before passing it in."""

    def _enrich(batch_df: DataFrame, batch_id: int) -> None:
        out = asof_join(
            batch_df,
            static_right,
            on=on,
            left_ts=left_ts,
            right_ts=right_ts,
            right_cols=right_cols,
            direction=direction,
            tolerance=tolerance,
        )
        sink(out, batch_id)

    return stream.writeStream.foreachBatch(_enrich)


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    before_sec: int = 0,
    after_sec: int = 600,
    watermark: str = "10 minutes",
) -> DataFrame:
    """TRUE stream-stream interval join (native Structured Streaming,
    append mode): pairs with equal keys whose right timestamp falls in
    [left_ts − before_sec, left_ts + after_sec] — the click-attribution
    / impression-conversion shape where BOTH sides stream.

    Both inputs get event-time watermarks AND the join carries the
    explicit time-range condition — together that is what lets Spark
    BOUND the join state: a buffered row is evicted once the other
    side's watermark passes its reachable range, so state is
    O(rate × (watermark + range)), never O(stream). Inner join in
    append mode emits each match as soon as both rows have arrived
    (no flush latency); the right side's timestamp column comes back
    suffixed ``_r`` when the names collide.

    This is the streaming twin of ``operators/temporal.interval_join``'s
    point-in-range case; the remaining stream-stream AS-OF (latest-
    before, not all-in-range) still needs custom state and stays with
    the documented batch/foreachBatch forms."""
    keys = [on] if isinstance(on, str) else list(on)
    lts, rts = left_ts, right_ts if right_ts != left_ts else f"{right_ts}_r"
    if rts != right_ts:
        right = right.withColumnRenamed(right_ts, rts)
    # rename non-key, non-ts collisions too (suffix _r)
    for c in right.columns:
        if c in left.columns and c not in keys and c != rts:
            right = right.withColumnRenamed(c, f"{c}_r")
    l = left.withWatermark(lts, watermark)
    r = right.withWatermark(rts, watermark)
    cond = None
    for k in keys:
        e = l[k] == r[k]
        cond = e if cond is None else (cond & e)
    cond = (
        cond
        & (r[rts] >= l[lts] - F.expr(f"INTERVAL {int(before_sec)} SECONDS"))
        & (r[rts] <= l[lts] + F.expr(f"INTERVAL {int(after_sec)} SECONDS"))
    )
    return l.join(r, cond, "inner").drop(*[r[k] for k in keys])
