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
