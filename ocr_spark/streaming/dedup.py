"""Streaming exact deduplication — the stateful drop-in of the batch
`dedup.exact_dedup` for an endless ingest stream.

Same canonical fingerprint (lower, collapse whitespace, md5) as the batch
operator, then Spark's stateful `dropDuplicates` keyed on it: the first
arrival of each fingerprint survives, replays across micro-batch
boundaries are suppressed by the dedup state store, and with an
event-time watermark the state is BOUNDED — fingerprints older than the
horizon expire, which is the only form that survives an unbounded stream
(state otherwise grows with distinct documents forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.operators.textstats import fingerprint


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """Streaming DataFrame with duplicate-fingerprint rows dropped.

    ``watermark=(ts_col, "24 hours")`` bounds the dedup state to the
    watermark horizon (`dropDuplicatesWithinWatermark`); None keeps exact
    all-time dedup with unbounded state — fine for a finite backfill,
    wrong for a perpetual stream.
    """
    with_fp = docs.withColumn("fp", fingerprint(F.col(text_col)))
    if watermark is not None:
        ts_col, delay = watermark
        return with_fp.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(["fp"])
    return with_fp.dropDuplicates(["fp"])
