"""Streaming quality signals — stateless drop-ins.

The row-local forms in ocr_spark.operators.quality
(:func:`repetition_stats_local`, :func:`dedup_lines_local`) are pure
column expressions with zero shuffles, so they run UNCHANGED on a
streaming DataFrame in append mode with no state store and no watermark
— each micro-batch row is scored/cleaned independently, and the output
equals the batch operators row-for-row across any micro-batch split
(tests/test_streaming_quality.py). This module just re-exports them
under their streaming names so pipeline code reads declaratively; the
explode-based batch forms must NOT be used on streams (their per-doc
groupBy is a streaming aggregation that append mode would reject).
"""

from __future__ import annotations

from ocr_spark.operators.quality import (  # noqa: F401
    dedup_lines_local as dedup_lines_stream,
    repetition_stats_local as repetition_stats_stream,
)
