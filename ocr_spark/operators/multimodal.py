"""Multimodal column plumbing (image/audio/video as opaque binary).

The Spark-side mechanics — schema, Arrow batching, partition-friendly UDF
signatures — are real and tested; the actual codec work is stubbed because
the image/audio libraries are not in this container (the reference's
equivalent stage shells out to cv2/tesseract, src/processors/
image_processor.py:26-54).  Payloads beginning with ``FAKEIMG:`` decode to
deterministic fake features so tests exercise the full batch path; any
other payload raises NotImplementedError at the decode boundary only.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ocr_spark.kernel.assemble import IMAGE_MARKER

MEDIA_FEATURES = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("phash", T.StringType(), True),
        T.StructField("ocr_text", T.StringType(), True),
    ]
)


def _decode_stub(payload: bytes) -> dict:
    """Deterministic fake decode. A real backend (cv2/PIL) drops in here."""
    if payload.startswith(IMAGE_MARKER):
        body = payload[len(IMAGE_MARKER):]
        digest = hashlib.md5(body).hexdigest()
        return {
            "format": "fake-img",
            "width": 640 + int(digest[:2], 16),
            "height": 480 + int(digest[2:4], 16),
            "phash": digest[:16],
            "ocr_text": body.decode("utf-8", errors="replace"),
        }
    raise NotImplementedError(
        "real image decode requires cv2/PIL, not available in this container"
    )


def _features_map(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in it:
        rows = []
        for media_ref, payload in zip(batch["media_ref"], batch["payload"]):
            payload = bytes(payload) if payload is not None else b""
            try:
                feats = _decode_stub(payload)
            except NotImplementedError:
                feats = {"format": None, "width": None, "height": None,
                         "phash": None, "ocr_text": None}
            rows.append({"media_ref": media_ref, "n_bytes": len(payload), **feats})
        yield pd.DataFrame.from_records(
            rows, columns=[f.name for f in MEDIA_FEATURES.fields]
        )


def media_features(media: DataFrame) -> DataFrame:
    """media(media_ref, payload) → typed feature rows; Arrow-batched."""
    return media.mapInPandas(_features_map, schema=MEDIA_FEATURES)
