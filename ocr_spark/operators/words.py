"""Word-level structured OCR output as a queryable table.

The reference returns word-granular OCR data only as in-memory Python
structures — ``OCRResult.word_confidences``/``bounding_boxes`` and the
words/lines dict of ``extract_structured_data``
(/root/reference/src/ocr/ocr_engine.py:18-24,154-191) — that no
downstream consumer can query.  Here the same data is a first-class
table: one row per word with confidence, bbox, tesseract level, and the
AR1 line grouping, produced by an Arrow-batched ``mapInPandas`` stage
over the media payload rows (no per-row Python).

SPDF payloads get deterministic monospace geometry and md5-derived
confidences (kernel/pdfdoc.parse_words); FAKEIMG image stubs synthesize
lines from the embedded text; real backends (tesseract ``image_to_data``)
drop in through the words seam without pipeline changes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ocr_spark.kernel import pdfdoc
from ocr_spark.kernel.assemble import IMAGE_MARKER

OCR_WORDS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
        T.StructField("page_no", T.IntegerType(), False),
        T.StructField("line_id", T.IntegerType(), False),
        T.StructField("word_no", T.IntegerType(), False),
        T.StructField("word", T.StringType(), False),
        T.StructField("conf", T.DoubleType(), False),
        T.StructField("x0", T.DoubleType(), False),
        T.StructField("y0", T.DoubleType(), False),
        T.StructField("x1", T.DoubleType(), False),
        T.StructField("y1", T.DoubleType(), False),
        T.StructField("level", T.IntegerType(), False),
    ]
)

_WORD_COLS = [f.name for f in OCR_WORDS_SCHEMA.fields]


def _payload_words(kind: str, payload: bytes | None) -> list[dict]:
    if payload is None:
        return []
    payload = bytes(payload)
    if kind == "pdf":
        try:
            return pdfdoc.parse_words(payload)
        except NotImplementedError:
            return []
    if kind == "image":
        if payload.startswith(IMAGE_MARKER):
            text = payload[len(IMAGE_MARKER):].decode("utf-8", errors="replace")
            return pdfdoc.words_from_text(text)
        backend = pdfdoc.resolve_backend(
            pdfdoc.WORDS_BACKEND_PROP, pdfdoc.WORDS_BACKEND_ENV
        )
        if backend is not None:
            return list(backend(payload))
        return []
    return []


def _words_map(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in it:
        out: dict[str, list] = {c: [] for c in _WORD_COLS}
        for doc_id, kind, media_ref, offset, payload in zip(
            batch["doc_id"], batch["kind"], batch["media_ref"], batch["offset"],
            batch["payload"],
        ):
            for w in _payload_words(kind, payload):
                out["doc_id"].append(doc_id)
                out["media_ref"].append(media_ref)
                out["offset"].append(int(offset))
                for k in ("page_no", "line_id", "word_no", "word", "conf",
                          "x0", "y0", "x1", "y1", "level"):
                    out[k].append(w[k])
        yield pd.DataFrame(out, columns=_WORD_COLS)


def ocr_words(spans_with_payload: DataFrame, min_conf: float | None = None) -> DataFrame:
    """Media span rows (doc_id, kind, media_ref, offset, payload) → one
    row per recognized word.

    ``min_conf`` reproduces the reference's structured-output gate
    (``int(data['conf'][i]) > confidence_threshold * 100`` —
    ocr_engine.py:165); None emits every word and leaves thresholding to
    the consumer (the relational form).
    """
    import pyspark.sql.functions as F

    media_rows = spans_with_payload.filter(
        F.col("kind").isin("pdf", "image") & F.col("payload").isNotNull()
    ).select("doc_id", "kind", "media_ref", "offset", "payload")
    out = media_rows.mapInPandas(_words_map, schema=OCR_WORDS_SCHEMA)
    if min_conf is not None:
        out = out.filter(F.col("conf") > min_conf)
    return out
