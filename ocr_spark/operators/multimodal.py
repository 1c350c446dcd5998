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

from ocr_spark.kernel.assemble import IMAGE_BACKEND_ENV, IMAGE_BACKEND_PROP, IMAGE_MARKER
from ocr_spark.kernel.pdfdoc import resolve_backend


def set_image_backend(spark, spec: str | None) -> None:
    """Driver-side: route non-FAKEIMG payloads of subsequent jobs to a
    real decoder ``module:function`` (bytes → feature dict); None clears."""
    spark.sparkContext.setLocalProperty(IMAGE_BACKEND_PROP, spec)

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
    """Deterministic fake decode.  A real backend (cv2/PIL) drops in via
    the ``ocr_spark.image_backend`` job property / env var — same seam as
    pdfdoc (proven in tests/test_codec_seam.py), no operator change."""
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
    backend = resolve_backend(IMAGE_BACKEND_PROP, IMAGE_BACKEND_ENV)
    if backend is not None:
        return dict(backend(payload))
    raise NotImplementedError(
        "real image decode requires cv2/PIL: register a backend via "
        f"{IMAGE_BACKEND_PROP} / ${IMAGE_BACKEND_ENV}"
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


# ---------------------------------------------------------------------------
# resize / frame-sample (stubbed codecs, real Spark plumbing)
# ---------------------------------------------------------------------------

RESIZED = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FRAMES = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

# deterministic fake multi-frame container: FAKEVID: + frames joined by \x00
VIDEO_MARKER = b"FAKEVID:"
_FRAME_SEP = b"\x00"


def _resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """A real backend (cv2.resize / PIL.thumbnail) drops in here; the stub
    re-encodes deterministically so tests can assert the batch path."""
    if payload.startswith(IMAGE_MARKER):
        body = payload[len(IMAGE_MARKER):]
        return IMAGE_MARKER + f"resized:{width}x{height}:".encode() + body
    raise NotImplementedError("real image resize requires cv2/PIL")


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Batched image resize; rows whose payload can't be decoded carry a
    null payload instead of failing the task (per-row errors must never
    kill a 10^12-doc job)."""

    def _map(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            out = {"media_ref": [], "width": [], "height": [], "payload": []}
            for media_ref, payload in zip(batch["media_ref"], batch["payload"]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    resized = _resize_stub(payload, width, height)
                    out["width"].append(width)
                    out["height"].append(height)
                except NotImplementedError:
                    resized = None
                    out["width"].append(None)
                    out["height"].append(None)
                out["media_ref"].append(media_ref)
                out["payload"].append(resized)
            yield pd.DataFrame(out)

    return media.mapInPandas(_map, schema=RESIZED)


# ---------------------------------------------------------------------------
# audio (stubbed codec, real Spark plumbing — same seam as image/pdf)
# ---------------------------------------------------------------------------

# deterministic fake audio container: FAKEAUD:<sample_rate>: + signed bytes
AUDIO_MARKER = b"FAKEAUD:"
AUDIO_BACKEND_PROP = "ocr_spark.audio_backend"
AUDIO_BACKEND_ENV = "OCR_SPARK_AUDIO_BACKEND"

AUDIO_FEATURES = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)

RESAMPLED = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def _audio_decode_stub(payload: bytes) -> tuple[int, "pd.Series"]:
    """(sample_rate, samples as numpy int8).  A real backend
    (librosa/ffmpeg) drops in via the audio seam; non-FAKEAUD payloads
    dispatch there or raise at the decode boundary only."""
    import numpy as np

    if payload.startswith(AUDIO_MARKER):
        body = payload[len(AUDIO_MARKER):]
        sr_raw, _, samples = body.partition(b":")
        try:
            sr = int(sr_raw)
        except ValueError as exc:  # corrupt header = undecodable, NOT a task failure
            raise NotImplementedError(f"malformed FAKEAUD header: {sr_raw[:20]!r}") from exc
        return sr, np.frombuffer(samples, dtype=np.int8)
    backend = resolve_backend(AUDIO_BACKEND_PROP, AUDIO_BACKEND_ENV)
    if backend is not None:
        sr, samples = backend(payload)
        return int(sr), np.asarray(samples, dtype=np.int8)
    raise NotImplementedError(
        "real audio decode requires librosa/ffmpeg: register a backend via "
        f"{AUDIO_BACKEND_PROP} / ${AUDIO_BACKEND_ENV}"
    )


def audio_features(media: DataFrame) -> DataFrame:
    """media(media_ref, payload) → (sample_rate, n_samples, duration, RMS
    loudness); rows whose payload can't be decoded carry nulls instead of
    failing the task.  Arrow-batched; the per-payload DSP is numpy."""
    import numpy as np

    def _map(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            rows = []
            for media_ref, payload in zip(batch["media_ref"], batch["payload"]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    sr, samples = _audio_decode_stub(payload)
                    n = len(samples)
                    rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))) if n else 0.0
                    rows.append(
                        {
                            "media_ref": media_ref,
                            "n_bytes": len(payload),
                            "sample_rate": sr,
                            "n_samples": n,
                            "duration_s": round(n / sr, 6) if sr else None,
                            "rms": round(rms, 6),
                        }
                    )
                except NotImplementedError:
                    rows.append(
                        {
                            "media_ref": media_ref, "n_bytes": len(payload),
                            "sample_rate": None, "n_samples": None,
                            "duration_s": None, "rms": None,
                        }
                    )
            yield pd.DataFrame.from_records(
                rows, columns=[f.name for f in AUDIO_FEATURES.fields]
            )

    return media.mapInPandas(_map, schema=AUDIO_FEATURES)


def resample_audio(media: DataFrame, target_rate: int) -> DataFrame:
    """Deterministic decimation resample (every round(sr/target)-th sample
    — a real backend does proper filtering; the Spark plumbing, schema and
    batch shape are the contract). Undecodable rows carry null payloads."""

    def _map(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            out = {"media_ref": [], "sample_rate": [], "payload": []}
            for media_ref, payload in zip(batch["media_ref"], batch["payload"]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    sr, samples = _audio_decode_stub(payload)
                    step = max(1, round(sr / target_rate))
                    kept = samples[::step]
                    out["sample_rate"].append(target_rate)
                    out["payload"].append(
                        AUDIO_MARKER + str(target_rate).encode() + b":" + kept.tobytes()
                    )
                except NotImplementedError:
                    out["sample_rate"].append(None)
                    out["payload"].append(None)
                out["media_ref"].append(media_ref)
            yield pd.DataFrame(out, columns=["media_ref", "sample_rate", "payload"])

    return media.mapInPandas(_map, schema=RESAMPLED)


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Video frame sampling: one output row per kept frame (frame 0, k,
    2k, …) — the explode-shaped op whose row count is data-dependent, so
    it must be a mapInPandas yielding variable-length batches, never a
    per-row UDF."""

    def _map(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            out = {"media_ref": [], "frame_no": [], "payload": []}
            for media_ref, payload in zip(batch["media_ref"], batch["payload"]):
                payload = bytes(payload) if payload is not None else b""
                if not payload.startswith(VIDEO_MARKER):
                    continue  # not a video container; a real codec dispatches here
                frames = payload[len(VIDEO_MARKER):].split(_FRAME_SEP)
                for i in range(0, len(frames), every_k):
                    out["media_ref"].append(media_ref)
                    out["frame_no"].append(i)
                    out["payload"].append(frames[i])
            yield pd.DataFrame(out, columns=["media_ref", "frame_no", "payload"])

    return media.mapInPandas(_map, schema=FRAMES)


def media_captions(
    docs: DataFrame,
    spans_col: str = "spans",
    id_col: str = "doc_id",
) -> DataFrame:
    """CLIP-style image-text pair mining from interleaved documents:
    one row per media span with its nearest preceding and following
    text spans — the caption candidates multimodal contrastive
    training harvests from interleaved corpora (images usually sit
    between the prose that describes them).

    Emits ``(doc_id, pos, media_ref, cap_before, cap_after)``; the
    caption columns are NULL when no text span exists on that side.

    Scale shape: entirely row-local — one ``transform`` indexes the
    spans array, nested higher-order lambdas scan it per media element
    (spans-per-doc is bounded, so the O(n²) per-row scan is constant
    work), and ``explode`` emits the pairs. ZERO shuffle, zero Python;
    the stage inherits upstream partitioning and is a stateless
    streaming drop-in."""
    from pyspark.sql import functions as F

    staged = docs.select(
        id_col,
        F.transform(
            spans_col,
            lambda s, i: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                i.cast("int").alias("i"),
            ),
        ).alias("_sx"),
    )
    sx = F.col("_sx")
    pairs = F.transform(
        F.filter(sx, lambda s: s["media_ref"] != ""),
        lambda m: F.struct(
            m["i"].alias("pos"),
            m["media_ref"].alias("media_ref"),
            F.try_element_at(
                F.filter(
                    sx, lambda t: (t["media_ref"] == "") & (t["i"] < m["i"])
                ),
                F.lit(-1),
            )["text"].alias("cap_before"),
            F.try_element_at(
                F.filter(
                    sx, lambda t: (t["media_ref"] == "") & (t["i"] > m["i"])
                ),
                F.lit(1),
            )["text"].alias("cap_after"),
        ),
    )
    out = staged.select(id_col, F.explode(pairs).alias("_p"))
    return out.select(
        id_col,
        F.col("_p")["pos"].alias("pos"),
        F.col("_p")["media_ref"].alias("media_ref"),
        F.col("_p")["cap_before"].alias("cap_before"),
        F.col("_p")["cap_after"].alias("cap_after"),
    )


def interleaved_stats(
    docs: DataFrame, spans_col: str = "spans", id_col: str = "doc_id"
) -> DataFrame:
    """Per-kind corpus profile of an interleaved span table.

    One row per span kind with span count, distinct-document coverage,
    character mass, and text-token mass (media spans carry 0 tokens —
    their training cost is the packer's fixed projector budget, not a
    token count).  The audit a multimodal corpus build runs before
    packing/mixing: modality balance, text:image ratios, and
    docs-with-media coverage all read off this table.

    Scale shape: the explode is a map-side flatten and the aggregation
    is a keyed agg on KIND (a handful of groups) with map-side partial
    combine and the distinct-doc count two-phase (doc_id, kind) →
    kind, so only tiny partials shuffle; the spans payload itself never
    does.  All outputs are exact integers — no float crosses the
    driver seam.
    """
    from pyspark.sql import functions as F

    s = docs.select(F.col(id_col).alias("doc_id"), F.explode(spans_col).alias("s"))
    txt = F.trim(F.col("s.text"))
    ntok = (
        F.when(F.col("s.media_ref") != "", F.lit(0))
        .when(F.length(txt) == 0, F.lit(0))
        .otherwise(F.size(F.split(txt, r"\s+")))
    )
    per_doc = s.groupBy("doc_id", F.col("s.kind").alias("kind")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.length(F.col("s.text"))).alias("_chars"),
        F.sum(ntok).alias("_toks"),
    )
    return per_doc.groupBy("kind").agg(
        F.sum("_n").cast("long").alias("n_spans"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_chars").cast("long").alias("total_chars"),
        F.sum("_toks").cast("long").alias("total_tokens"),
    )


def media_dedup(
    media: DataFrame, ref_col: str = "media_ref", payload_col: str = "payload"
) -> DataFrame:
    """Content-addressed payload dedup over a media side table.

    Groups payloads by md5 fingerprint and reports the reference count,
    byte size, and the canonical keeper ref (min) per distinct payload
    — the storage-dedup / CAS audit for image-heavy corpora, where the
    same image is referenced from many crawled pages.

    Scale shape: the fingerprint + length are projected FIRST, so the
    binary payloads never shuffle — the keyed agg moves only (16-byte
    md5, partial count, min ref, length) partials.  Downstream, joining
    ``keeper_ref`` back on the span table rewrites duplicate refs to
    the canonical copy without touching payload bytes.
    """
    from pyspark.sql import functions as F

    fp = media.select(
        F.md5(payload_col).alias("payload_md5"),
        F.length(payload_col).cast("long").alias("n_bytes"),
        F.col(ref_col).alias("_ref"),
    )
    return fp.groupBy("payload_md5").agg(
        F.count(F.lit(1)).cast("long").alias("n_refs"),
        F.min("_ref").alias("keeper_ref"),
        F.max("n_bytes").alias("n_bytes"),
    )
