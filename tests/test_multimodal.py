"""Multimodal plumbing: decode/resize/frame-sample over binary columns.

Codecs are stubbed (no cv2/PIL in this container), but schema, Arrow
batching, null-on-undecodable semantics, and the explode-shaped frame
sampler are real and verified here.
"""

from __future__ import annotations

import pytest

from ocr_spark.kernel.assemble import IMAGE_MARKER
from ocr_spark.operators import multimodal as mm
from ocr_spark.schemas import MEDIA


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("img-1", bytearray(IMAGE_MARKER + b"hello image one")),
        ("img-2", bytearray(IMAGE_MARKER + b"another image")),
        ("bad-1", bytearray(b"\x89PNG not really decodable here")),
        (
            "vid-1",
            bytearray(mm.VIDEO_MARKER + b"\x00".join(f"frame{i}".encode() for i in range(7))),
        ),
    ]
    return spark.createDataFrame(rows, schema=MEDIA)


def test_resize_shapes_and_null_on_undecodable(media):
    out = {r["media_ref"]: r for r in mm.resize_images(media, 224, 224).collect()}
    assert set(out) == {"img-1", "img-2", "bad-1", "vid-1"}
    assert out["img-1"]["width"] == 224 and out["img-1"]["height"] == 224
    assert bytes(out["img-1"]["payload"]).startswith(IMAGE_MARKER + b"resized:224x224:")
    # undecodable rows survive with null payload, never a task failure
    assert out["bad-1"]["payload"] is None and out["bad-1"]["width"] is None


def test_frame_sampling_every_k(media):
    frames = mm.sample_frames(media, every_k=2).collect()
    by_ref = {}
    for r in frames:
        by_ref.setdefault(r["media_ref"], []).append((r["frame_no"], bytes(r["payload"])))
    assert set(by_ref) == {"vid-1"}  # non-video rows produce no frames
    got = sorted(by_ref["vid-1"])
    assert [f for f, _ in got] == [0, 2, 4, 6]
    assert got[0][1] == b"frame0" and got[-1][1] == b"frame6"


def test_frame_sampling_deterministic(media):
    a = sorted(map(tuple, mm.sample_frames(media, every_k=3).collect()))
    b = sorted(map(tuple, mm.sample_frames(media, every_k=3).collect()))
    assert a == b


@pytest.fixture(scope="module")
def audio(spark):
    rows = [
        ("aud-1", bytearray(mm.AUDIO_MARKER + b"8000:" + bytes(range(100)))),
        ("aud-2", bytearray(mm.AUDIO_MARKER + b"16000:" + bytes(200))),
        ("bad-aud", bytearray(b"RIFF not decodable here")),
        ("corrupt-hdr", bytearray(mm.AUDIO_MARKER + b"not-a-rate:\x01\x02")),
    ]
    return spark.createDataFrame(rows, schema=MEDIA)


def test_audio_features_and_null_on_undecodable(audio):
    out = {r["media_ref"]: r for r in mm.audio_features(audio).collect()}
    assert out["aud-1"]["sample_rate"] == 8000
    assert out["aud-1"]["n_samples"] == 100
    assert out["aud-1"]["duration_s"] == round(100 / 8000, 6)
    assert out["aud-1"]["rms"] > 0
    assert out["aud-2"]["rms"] == 0.0  # silence
    assert out["bad-aud"]["sample_rate"] is None and out["bad-aud"]["rms"] is None
    # corrupt FAKEAUD header degrades to nulls too — never a task failure
    assert out["corrupt-hdr"]["sample_rate"] is None


def test_audio_resample_decimates(audio):
    out = {r["media_ref"]: r for r in mm.resample_audio(audio, 8000).collect()}
    def body_of(ref):
        return bytes(out[ref]["payload"])[len(mm.AUDIO_MARKER):].split(b":", 1)[1]

    # 16000 -> 8000: every 2nd sample kept
    assert len(body_of("aud-2")) == 100
    # already at target rate: unchanged sample count
    assert len(body_of("aud-1")) == 100
    assert out["bad-aud"]["payload"] is None


def test_audio_backend_seam(spark, audio):
    """Same drop-in seam as pdf/image: a registered backend decodes
    non-FAKEAUD payloads with no operator change."""
    mm.resolve_backend  # seam shared with pdfdoc
    spark.sparkContext.setLocalProperty(
        mm.AUDIO_BACKEND_PROP, "tests.fake_backends:decode_audio"
    )
    try:
        out = {r["media_ref"]: r for r in mm.audio_features(audio).collect()}
        assert out["bad-aud"]["sample_rate"] == 22050
        assert out["bad-aud"]["n_samples"] == 3
    finally:
        spark.sparkContext.setLocalProperty(mm.AUDIO_BACKEND_PROP, None)


def test_media_captions_nearest_text_neighbors(spark):
    from ocr_spark.operators.multimodal import media_captions

    df = spark.createDataFrame(
        [
            (0, [("text", "intro", "", 0), ("image", "", "img:a", 1),
                 ("text", "caption after", "", 2), ("image", "", "img:b", 3)]),
            (1, [("image", "", "solo", 0)]),
            (2, [("text", "no media", "", 0)]),
        ],
        "doc_id long, spans array<struct<"
        "kind:string,text:string,media_ref:string,offset:int>>",
    )
    rows = {
        (r["doc_id"], r["pos"]): (r["media_ref"], r["cap_before"], r["cap_after"])
        for r in media_captions(df).collect()
    }
    assert rows == {
        (0, 1): ("img:a", "intro", "caption after"),
        # img:b adopts the same text span as its before-neighbor; no after
        (0, 3): ("img:b", "caption after", None),
        (1, 0): ("solo", None, None),  # media with no prose at all
    }  # doc 2 (no media) emits nothing


def test_interleaved_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (0, [("text", "one two three", "", 0), ("image", "", "img:a", 1),
                 ("text", "four five", "", 2)]),
            (1, [("image", "", "img:b", 0), ("image", "", "img:c", 1)]),
            (2, [("text", "   ", "", 0)]),  # blank text span: 0 tokens
        ],
        "doc_id long, spans array<struct<"
        "kind:string,text:string,media_ref:string,offset:int>>",
    )
    rows = {r["kind"]: r.asDict() for r in mm.interleaved_stats(df).collect()}
    assert rows["text"]["n_spans"] == 3 and rows["text"]["n_docs"] == 2
    assert rows["text"]["total_tokens"] == 5  # 3 + 2 + 0
    assert rows["text"]["total_chars"] == len("one two three") + len("four five") + 3
    assert rows["image"]["n_spans"] == 3 and rows["image"]["n_docs"] == 2
    assert rows["image"]["total_tokens"] == 0


def test_media_dedup_refcounts_and_keeper(spark):
    rows = [
        ("ref:b", bytearray(b"payload-one")),
        ("ref:a", bytearray(b"payload-one")),  # same bytes, earlier ref
        ("ref:c", bytearray(b"payload-two")),
    ]
    out = {
        r["keeper_ref"]: r.asDict()
        for r in mm.media_dedup(spark.createDataFrame(rows, MEDIA)).collect()
    }
    assert len(out) == 2
    assert out["ref:a"]["n_refs"] == 2  # keeper is the MIN ref
    assert out["ref:a"]["n_bytes"] == len(b"payload-one")
    assert out["ref:c"]["n_refs"] == 1
