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
