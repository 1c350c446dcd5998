"""Word-level structured OCR table (OCRResult / AR1 analogue).

The word rows must be CONSISTENT with the page text parse: joining a
line's words reassembles exactly the whitespace-split tokens of that
text line, in reading order — the same invariant tesseract's word level
has with its own page text (src/ocr/ocr_engine.py:154-191).
"""

from __future__ import annotations

import pytest

from ocr_spark.kernel import pdfdoc


def _payload():
    # two pages; page 1 has two lines (one split across runs, appearing
    # out of order), page 2 one line
    return pdfdoc.build_payload(
        [
            [
                (200.0, 700.0, "TTC 121,00"),
                (10.0, 700.0, "TOTAL"),
                (10.0, 650.0, "FACTURE N° 2024-001"),
            ],
            [(10.0, 700.0, "page deux")],
        ]
    )


def test_words_match_page_text_tokens():
    payload = _payload()
    pages = dict(pdfdoc.parse_pages(payload))
    words = pdfdoc.parse_words(payload)
    for page_no, text in pages.items():
        for line_id, line in enumerate(text.split("\n")):
            got = [
                w["word"]
                for w in words
                if w["page_no"] == page_no and w["line_id"] == line_id
            ]
            assert got == line.split(), (page_no, line_id)


def test_word_geometry_and_conf():
    words = pdfdoc.parse_words(_payload())
    for w in words:
        assert w["x1"] > w["x0"] and w["y1"] > w["y0"]
        assert 0.5 <= w["conf"] <= 0.99
        assert w["level"] == pdfdoc.WORD_LEVEL
    # deterministic: same word → same confidence everywhere
    assert pdfdoc.parse_words(_payload()) == words
    # within a line, word_no increases with x
    line0 = [w for w in words if w["page_no"] == 1 and w["line_id"] == 0]
    xs = [w["x0"] for w in sorted(line0, key=lambda w: w["word_no"])]
    assert xs == sorted(xs)


def test_words_from_text_lines():
    rows = pdfdoc.words_from_text("ligne une\nligne deux trois")
    assert [r["word"] for r in rows if r["line_id"] == 0] == ["ligne", "une"]
    assert [r["word"] for r in rows if r["line_id"] == 1] == ["ligne", "deux", "trois"]
    assert len({r["word_no"] for r in rows}) == len(rows)


def test_non_spdf_requires_backend():
    with pytest.raises(NotImplementedError):
        pdfdoc.parse_words(b"%PDF-1.7 real pdf bytes")


def test_ocr_words_operator(spark):
    """Spark operator: every SPDF/FAKEIMG payload in the synth corpus
    yields word rows; min_conf reproduces the reference's gate."""
    from ocr_spark.operators.extract import attach_payloads, explode_spans
    from ocr_spark.operators.words import ocr_words
    from ocr_spark.queries import _synth_docs_media

    docs, media = _synth_docs_media(spark)
    rows = attach_payloads(explode_spans(docs), media)
    words = ocr_words(rows).toPandas()
    assert len(words) > 0
    media_docs = rows.filter(
        "kind in ('pdf','image') and payload is not null"
    ).count()
    assert words.groupby(["doc_id", "offset"]).ngroups == media_docs
    assert (words["conf"] >= 0.5).all()
    gated = ocr_words(rows, min_conf=0.8).toPandas()
    assert len(gated) == (words["conf"] > 0.8).sum()
