"""Property-based invariants (hypothesis) for the kernel + dedup math.

These guard the algebraic contracts the operator implementations rely on,
independent of any fixture corpus.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

from ocr_spark.kernel import pdfdoc, textnorm
from ocr_spark.kernel.htmlx import extract_main_text_one

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@settings(max_examples=200, deadline=None)
@given(text_st)
def test_cleaners_are_idempotent(s):
    """clean(clean(x)) == clean(x) for every cleaner family."""
    for clean in (textnorm.clean_basic, textnorm.clean_llm, textnorm.clean_swiss):
        once = clean(pd.Series([s]))[0]
        twice = clean(pd.Series([once]))[0]
        assert once == twice


@settings(max_examples=200, deadline=None)
@given(text_st)
def test_cleaners_never_produce_runs_of_whitespace(s):
    for clean in (textnorm.clean_basic, textnorm.clean_llm, textnorm.clean_swiss):
        out = clean(pd.Series([s]))[0]
        assert "  " not in out and not out.startswith(" ") and not out.endswith(" ")


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(
                st.floats(0, 800, allow_nan=False),
                st.floats(0, 1000, allow_nan=False),
                st.text(
                    alphabet=st.characters(
                        blacklist_categories=("Cs", "Cc"), blacklist_characters="()\\"
                    ),
                    max_size=30,
                ),
            ),
            max_size=8,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_pdf_payload_roundtrip_page_structure(pages):
    """build_payload → parse_pages preserves page count and text runs'
    membership per page (modulo the layout line-merge)."""
    payload = pdfdoc.build_payload(pages)
    parsed = pdfdoc.parse_pages(payload)
    assert len(parsed) == len(pages)
    assert pdfdoc.page_count(payload) == len(pages)
    for (page_no, text), runs in zip(parsed, pages):
        for _, _, run_text in runs:
            squished = " ".join(run_text.split())
            if squished:
                assert squished in " ".join(text.split())


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=500))
def test_html_extract_never_leaks_script_or_nav(body_text):
    html = (
        "<html><head><script>var secret_js = 1;</script></head><body>"
        "<nav>NAVBOILER</nav><p>" + body_text.replace("<", " ").replace(">", " ")
        + "</p><footer>FOOTBOILER</footer></body></html>"
    )
    out = extract_main_text_one(html)
    assert "secret_js" not in out
    assert "NAVBOILER" not in out
    assert "FOOTBOILER" not in out


def _shingle_set(text: str, k: int = 5) -> set[str]:
    norm = " ".join(text.lower().split())
    if len(norm) < k:
        return {norm[:k]} if norm else {norm[:k]}
    return {norm[i : i + k] for i in range(len(norm) - k + 1)}


@settings(max_examples=200, deadline=None)
@given(text_st)
def test_simhash_vectorized_matches_scalar(s):
    """The numpy batch SimHash must equal the scalar spec on arbitrary
    unicode (the fixture-based parity test covers the batch path; this
    covers the math on adversarial inputs, driver-side)."""
    import hashlib

    import numpy as np

    from ocr_spark.operators import dedup

    # reproduce the UDF's inner math without Spark
    tokens = (s or "").lower().split()
    if not tokens:
        assert dedup.simhash64_py(s) == 0
        return
    uniq, counts = np.unique(np.asarray(tokens, dtype=object), return_counts=True)
    rows = np.stack([
        np.unpackbits(
            np.frombuffer(hashlib.md5(t.encode()).digest()[:8], dtype=np.uint8)
        ).astype(np.int64) * 2 - 1
        for t in uniq
    ])
    sums = counts @ rows
    v = int((sums > 0).astype(np.uint64) @ dedup._SIMHASH_POWS)
    v = v - (1 << 64) if v >= (1 << 63) else v
    assert v == dedup.simhash64_py(s)


@settings(max_examples=200, deadline=None)
@given(
    st.one_of(st.none(), st.floats(0, 1e6, allow_nan=False)),
    st.one_of(st.none(), st.floats(0, 1e6, allow_nan=False)),
    st.one_of(st.none(), st.floats(0, 1e6, allow_nan=False)),
    st.one_of(st.none(), st.floats(0.15, 0.25)),
)
def test_ml_amount_layers_are_stable(sub, vat, ttc, rate):
    """ML amount layers: imputation never erases a present value, and the
    consistency correction is idempotent (correcting a corrected triple
    changes nothing)."""
    from ocr_spark.kernel import ml

    s2, v2, t2 = ml.impute_amounts(sub, vat, ttc, rate)
    assert s2 == sub
    if vat:
        assert v2 == vat
    if ttc:
        assert t2 == ttc
    once = ml.validate_amounts_consistency(s2, v2, t2)
    twice = ml.validate_amounts_consistency(s2, v2, once)
    assert once == twice
    if s2 and v2 and once:
        assert abs((s2 + v2) - once) <= 0.01 or once == ttc
        assert ml.check_calculation_consistency(s2, v2, once)


@settings(max_examples=150, deadline=None)
@given(text_st, text_st)
def test_jaccard_bounds_and_symmetry(a, b):
    sa, sb = _shingle_set(a), _shingle_set(b)
    if not sa or not sb:
        return
    j = len(sa & sb) / len(sa | sb)
    j2 = len(sb & sa) / len(sb | sa)
    assert 0.0 <= j <= 1.0 and j == j2
    # canonicalization is idempotent under lower (NOT upper-roundtrip:
    # 'µ'.upper().lower() is GREEK SMALL MU, a different codepoint)
    assert _shingle_set(a) == _shingle_set(a.lower())
