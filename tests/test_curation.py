"""Targeted behavioral tests for the corpus-curation operators (the
oracle suite proves engine-equality; these prove the SEMANTICS on
planted cases: a known-contaminated doc is dropped, a 7-word overlap is
not, IBANs survive the card/phone regexes, sampling is deterministic)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators import curation

W = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima".split()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark, rows):
    return spark.createDataFrame(rows, "bench_id long, text string")


# --------------------------------------------------------------------------
# decontamination
# --------------------------------------------------------------------------


def test_contamination_exact_8gram_hit(spark):
    bench = _bench(spark, [(100, " ".join(W[:8]))])
    docs = _docs(
        spark,
        [
            (1, "xx yy " + " ".join(W[:8]) + " zz"),  # contains the full 8-gram
            (2, "xx yy " + " ".join(W[:7]) + " zz"),  # only 7 words — no 8-gram
        ],
    )
    pairs = {
        (r.doc_id, r.bench_id, r.n_shared)
        for r in curation.contamination_pairs(docs, bench).collect()
    }
    assert pairs == {(1, 100, 1)}
    survivors = {r.doc_id for r in curation.decontaminate(docs, bench).collect()}
    assert survivors == {2}


def test_contamination_counts_distinct_shared_grams(spark):
    # bench has 12 words → 5 distinct 8-grams; a doc containing the same
    # 12 words shares all 5; repeating the span does NOT inflate n_shared
    bench = _bench(spark, [(7, " ".join(W))])
    docs = _docs(spark, [(1, " ".join(W)), (2, " ".join(W) + " " + " ".join(W))])
    got = {
        (r.doc_id, r.n_shared)
        for r in curation.contamination_pairs(docs, bench).collect()
    }
    assert got == {(1, 5), (2, 5)}


def test_contamination_normalizes_case_and_whitespace(spark):
    bench = _bench(spark, [(9, " ".join(W[:8]).upper())])
    docs = _docs(spark, [(1, "  " + "   ".join(W[:8]) + "  ")])
    assert curation.contamination_pairs(docs, bench).count() == 1


def test_min_hits_threshold(spark):
    bench = _bench(spark, [(5, " ".join(W))])  # 5 distinct 8-grams
    docs = _docs(spark, [(1, " ".join(W[:9]))])  # shares exactly 2 of them
    assert curation.decontaminate(docs, bench, min_hits=3).count() == 1
    assert curation.decontaminate(docs, bench, min_hits=2).count() == 0


# --------------------------------------------------------------------------
# PII
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "text,counts",
    [
        ("write to a.user+tag@sub.example.org today", dict(n_email=1)),
        ("iban DE89370400440532013000 end", dict(n_iban=1)),
        ("card 4111 1111 1111 1111 ok", dict(n_card=1)),
        ("call +41 21 555 01 23 now", dict(n_phone=1)),
        ("no pii here at all", {}),
        # an IBAN's digit tail must not double-count as card/phone
        ("pay CH9300762011623852957 thanks", dict(n_iban=1)),
        ("two mails a@b.co and c@d.io", dict(n_email=2)),
    ],
)
def test_pii_stats_planted(spark, text, counts):
    docs = _docs(spark, [(1, text)])
    row = curation.pii_stats(docs).collect()[0]
    expect = {"n_email": 0, "n_iban": 0, "n_card": 0, "n_phone": 0} | counts
    got = {k: row[k] for k in expect}
    assert got == expect, text
    assert row.has_pii == (sum(expect.values()) > 0)


def test_redaction_order_and_tokens(spark):
    docs = _docs(
        spark,
        [(1, "mail a@b.co iban DE89370400440532013000 card 4111 1111 1111 1111 tel +41 21 555 01 23 done")],
    )
    red = curation.redact_pii(docs).collect()[0].text_redacted
    assert red == "mail [EMAIL] iban [IBAN] card [CARD] tel [PHONE] done"


def test_redaction_leaves_clean_text_unchanged(spark):
    txt = "perfectly ordinary sentence with numbers 12 34 and words"
    docs = _docs(spark, [(1, txt)])
    assert curation.redact_pii(docs).collect()[0].text_redacted == txt


# --------------------------------------------------------------------------
# stratified sampling
# --------------------------------------------------------------------------


def test_stratified_sample_deterministic_and_calibrated(spark):
    rows = [(i, "t", ["en", "fr"][i % 2]) for i in range(2000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    rates = {"en": 0.3, "fr": 0.9}
    a = sorted(r.doc_id for r in curation.stratified_sample(docs, rates).collect())
    b = sorted(r.doc_id for r in curation.stratified_sample(docs, rates).collect())
    assert a == b  # same rows every run — no RNG state
    per_lang = (
        curation.stratified_sample(docs, rates)
        .groupBy("lang")
        .count()
        .collect()
    )
    got = {r.lang: r["count"] / 1000 for r in per_lang}
    assert abs(got["en"] - 0.3) < 0.05 and abs(got["fr"] - 0.9) < 0.05


def test_stratified_sample_rate_edges(spark):
    rows = [(i, "t", "en") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    assert curation.stratified_sample(docs, {"en": 1.0}).count() == 200
    assert curation.stratified_sample(docs, {"en": 0.0}).count() == 0
    # unknown group falls back to default_rate
    assert curation.stratified_sample(docs, {"xx": 1.0}, default_rate=0.0).count() == 0


def test_stratified_sample_salt_changes_draw(spark):
    rows = [(i, "t", "en") for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    a = {r.doc_id for r in curation.stratified_sample(docs, {"en": 0.5}, salt="a").collect()}
    b = {r.doc_id for r in curation.stratified_sample(docs, {"en": 0.5}, salt="b").collect()}
    assert a != b and abs(len(a) - len(b)) < 100


# --------------------------------------------------------------------------
# composed pipeline
# --------------------------------------------------------------------------


def test_curate_corpus_each_stage_drops_its_target(spark):
    base = ("the and of to is " + " ".join(W)) * 3  # quality-passing filler
    near = base + " extra tail words here"
    docs = _docs(
        spark,
        [
            (1, base),  # survivor (also exact-dup keeper)
            (2, base),  # exact dup of 1 → dropped
            (3, near),  # near dup of 1 (high jaccard) → dropped
            (4, "tiny"),  # fails the quality gate → dropped
            (5, ("zeta " * 40) + "the and of to is benchmark secret eval question answer span here now"),
        ],
    )
    bench = _bench(spark, [(99, "benchmark secret eval question answer span here now")])
    survivors = {r.doc_id for r in curation.curate_corpus(docs, bench).collect()}
    assert survivors == {1}


# ---------------------------------------------------------------------------
# weighted_sample (A-ES)
# ---------------------------------------------------------------------------


def test_weighted_sample_matches_python_reference(spark):
    import hashlib
    import math

    rows = [(i, float(1 + (i * 7) % 40)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = sorted(
        r.doc_id for r in curation.weighted_sample(df, 25, "w").collect()
    )

    def key(i, w):
        u = (
            int(hashlib.md5(f"0:{i}".encode()).hexdigest()[:15], 16)
            / float(1 << 60)
        )
        return -math.log(u) / w

    want = sorted(
        i for i, _ in sorted(rows, key=lambda t: (key(*t), t[0]))[:25]
    )
    assert got == want


def test_weighted_sample_partition_invariant_and_weight_rules(spark):
    rows = [(i, float(i % 5)) for i in range(200)]  # i%5==0 → weight 0: excluded
    df = spark.createDataFrame(rows, "doc_id long, w double")
    a = sorted(r.doc_id for r in curation.weighted_sample(df, 30, "w").collect())
    b = sorted(
        r.doc_id
        for r in curation.weighted_sample(df.repartition(7), 30, "w").collect()
    )
    assert a == b
    assert all(i % 5 != 0 for i in a)
    # different salt → different (deterministic) sample
    c = sorted(
        r.doc_id for r in curation.weighted_sample(df, 30, "w", salt=1).collect()
    )
    assert c != a


def test_weighted_sample_is_weight_proportional(spark):
    """Statistical sanity over many salts: rows with 9x the weight are
    picked ~9x as often when sampling 1-of-many."""
    rows = [(i, 9.0 if i < 50 else 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double").cache()
    heavy = 0
    for salt in range(60):
        picked = curation.weighted_sample(df, 1, "w", salt=salt).collect()[0].doc_id
        heavy += picked < 50
    # heavy mass fraction = 450/900 = 0.5 → expect ~30/60; uniform would
    # give ~6/60. Wide tolerance keeps the test deterministic-stable.
    assert 18 <= heavy <= 42
