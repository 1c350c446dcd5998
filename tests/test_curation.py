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


# --------------------------------------------------------------------------
# substring dedup (Lee et al. duplicated-span removal)
# --------------------------------------------------------------------------


def test_substring_dedup_planted_spans(spark):
    """A 4-token phrase shared by two docs at n=3 (two overlapping dup
    windows): the first doc keeps it whole, the second loses the merged
    span; unique text survives; within-doc repeats are also cut."""
    phrase = "red green blue yellow"  # windows: (red green blue), (green blue yellow)
    docs = _docs(
        spark,
        [
            (1, f"{phrase} one two three"),
            (2, f"zero {phrase} four five"),
            (3, "totally unrelated words here"),
            # doc 4 repeats its own 3-gram: second occurrence cut
            (4, "aa bb cc dd aa bb cc"),
        ],
    )
    got = {
        r["doc_id"]: r
        for r in curation.substring_dedup(docs, n=3).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    # doc 1 is the global first occurrence -> untouched
    assert got[1]["text_kept"] == f"{phrase} one two three"
    assert got[1]["n_removed"] == 0
    # doc 2 loses exactly the 4 phrase tokens (overlap-merged), keeps the rest
    assert got[2]["text_kept"] == "zero four five"
    assert got[2]["n_removed"] == 4
    # doc 3 untouched
    assert got[3]["n_removed"] == 0
    # doc 4: "aa bb cc" appears at pos 0 and pos 4 -> second cut (3 tokens)
    assert got[4]["text_kept"] == "aa bb cc dd"
    assert got[4]["n_removed"] == 3
    # token accounting holds everywhere
    for r in got.values():
        assert r["n_tokens"] == r["n_removed"] + len(
            [t for t in r["text_kept"].split(" ") if t != ""]
        )


def test_dup_spans_planted_runs(spark):
    """dup_spans reports the MAXIMAL extent of each duplicated run: a
    4-token shared phrase at n=3 merges its two overlapping windows into
    one [start, start+3] span in BOTH docs (min_df counts occurrences,
    so the first copy is reported too, unlike substring_dedup's
    keep-first removal); clean docs yield no rows; two separated copies
    inside one doc yield two spans."""
    phrase = "red green blue yellow"
    docs = _docs(
        spark,
        [
            (1, f"{phrase} one two three"),
            (2, f"zero {phrase} four five"),
            (3, "totally unrelated words here"),
            # two in-doc copies of "aa bb cc", separated by unique text
            (4, "aa bb cc dd ee ff gg aa bb cc"),
        ],
    )
    rows = curation.dup_spans(docs, n=3, min_df=2).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(r)
    assert set(got) == {1, 2, 4}
    (s1,) = got[1]
    assert (s1["span_start"], s1["span_end"], s1["span_text"]) == (0, 3, phrase)
    (s2,) = got[2]
    assert (s2["span_start"], s2["span_end"], s2["span_text"]) == (1, 4, phrase)
    spans4 = sorted((r["span_start"], r["span_end"]) for r in got[4])
    assert spans4 == [(0, 2), (7, 9)]
    assert all(r["span_len"] == r["span_end"] - r["span_start"] + 1 for r in rows)


def test_dup_spans_adjacent_windows_merge(spark):
    """Two distinct duplicated 3-grams sitting back-to-back (covered
    ranges touching end-to-end) merge into ONE contiguous span."""
    docs = _docs(
        spark,
        [
            (1, "aa bb cc dd ee ff"),  # grams at 0 and 3 both duplicated
            (2, "aa bb cc xx yy zz"),
            (3, "qq rr ss dd ee ff"),
        ],
    )
    rows = curation.dup_spans(docs, n=3, min_df=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    # doc 1: windows at pos 0 ("aa bb cc") and pos 3 ("dd ee ff") are each
    # duplicated elsewhere; [0,2] and [3,5] touch -> one merged [0,5] span
    assert by_doc[1] == [(0, 5)]
    assert by_doc[2] == [(0, 2)] and by_doc[3] == [(3, 5)]


def _dup_spans_reference(docs: dict[int, list[str]], n: int, min_df: int):
    """Pure-Python reference for dup_spans: count n-gram occurrences,
    keep ≥ min_df starts, merge overlapping/touching covered intervals."""
    from collections import Counter

    cnt: Counter = Counter()
    for toks in docs.values():
        for i in range(len(toks) - n + 1):
            cnt[tuple(toks[i : i + n])] += 1
    out: dict[int, list[tuple[int, int, str]]] = {}
    for d, toks in docs.items():
        spans: list[list[int]] = []
        for p in range(len(toks) - n + 1):
            if cnt[tuple(toks[p : p + n])] < min_df:
                continue
            if spans and p <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], p + n - 1)
            else:
                spans.append([p, p + n - 1])
        if spans:
            out[d] = [(s, e, " ".join(toks[s : e + 1])) for s, e in spans]
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dup_spans_matches_python_reference_random(spark, seed):
    """dup_spans equals an independent pure-Python implementation on
    random small-alphabet corpora (4-word vocabulary forces heavy n-gram
    collisions), and the cross-operator invariant holds: every token
    substring_dedup removes lies inside dup_spans' reported coverage
    (removal exempts the globally-first occurrence; the span report
    includes it, so coverage ≥ removals, and any doc with removals has
    at least one span)."""
    import random

    rng = random.Random(seed)
    vocab = ["aa", "bb", "cc", "dd"]
    docs = {
        i: [rng.choice(vocab) for _ in range(rng.randint(0, 14))]
        for i in range(1, 8)
    }
    df = _docs(spark, [(d, " ".join(t)) for d, t in docs.items()])
    got: dict[int, list[tuple[int, int, str]]] = {}
    for r in curation.dup_spans(df, n=3, min_df=2).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_text"])
        )
    for d in got:
        got[d].sort()
    ref = _dup_spans_reference(docs, n=3, min_df=2)
    assert got == ref
    cov = {d: sum(e - s + 1 for s, e, _ in sp) for d, sp in ref.items()}
    for r in curation.substring_dedup(df, n=3).collect():
        if r["n_removed"]:
            assert r["doc_id"] in ref, "removed tokens outside any reported span"
            assert r["n_removed"] <= cov[r["doc_id"]]


def test_substring_dedup_short_docs_survive_whole(spark):
    docs = _docs(spark, [(1, "just two"), (2, "just two")])
    got = {r["doc_id"]: r for r in curation.substring_dedup(docs, n=3).collect()}
    assert got[1]["text_kept"] == "just two" and got[2]["text_kept"] == "just two"
    assert got[1]["n_removed"] == 0 and got[2]["n_removed"] == 0


# --------------------------------------------------------------------------
# per-group cap (C4/RefinedWeb domain cap)
# --------------------------------------------------------------------------


def test_cap_per_group_equals_plain_window(spark):
    """The skew-proof hex-bucket decomposition must select EXACTLY the
    rows the textbook per-group window picks, at any n_buckets."""
    from pyspark.sql import Window

    rows = [(i, f"g{i % 3}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    u = F.md5(F.concat(F.lit("0:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(u.asc(), F.col("doc_id").asc())
    want = {
        r["doc_id"]
        for r in df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 7)
        .collect()
    }
    for n_buckets in (1, 4, 256):
        got = {
            r["doc_id"]
            for r in curation.cap_per_group(
                df, "source", 7, n_buckets=n_buckets
            ).collect()
        }
        assert got == want, n_buckets


def test_cap_per_group_counts_and_small_groups(spark):
    rows = [(i, "big") for i in range(50)] + [(100 + i, "small") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = curation.cap_per_group(df, "source", 10).groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in out}
    # big group capped exactly; under-cap group survives whole
    assert got == {"big": 10, "small": 3}


def test_cap_per_group_salt_changes_selection(spark):
    rows = [(i, "g") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = {r["doc_id"] for r in curation.cap_per_group(df, "source", 20, salt=0).collect()}
    b = {r["doc_id"] for r in curation.cap_per_group(df, "source", 20, salt=1).collect()}
    assert len(a) == len(b) == 20 and a != b


def test_split_assign_partitions_every_row_once(spark):
    df = spark.range(0, 2000).select(F.col("id").cast("string").alias("doc_id"))
    out = curation.split_assign(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    got = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(got.values()) == 2000                      # total preserved
    assert abs(got["train"] / 2000 - 0.8) < 0.04          # md5 is uniform
    assert abs(got["val"] / 2000 - 0.1) < 0.03
    assert abs(got["test"] / 2000 - 0.1) < 0.03


def test_split_assign_stable_under_partitioning_and_growth(spark):
    df = spark.range(0, 500).select(F.col("id").cast("string").alias("doc_id"))
    a = {r["doc_id"]: r["split"] for r in curation.split_assign(
        df.repartition(3), {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    # growing the corpus must NOT move an existing doc between splits
    grown = spark.range(0, 1000).select(F.col("id").cast("string").alias("doc_id"))
    b = {r["doc_id"]: r["split"] for r in curation.split_assign(
        grown.repartition(11), {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_split_assign_rejects_bad_fractions(spark):
    import pytest as _pytest

    df = spark.range(3).select(F.col("id").cast("string").alias("doc_id"))
    with _pytest.raises(ValueError, match="sum to 1"):
        curation.split_assign(df, {"train": 0.8, "val": 0.1})
    with _pytest.raises(ValueError, match="at least two"):
        curation.split_assign(df, {"all": 1.0})


def test_dup_spans_apply_equals_full_restriction(spark):
    """dup_spans_apply(delivery, stats-over-everything) == dup_spans over
    the full corpus restricted to the delivery: cross-delivery dups (doc
    3 repeats doc 1's phrase, doc 4 repeats doc 2's) and clean arrivals
    all land identically, so the frozen statistic is a drop-in for the
    full recount."""
    docs = _docs(
        spark,
        [
            (1, "p q r s t"),
            (2, "a b c d"),
            (3, "x p q r s y"),
            (4, "a b c d z"),
            (5, "m n o"),
        ],
    )
    stats = curation.ngram_window_counts(docs, n=3)
    arrivals = docs.filter(F.col("doc_id") >= 3)
    key = ("doc_id", "span_start", "span_end", "span_len", "span_text")
    inc = sorted(
        tuple(r[k] for k in key)
        for r in curation.dup_spans_apply(arrivals, stats, n=3, min_df=2).collect()
    )
    full = sorted(
        tuple(r[k] for k in key)
        for r in curation.dup_spans(docs, n=3, min_df=2)
        .filter(F.col("doc_id") >= 3)
        .collect()
    )
    assert inc == full
    assert {t[0] for t in inc} == {3, 4}  # doc 5 is clean


def test_source_overlap_planted(spark):
    rows = [
        (0, "x", "A"),
        (1, "y", "A"),
        (2, "z", "A"),
        (7, "X  ", "A"),  # same normalized content as doc 0 — no new fp
        (3, "x", "B"),
        (4, "y", "B"),
        (5, "w", "B"),
        (6, "q", "C"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["source_a"], r["source_b"]): r
        for r in curation.source_overlap(docs).collect()
    }
    assert set(got) == {("A", "B")}
    r = got[("A", "B")]
    assert r["n_shared"] == 2 and r["n_a"] == 3 and r["n_b"] == 3
    assert r["jaccard"] == pytest.approx(2 / 4)


# --------------------------------------------------------------------------
# domain mixture + deterministic global shuffle
# --------------------------------------------------------------------------


def _src_docs(spark):
    rows = [
        # src A: 3 docs x 4 tokens; src B: 1 doc x 8 tokens; src C: 1 doc x 2
        (0, "a b c d", "A"),
        (1, "e f g h", "A"),
        (2, "i j k l", "A"),
        (3, "m n o p q r s t", "B"),
        (4, "u v", "C"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_domain_mixture_temperature_one_is_natural(spark):
    docs = _src_docs(spark)
    m = {
        r["source"]: r
        for r in curation.domain_mixture(
            docs, token_budget=22_000, temperature=1.0
        ).collect()
    }
    assert m["A"]["n_tokens"] == 12 and m["B"]["n_tokens"] == 8 and m["C"]["n_tokens"] == 2
    for r in m.values():
        # T=1: weight reproduces the raw share (both via the 1e12 grid)
        assert r["weight"] == pytest.approx(r["raw_share"], abs=1e-9)
    # allocation is floor(budget * weight): within one budget-ulp of natural
    assert m["A"]["tokens_alloc"] == pytest.approx(12_000, abs=1)
    assert m["C"]["epochs"] == pytest.approx(m["C"]["tokens_alloc"] / 2, abs=1e-9)


def test_domain_mixture_temperature_boosts_tail(spark):
    docs = _src_docs(spark)
    m = {
        r["source"]: r
        for r in curation.domain_mixture(
            docs, token_budget=22_000, temperature=0.5
        ).collect()
    }
    # T<1 moves mass from the head (A) to the tail (C)
    assert m["A"]["weight"] < m["A"]["raw_share"]
    assert m["C"]["weight"] > m["C"]["raw_share"]
    # weights still sum to 1 (up to the integer grid)
    assert sum(r["weight"] for r in m.values()) == pytest.approx(1.0, abs=1e-9)
    # total allocation never exceeds the budget (floor per source)
    assert sum(r["tokens_alloc"] for r in m.values()) <= 22_000


def test_shuffle_shards_deterministic_and_dense(spark):
    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text")
    )
    out = curation.shuffle_shards(docs)
    rows = out.collect()
    assert len(rows) == 300 and {r["doc_id"] for r in rows} == set(range(300))
    assert all(0 <= r["shard"] <= 15 for r in rows)
    # dense 1-based positions per shard
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # pure function of ids: identical under any input partitioning
    again = curation.shuffle_shards(docs.repartition(17))
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_shuffle_shards_seed_changes_order(spark):
    docs = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    a = sorted(map(tuple, curation.shuffle_shards(docs, seed="0").collect()))
    b = sorted(map(tuple, curation.shuffle_shards(docs, seed="1").collect()))
    assert a != b  # a different seed re-deals the layout


def test_mixture_materialize_integer_epochs_exact(spark):
    # one source, T=1 → weight 1 → epochs = budget / corpus tokens exactly
    rows = [(i, "a b c d e", "A") for i in range(4)]  # 20 tokens
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curation.mixture_materialize(docs, token_budget=60, temperature=1.0)
    reps = {r["doc_id"]: r["rep"] for r in out.groupBy("doc_id").agg(
        F.count("*").alias("rep")).collect()}
    assert reps == {0: 3, 1: 3, 2: 3, 3: 3}  # epochs exactly 3.0, no draw
    # rep indices are dense 1..3 per doc → unique (doc_id, rep) keys
    assert out.distinct().count() == out.count() == 12


def test_mixture_materialize_fractional_draw_deterministic(spark):
    # epochs = 0.5 → each doc kept 0 or 1 times by the salted draw
    rows = [(i, "a b c d e", "A") for i in range(40)]  # 200 tokens
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curation.mixture_materialize(docs, token_budget=100, temperature=1.0)
    rows1 = sorted(map(tuple, out.collect()))
    assert all(t[2] == 1 for t in rows1)  # never more than one rep
    assert 0 < len(rows1) < 40  # the draw splits the corpus
    # partition-independent: identical under a different input layout
    again = curation.mixture_materialize(
        docs.repartition(7), token_budget=100, temperature=1.0
    )
    assert sorted(map(tuple, again.collect())) == rows1
    # precomputed-plan path short-circuits the counting pass, same result
    plan = curation.domain_mixture(docs, token_budget=100, temperature=1.0)
    viaplan = curation.mixture_materialize(
        docs, token_budget=0, temperature=0.0, plan=plan
    )
    assert sorted(map(tuple, viaplan.collect())) == rows1


def test_training_export_composes_curate_mix_layout(spark):
    # 20 quality-passing, mutually-distinct docs across 3 sources, plus
    # one exact dup, one quality reject, and one contaminated doc.
    def body(i):
        return ("the and of to is " + " ".join(f"w{i}q{j}" for j in range(12)) + " ") * 3

    rows = [(i, body(i), ["web", "wiki", "code"][i % 3]) for i in range(1, 21)]
    rows += [
        (21, body(1), "web"),  # exact dup of doc 1 -> dropped
        (22, "tiny", "web"),  # quality reject
        (23, ("zeta " * 40) + "the and of to is benchmark secret eval question answer span here now", "wiki"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    bench = _bench(spark, [(99, "benchmark secret eval question answer span here now")])

    export = curation.training_export(docs, bench, token_budget=2000).collect()
    curated = curation.curate_corpus(docs, bench)
    assert {r.doc_id for r in curated.collect()} == set(range(1, 21))

    # the (doc, source, rep) multiset IS the mixture over the curated corpus
    mix = curation.mixture_materialize(curated, token_budget=2000).collect()
    assert sorted((r.doc_id, r.source, r.rep) for r in export) == sorted(
        (r.doc_id, r.source, r.rep) for r in mix
    )
    assert len(export) > 20  # budget 2x corpus mass -> multi-epoch repeats

    # layout: global ids are a permutation of 0..N-1 in shard-major order
    assert sorted(r.global_id for r in export) == list(range(len(export)))
    by_global = sorted(export, key=lambda r: r.global_id)
    assert by_global == sorted(export, key=lambda r: (r.shard, r.pos))


def test_shuffle_global_ids_matches_global_sort(spark):
    docs = spark.range(0, 250).select(F.col("id").alias("doc_id"))
    out = curation.shuffle_global_ids(docs)
    rows = out.collect()
    # ids are a permutation of 0..N-1
    assert sorted(r["global_id"] for r in rows) == list(range(250))
    # equals the single global window it decomposes: shard-major+pos order
    by_global = sorted(rows, key=lambda r: r["global_id"])
    assert by_global == sorted(rows, key=lambda r: (r["shard"], r["pos"]))


def _idocs(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<"
        "kind:string,text:string,media_ref:string,offset:int>>",
    )


def test_decontaminate_spans_drops_only_contaminated_text(spark):
    leak = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    clean = "one two three four five six seven eight nine ten"
    docs = _idocs(
        spark,
        [
            (0, [("text", clean, "", 0), ("image", "", "img:0", 1),
                 ("text", f"prefix {leak} suffix", "", 2)]),
            (1, [("text", leak, "", 0)]),
            (2, [("text", clean, "", 0)]),
        ],
    )
    bench = spark.createDataFrame(
        [(9000, f"unrelated {leak} words")], "bench_id long, text string"
    )
    out = {
        r["doc_id"]: r["spans"]
        for r in curation.decontaminate_spans(docs, bench).collect()
    }
    # doc 0: contaminated text span at offset 2 dropped, media + clean kept in order
    assert [(s["kind"], s["offset"]) for s in out[0]] == [("text", 0), ("image", 1)]
    # doc 1: fully contaminated -> empty array (caller decides its fate)
    assert out[1] == []
    # doc 2: untouched
    assert [s["offset"] for s in out[2]] == [0]


def test_decontaminate_spans_min_hits_threshold(spark):
    leak = "alpha beta gamma delta epsilon zeta eta theta"  # exactly one 8-gram
    docs = _idocs(spark, [(0, [("text", leak, "", 0)])])
    bench = spark.createDataFrame([(9000, leak)], "bench_id long, text string")
    # one shared gram: dropped at min_hits=1, kept at min_hits=2
    assert curation.decontaminate_spans(docs, bench).collect()[0]["spans"] == []
    kept = curation.decontaminate_spans(docs, bench, min_hits=2).collect()
    assert [s["offset"] for s in kept[0]["spans"]] == [0]
