"""BM25 search scoring: exact-value check against an independent scalar
implementation of the Lucene-form formula, plus ranking sanity."""

from __future__ import annotations

import math

from ocr_spark.operators import search


def _bm25_ref(corpus: dict[int, str], terms: list[str], k1=1.2, b=0.75):
    toks = {d: t.lower().split() for d, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {t: sum(1 for w in toks.values() if t in w) for t in terms}
    out = {}
    for d, words in toks.items():
        s, hits = 0.0, 0
        for t in terms:
            tf = words.count(t)
            if not tf:
                continue
            hits += 1
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(words) / avgdl))
        if hits:
            out[d] = (hits, s)
    return out


def test_bm25_matches_scalar_reference(spark):
    corpus = {
        1: "spark shuffle join broadcast shuffle",
        2: "spark spark spark scan",
        3: "window sort merge agg",
        4: "broadcast broadcast join",
        5: "shuffle",
    }
    terms = ["shuffle", "broadcast", "spark"]
    docs = spark.createDataFrame(
        [(d, t) for d, t in corpus.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_terms_hit"], r["score"])
        for r in search.bm25_scores(docs, terms).collect()
    }
    want = _bm25_ref(corpus, terms)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert abs(got[d][1] - want[d][1]) < 1e-9
    # doc 3 has no query term -> absent
    assert 3 not in got
    # topk ordering honors score desc
    top = [r["doc_id"] for r in search.bm25_topk(docs, terms, k=2).collect()]
    ranked = sorted(want, key=lambda d: (-want[d][1], d))[:2]
    assert top == ranked


def test_rrf_fuse_matches_scalar_reference(spark):
    """RRF fusion vs a hand-computed reference: overlap docs sum both
    reciprocal ranks, list-exclusive docs contribute one, ties break by
    id ascending."""
    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    sem = spark.createDataFrame(
        [(20, 1), (40, 2), (10, 3)], "doc_id long, rank int"
    )
    got = {
        r["doc_id"]: (r["rrf_score"], r["rank"])
        for r in search.rrf_fuse([lex, sem], k=60, topn=4).collect()
    }
    want_score = {
        10: 1 / 61 + 1 / 63,
        20: 1 / 62 + 1 / 61,
        30: 1 / 63,
        40: 1 / 62,
    }
    assert set(got) == set(want_score)
    for d, s in want_score.items():
        assert abs(got[d][0] - s) < 1e-12
    # fused order: 20 (two high ranks) > 10 > 40 (rank2 single) > 30
    order = sorted(got, key=lambda d: got[d][1])
    assert order == [20, 10, 40, 30]
    # topn truncates after fusion, not before
    top2 = search.rrf_fuse([lex, sem], k=60, topn=2).collect()
    assert [r["doc_id"] for r in sorted(top2, key=lambda r: r["rank"])] == [20, 10]


def test_incremental_exact_dedup_fp_table_path(spark):
    """The precomputed-fingerprint-table form must equal the
    recompute-from-text form (the production ingest shape)."""
    from pyspark.sql import functions as F

    from ocr_spark.operators import dedup
    from ocr_spark.operators.textstats import fingerprint

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old = docs.filter(F.col("doc_id") < 400)
    new = docs.filter(F.col("doc_id") >= 400)
    a = sorted(
        r["doc_id"] for r in dedup.incremental_exact_dedup(new, old).collect()
    )
    fp_table = old.select(fingerprint(F.col("text")).alias("fp"))
    b = sorted(
        r["doc_id"] for r in dedup.incremental_exact_dedup(new, fp_table).collect()
    )
    assert a == b and len(a) > 0


def test_hashed_tfidf_is_unit_norm_and_dense_roundtrips(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [("a", "the cat sat on the mat"), ("b", "the dog ran fast"), ("c", "cat dog")],
        "doc_id string, text string",
    )
    sp = search.hashed_tfidf(docs, dim=32)
    # L2 norm is 1 per doc
    norms = {
        r["doc_id"]: r["n"]
        for r in sp.groupBy("doc_id")
        .agg(F.sum(F.col("weight") * F.col("weight")).alias("n"))
        .collect()
    }
    assert set(norms) == {"a", "b", "c"}
    assert all(abs(n - 1.0) < 1e-9 for n in norms.values())
    # buckets live in [0, dim)
    mm = sp.agg(F.min("bucket"), F.max("bucket")).collect()[0]
    assert mm[0] >= 0 and mm[1] < 32

    # dense scatter reproduces exactly the sparse entries, zeros elsewhere
    want = {
        (r["doc_id"], r["bucket"]): r["weight"] for r in sp.collect()
    }
    dense = search.dense_from_sparse(sp, 32)
    got = {r["doc_id"]: r["embedding"] for r in dense.collect()}
    assert set(got) == {"a", "b", "c"}
    for doc, vec in got.items():
        assert len(vec) == 32
        for i, v in enumerate(vec):
            assert abs(v - want.get((doc, i), 0.0)) < 1e-12


def test_hashed_tfidf_same_term_same_bucket_across_docs(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [("a", "zebra"), ("b", "zebra")], "doc_id string, text string"
    )
    sp = search.hashed_tfidf(docs, dim=64, l2_normalize=False)
    rows = sp.collect()
    assert len(rows) == 2
    assert rows[0]["bucket"] == rows[1]["bucket"]          # hashing is global
    assert abs(rows[0]["weight"] - rows[1]["weight"]) < 1e-12


def test_hashed_tfidf_dense_feeds_the_ann_family(spark):
    from pyspark.sql import functions as F

    from ocr_spark.operators import similarity

    docs = spark.createDataFrame(
        [
            ("a", "machine learning models train on large data"),
            ("b", "machine learning models train on large data quickly"),
            ("c", "completely unrelated cooking recipe with soup and onions"),
        ],
        "doc_id string, text string",
    )
    dense = search.dense_from_sparse(search.hashed_tfidf(docs, dim=64), 64).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    top = similarity.brute_force_topk(
        dense, dense.filter(F.col("vec_id") == "a"), k=2
    ).collect()
    # near-duplicate text is the nearest neighbor, by a wide margin
    assert top[0]["neighbor_id"] == "b" and top[0]["sim"] > 0.9
    assert top[1]["neighbor_id"] == "c" and top[1]["sim"] < 0.3


def test_hashed_tfidf_apply_equals_batch_on_same_corpus(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [("a", "the cat sat on the mat"), ("b", "the dog ran fast"), ("c", "cat dog soup")],
        "doc_id string, text string",
    )
    stats = search.doc_freq_stats(docs)
    rows = {r["tok"]: r["cnt"] for r in stats.collect()}
    assert rows[""] == 3                      # sentinel = doc count
    assert rows["the"] == 2 and rows["cat"] == 2 and rows["soup"] == 1
    want = {
        (r["doc_id"], r["bucket"]): r["weight"]
        for r in search.hashed_tfidf(docs, dim=32).collect()
    }
    got = {
        (r["doc_id"], r["bucket"]): r["weight"]
        for r in search.hashed_tfidf_apply(docs, stats, dim=32).collect()
    }
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) < 1e-12 for k in want)


def test_hashed_tfidf_apply_unseen_terms_get_max_idf(spark):
    import math

    from pyspark.sql import functions as F

    corpus = spark.createDataFrame(
        [("a", "alpha beta"), ("b", "alpha gamma")], "doc_id string, text string"
    )
    stats = search.doc_freq_stats(corpus)
    new = spark.createDataFrame([("n", "zzz")], "doc_id string, text string")
    got = search.hashed_tfidf_apply(new, stats, dim=16, l2_normalize=False).collect()
    assert len(got) == 1
    # unseen term: df=0 -> idf = ln((1+2)/1) + 1
    assert abs(got[0]["weight"] - (math.log(3) + 1.0)) < 1e-12
