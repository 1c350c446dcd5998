"""Semantics tests for the KMV cardinality sketch and the token-budget
sampler. Engine-vs-oracle equality of the catalog forms is covered by
test_queries_oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators import curation, sketch


def test_kmv_exact_below_k(spark):
    vals = spark.range(100).select(F.concat(F.lit("v"), F.col("id")).alias("v"))
    row = sketch.kmv_estimate(vals, "v", k=256).collect()[0]
    assert row["k_used"] == 100
    assert row["est_distinct"] == 100.0


def test_kmv_estimate_accuracy(spark):
    n = 20000
    vals = spark.range(n * 3).select((F.col("id") % n).cast("string").alias("v"))
    row = sketch.kmv_estimate(vals, "v", k=256).collect()[0]
    assert row["k_used"] == 256
    # k=256 -> relative std error ~ 1/sqrt(k-2) ~ 6%; allow 4 sigma
    assert abs(row["est_distinct"] - n) / n < 0.25


def test_kmv_partitioning_invariant(spark):
    vals = spark.range(5000).select(F.col("id").cast("string").alias("v"))
    a = sketch.kmv_sketch(vals, "v", k=64).collect()
    b = sketch.kmv_sketch(vals.repartition(17), "v", k=64).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_token_budget_sample_greedy_prefix(spark):
    rows = [
        (i, "en" if i % 2 == 0 else "fr", " ".join(["w"] * (5 + i % 7)))
        for i in range(200)
    ]
    docs = _docs(spark, rows)
    out = curation.token_budget_sample(docs, {"en": 100, "fr": 40}, default_budget=0)
    got = out.collect()
    by_lang: dict[str, int] = {}
    for r in got:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + r["n_tok"]
    # budget filled: total >= budget (greedy overshoot allowed only by
    # part of the LAST doc, so total - max_single < budget)
    for lang, budget in (("en", 100), ("fr", 40)):
        kept = [r["n_tok"] for r in got if r["lang"] == lang]
        assert sum(kept) >= budget
        assert sum(kept) - max(kept) < budget


def test_token_budget_sample_deterministic(spark):
    rows = [(i, "en", " ".join(["w"] * (1 + i % 11))) for i in range(300)]
    docs = _docs(spark, rows)
    a = curation.token_budget_sample(docs, {"en": 500})
    b = curation.token_budget_sample(docs.repartition(13), {"en": 500})
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
