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


def test_grouped_kmv_merge_property(spark):
    """sketch(A ∪ B) == re-take-k-smallest(sketch(A) ∪ sketch(B)) per
    group — the property that lets per-partition sketches combine
    without touching raw data again."""
    vals = spark.range(0, 2000).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("g"),
        F.concat(F.lit("v"), (F.col("id") % 700).cast("string")).alias("v"),
    )
    k = 64
    whole = sketch.kmv_sketch_by_group(vals, "v", "g", k=k)
    ska = sketch.kmv_sketch_by_group(vals.filter(F.col("id") < 1000), "v", "g", k=k)
    skb = sketch.kmv_sketch_by_group(vals.filter(F.col("id") >= 1000), "v", "g", k=k)
    from pyspark.sql import Window

    merged = (
        ska.unionByName(skb)
        .select("g", "h", "u")
        .distinct()
        .withColumn(
            "rank",
            F.row_number().over(Window.partitionBy("g").orderBy("u", "h")),
        )
        .filter(F.col("rank") <= k)
    )
    lhs = sorted(map(tuple, whole.select("g", "rank", "h").collect()))
    rhs = sorted(map(tuple, merged.select("g", "rank", "h").collect()))
    assert lhs == rhs
    # grouped estimates are exact below k and within 15 % above it
    est = {r["g"]: r for r in sketch.kmv_estimate_by_group(vals, "v", "g", k=k).collect()}
    exact = {
        r["g"]: r["n"]
        for r in vals.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    for g, n in exact.items():
        e = est[g]["est_distinct"]
        assert (e == n) if n < k else abs(e - n) / n < 0.15
