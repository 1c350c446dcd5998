"""SemDeDup clustered embedding dedup: precision is structural (every
emitted pair is re-checked ≥ τ by construction), so the tests pin the
approximation's RECALL vs the brute-force pair set, monotonicity in
nprobe, and the keep-one survivor contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.similarity import (
    cosine,
    semantic_dup_pairs,
    semantic_keep_one,
)

SF_DIR = "/root/testdata/sf0.001"
THR = 0.35


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def brute_pairs(emb):
    a = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    pairs = (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("sim", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= THR)
    )
    return {(r.a, r.b) for r in pairs.select("a", "b").collect()}


def test_pairs_are_true_positives_and_recall(emb, brute_pairs):
    got = {
        (r.a, r.b)
        for r in semantic_dup_pairs(emb, THR, n_lists=8, nprobe=2).collect()
    }
    assert got <= brute_pairs  # precision 1.0: every pair re-verified
    assert len(got) / len(brute_pairs) >= 0.6  # measured 0.74 on fixture


def test_nprobe_monotone_recall(emb):
    p1 = {(r.a, r.b) for r in semantic_dup_pairs(emb, THR, 8, nprobe=1).collect()}
    p3 = {(r.a, r.b) for r in semantic_dup_pairs(emb, THR, 8, nprobe=3).collect()}
    assert p1 <= p3
    assert len(p3) > len(p1)


def test_pairs_unique_and_ordered(emb):
    rows = semantic_dup_pairs(emb, THR, 8, nprobe=2).collect()
    keys = [(r.a, r.b) for r in rows]
    assert len(keys) == len(set(keys))  # multi-probe dedup collapsed
    assert all(r.a < r.b for r in rows)
    assert all(r.sim >= THR for r in rows)


def test_keep_one_survivor_contract(emb):
    pairs = semantic_dup_pairs(emb, THR, 8, nprobe=2)
    kept = {r.vec_id for r in semantic_keep_one(emb, THR, 8, nprobe=2).collect()}
    all_ids = {r.vec_id for r in emb.select("vec_id").collect()}
    assert kept <= all_ids
    # union-find over the pairs: exactly the min id of each component
    # survives; isolated ids all survive
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs.collect():
        ra, rb = find(r.a), find(r.b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    dropped = {x for x in parent if find(x) != x}
    assert kept == all_ids - dropped
