"""ANN quality: the approximate paths must reach reasonable recall@k
against the brute-force baseline on the same data, and stay deterministic."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ocr_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _topk_sets(df):
    rows = df.collect()
    out: dict[int, set] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_recall_vs_brute(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = _topk_sets(similarity.brute_force_topk(emb, queries, k=5))
    approx = _topk_sets(similarity.ivf_topk(emb, queries, k=5, n_lists=16, nprobe=4))
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    recall = hits / total
    assert recall >= 0.5, f"IVF recall@5 too low: {recall:.2f}"


def test_ivf_deterministic(spark, emb):
    queries = emb.filter(F.col("vec_id") < 5)
    a = similarity.ivf_topk(emb, queries, k=5).collect()
    b = similarity.ivf_topk(emb, queries, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ivf_every_query_answered(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20)
    out = similarity.ivf_topk(emb, queries, k=5, n_lists=16, nprobe=4)
    per_q = out.groupBy("query_id").count().collect()
    assert len(per_q) == 20
    assert all(r["count"] == 5 for r in per_q)


def test_lsh_recall_vs_brute(spark, emb):
    """Round-1 hole: single-band LSH returned >50% empty slots with no
    quality gate.  Multi-band + multiprobe must reach recall@5 ≥ 0.6 on
    the near-orthogonal synthetic embeddings (measured 0.84 at defaults)."""
    queries = emb.filter(F.col("vec_id") < 20)
    exact = _topk_sets(similarity.brute_force_topk(emb, queries, k=5))
    approx = _topk_sets(similarity.lsh_topk(emb, queries, dim=64, k=5))
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    recall = hits / total
    assert recall >= 0.6, f"LSH recall@5 too low: {recall:.2f}"


def test_lsh_every_query_answered(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20)
    out = similarity.lsh_topk(emb, queries, dim=64, k=5)
    per_q = out.groupBy("query_id").count().collect()
    assert len(per_q) == 20
    assert all(r["count"] == 5 for r in per_q)


def test_lsh_deterministic(spark, emb):
    queries = emb.filter(F.col("vec_id") < 5)
    a = similarity.lsh_topk(emb, queries, dim=64, k=5).collect()
    b = similarity.lsh_topk(emb, queries, dim=64, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
