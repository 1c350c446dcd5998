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


def test_ivf_index_as_table_matches_inline(spark, emb, tmp_path):
    """The materialized index (centroids + partitionBy(list_id) lists)
    must return exactly the inline ivf_topk results, and the probe scan
    must partition-prune to the probed list_ids."""
    idx = str(tmp_path / "ivf_index")
    similarity.build_ivf_index(emb, idx, n_lists=16)
    queries = emb.filter(F.col("vec_id") < 10)
    inline = sorted(map(tuple, similarity.ivf_topk(emb, queries, k=5, n_lists=16, nprobe=4).collect()))
    indexed_df = similarity.ivf_topk_indexed(spark, idx, queries, k=5, nprobe=4)
    indexed = sorted(map(tuple, indexed_df.collect()))
    assert indexed == inline
    # partition pruning reaches the lists scan
    plan = indexed_df._sc._jvm.PythonSQLUtils.explainString(
        indexed_df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [" in plan and "list_id" in plan.split("PartitionFilters:")[1][:200], plan


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
