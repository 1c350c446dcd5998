"""Connected-components dedup clustering (dedup_clusters / near_dup_keep_one)."""

from __future__ import annotations

import pytest

from ocr_spark.operators import dedup


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a bigint, doc_b bigint")


def test_transitive_chain_merges(spark):
    # a~b, b~c, plus an isolated pair and a disconnected long chain
    pairs = _pairs(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)])
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.dedup_clusters(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20), (23, 20),
    }


def test_star_and_reversed_edges(spark):
    # hub-and-spoke plus duplicate/reversed edges must not break labels
    pairs = _pairs(spark, [(5, 1), (5, 2), (5, 3), (3, 5), (2, 1)])
    got = dict(
        (r["doc_id"], r["cluster_id"])
        for r in dedup.dedup_clusters(pairs).collect()
    )
    assert got == {1: 1, 2: 1, 3: 1, 5: 1}


def test_keep_one_survivors(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id bigint, text string"
    )
    pairs = _pairs(spark, [(1, 2), (2, 3), (5, 6)])
    kept = sorted(
        r["doc_id"] for r in dedup.near_dup_keep_one(docs, pairs).collect()
    )
    # losers 2,3 (cluster 1) and 6 (cluster 5); everyone else untouched
    assert kept == [0, 1, 4, 5, 7]


def test_non_convergence_raises(spark):
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    with pytest.raises(RuntimeError, match="converge"):
        dedup.dedup_clusters(pairs, max_iters=0, driver_max_edges=0)


def test_driver_and_distributed_paths_agree(spark):
    # deterministic random-ish graph: chains, stars, isolated pairs
    rows = [(i, i + 1) for i in range(0, 40, 2)]
    rows += [(i, i + 2) for i in range(0, 20, 4)]
    rows += [(100, x) for x in (101, 102, 103)]
    pairs = _pairs(spark, rows)
    fast = sorted(
        map(tuple, dedup.dedup_clusters(pairs).collect())
    )
    dist = sorted(
        map(tuple, dedup.dedup_clusters(pairs, driver_max_edges=0).collect())
    )
    assert fast == dist and len(fast) > 0
