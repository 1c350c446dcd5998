"""Key-bloom manifest pruning: point lookups skip (bucket, epoch)
groups whose bloom rejects every probed key — correctness is a superset
guarantee (the exact filter re-applies), so the tests pin (a) identical
results with and without blooms, (b) real pruning across epochs, and
(c) bloom survival through compaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.sources import manifests as M


def _mk_table(spark, tmp_path, epochs=4, rows_per=50, bloom=True):
    """Each delivery holds a disjoint key range: delivery d owns
    [d*1000, d*1000+rows_per)."""
    out = str(tmp_path / "tbl")
    for d in range(epochs):
        df = spark.range(d * 1000, d * 1000 + rows_per).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        M.checkpointed_write(
            spark, df, out, n_buckets=4, input_snapshot=f"d{d}",
            key_col="k", bloom_key=bloom,
        )
    return out


def test_lookup_results_identical_with_and_without_bloom(spark, tmp_path):
    out = _mk_table(spark, tmp_path)
    keys = [5, 1010, 3049, 999_999]  # three present, one absent
    with_b = sorted(tuple(r) for r in M.lookup_read(spark, out, keys).collect())
    wout_b = sorted(
        tuple(r) for r in M.lookup_read(spark, out, keys, use_bloom=False).collect()
    )
    assert with_b == wout_b == [(5, 10), (1010, 2020), (3049, 6098)]


def test_bloom_prunes_foreign_epochs(spark, tmp_path):
    out = _mk_table(spark, tmp_path)
    # keys all from delivery 0 — the other three epochs' groups must drop
    plan = M.lookup_plan(spark, out, [1, 7, 23])
    nobloom = M.lookup_plan(spark, out, [1, 7, 23], use_bloom=False)
    assert plan["bloom_pruned"] > 0
    assert plan["kept_groups"] < nobloom["kept_groups"]
    # every kept path belongs to delivery 0's epoch set (keys exist only there)
    got = {r.k for r in M.lookup_read(spark, out, [1, 7, 23]).collect()}
    assert got == {1, 7, 23}


def test_absent_key_reads_nothing(spark, tmp_path):
    out = _mk_table(spark, tmp_path)
    plan = M.lookup_plan(spark, out, [555_555])
    # bucket pruning keeps ≤1 bucket's groups; bloom should kill ~all of
    # them (false positives possible but not all four)
    assert plan["kept_groups"] < plan["total_groups"]
    assert M.lookup_read(spark, out, [555_555]).count() == 0


def test_bloomless_table_never_prunes_by_bloom(spark, tmp_path):
    out = _mk_table(spark, tmp_path, bloom=False)
    plan = M.lookup_plan(spark, out, [5])
    assert plan["bloom_pruned"] == 0
    assert {r.k for r in M.lookup_read(spark, out, [5]).collect()} == {5}


def test_compaction_preserves_bloom_pruning(spark, tmp_path):
    out = _mk_table(spark, tmp_path)
    res = M.compact(spark, out, key_col="k", vacuum=True)
    assert res["new_epoch"] is not None
    # post-compaction: one epoch, per-(bucket, delivery) bloom rows remain
    plan = M.lookup_plan(spark, out, [1, 7, 23])
    assert plan["kept_groups"] >= 1
    got = sorted(r.k for r in M.lookup_read(spark, out, [1, 7, 23]).collect())
    assert got == [1, 7, 23]
    # absent keys still pruned via the compacted rows' blooms: a group
    # survives only if ANY of its delivery rows admits a key
    p2 = M.lookup_plan(spark, out, [777_777])
    assert p2["kept_groups"] <= p2["total_groups"]
    assert M.lookup_read(spark, out, [777_777]).count() == 0


def test_bloom_spec_roundtrip():
    bloom = '{"m":4096,"k":5,"bits":"' + "0" * 1024 + '"}'
    assert not M._bloom_may_contain(bloom, ["anything"])
    assert M._bloom_may_contain(None, ["anything"])
    assert M._bloom_may_contain("not json", ["anything"])
    all_ones = '{"m":4096,"k":5,"bits":"' + "f" * 1024 + '"}'
    assert M._bloom_may_contain(all_ones, ["anything"])


def test_bloom_matches_spark_positions(spark):
    """The driver's Python md5 positions equal the JVM expression's."""
    df = spark.createDataFrame([(123,), (456,)], "k bigint")
    rows = df.select(
        F.col("k").cast("string").alias("s"),
        M._bloom_positions_expr(F.col("k"), M._BLOOM_M, M._BLOOM_K).alias("pos"),
    ).collect()
    import hashlib

    for r in rows:
        py = [
            int(hashlib.md5(f"{h}:{r.s}".encode()).hexdigest()[:15], 16) % M._BLOOM_M
            for h in range(M._BLOOM_K)
        ]
        assert list(r.pos) == py
