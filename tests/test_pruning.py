"""Zone-map scan pruning on the manifest sink.

Invariants:
* pruned_read(predicates) + the real filter == read_committed + the same
  filter (zone maps are a superset guarantee, never a row-changer);
* disjoint-range deliveries ARE pruned (kept_groups < total_groups);
* compaction preserves pruning power (per-(bucket, delivery) stats rows
  inside the compacted epoch);
* tables without stats, and predicates on untracked columns, keep
  everything (conservative default).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.sources import manifests as mf


def _delivery(spark, lo: int, n: int, day: str):
    return spark.range(lo, lo + n).select(
        F.format_string("d%05d", F.col("id")).alias("doc_id"),
        F.col("id").cast("long").alias("v"),
        F.to_timestamp(F.lit(day)).alias("ts"),
        F.lit("payload").alias("text"),
    )


def _write_two_deliveries(spark, out, stats_cols):
    mf.checkpointed_write(
        spark,
        _delivery(spark, 0, 100, "2024-01-05"),
        out,
        n_buckets=4,
        input_snapshot="s1",
        stats_cols=stats_cols,
    )
    mf.checkpointed_write(
        spark,
        _delivery(spark, 1000, 100, "2024-03-05"),
        out,
        n_buckets=4,
        input_snapshot="s2",
        stats_cols=stats_cols,
    )


def _rows(df):
    return sorted(tuple(r) for r in df.select("doc_id", "v").collect())


def test_numeric_pruning_skips_disjoint_delivery(spark, tmp_path):
    out = str(tmp_path / "t")
    _write_two_deliveries(spark, out, stats_cols=["v", "ts"])

    plan = mf.prune_plan(spark, out, [("v", ">=", 500)])
    assert plan["total_groups"] == 8  # 4 buckets x 2 epochs
    assert plan["kept_groups"] == 4  # the s1 epoch is provably out of range

    got = mf.pruned_read(spark, out, [("v", ">=", 500)]).filter(F.col("v") >= 500)
    want = mf.read_committed(spark, out).filter(F.col("v") >= 500)
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) == 100


def test_timestamp_and_between_and_eq(spark, tmp_path):
    out = str(tmp_path / "t")
    _write_two_deliveries(spark, out, stats_cols=["v", "ts"])

    # timestamp stats serialize as ISO strings; a date-prefix predicate
    # compares as an instant
    plan = mf.prune_plan(spark, out, [("ts", ">=", "2024-02-01")])
    assert plan["kept_groups"] == 4
    got = mf.pruned_read(spark, out, [("ts", ">=", "2024-02-01")]).filter(
        F.col("ts") >= F.to_timestamp(F.lit("2024-02-01"))
    )
    assert len(_rows(got)) == 100

    plan = mf.prune_plan(spark, out, [("v", "between", (40, 60))])
    assert plan["kept_groups"] == 4
    got = mf.pruned_read(spark, out, [("v", "between", (40, 60))]).filter(
        F.col("v").between(40, 60)
    )
    assert len(_rows(got)) == 21

    # '=' outside every range prunes everything; the empty read still
    # carries the table schema
    plan = mf.prune_plan(spark, out, [("v", "=", 500)])
    assert plan["kept_groups"] == 0
    empty = mf.pruned_read(spark, out, [("v", "=", 500)])
    assert empty.count() == 0
    assert "doc_id" in empty.columns and "v" in empty.columns


def test_conjunction_prunes_more(spark, tmp_path):
    out = str(tmp_path / "t")
    _write_two_deliveries(spark, out, stats_cols=["v", "ts"])
    # each predicate alone keeps one epoch; together they keep none
    plan = mf.prune_plan(spark, out, [("v", ">=", 500), ("ts", "<", "2024-02-01")])
    assert plan["kept_groups"] == 0


def test_compaction_preserves_pruning(spark, tmp_path):
    out = str(tmp_path / "t")
    _write_two_deliveries(spark, out, stats_cols=["v", "ts"])
    res = mf.compact(spark, out, key_col="doc_id")
    assert res["epochs_compacted"] == 2

    # the compacted dir holds both deliveries -> it survives a predicate
    # matching either one (any-delivery-may-match rule) ...
    plan = mf.prune_plan(spark, out, [("v", ">=", 500)])
    assert plan["total_groups"] == 4  # one compacted epoch x 4 buckets
    assert plan["kept_groups"] == 4
    got = mf.pruned_read(spark, out, [("v", ">=", 500)]).filter(F.col("v") >= 500)
    assert len(_rows(got)) == 100

    # ... but slicing to one delivery prunes on THAT delivery's stats
    plan = mf.prune_plan(spark, out, [("v", ">=", 500)], input_snapshot="s1")
    assert plan["kept_groups"] == 0
    got = mf.pruned_read(spark, out, [("v", ">=", 500)], input_snapshot="s1")
    assert got.count() == 0
    plan = mf.prune_plan(spark, out, [("v", "<=", 50)], input_snapshot="s1")
    assert plan["kept_groups"] == 4


def test_no_stats_or_untracked_column_keeps_everything(spark, tmp_path):
    out = str(tmp_path / "t")
    _write_two_deliveries(spark, out, stats_cols=None)
    plan = mf.prune_plan(spark, out, [("v", ">=", 500)])
    assert plan["kept_groups"] == plan["total_groups"] == 8

    out2 = str(tmp_path / "t2")
    _write_two_deliveries(spark, out2, stats_cols=["v"])
    # 'text' has no zone map -> its predicate cannot prune
    plan = mf.prune_plan(spark, out2, [("text", "=", "zzz")])
    assert plan["kept_groups"] == 8
    # mixed: the tracked column still prunes inside a conjunction
    plan = mf.prune_plan(spark, out2, [("text", "=", "zzz"), ("v", "<", 0)])
    assert plan["kept_groups"] == 0


def test_all_null_group_pruned(spark, tmp_path):
    out = str(tmp_path / "t")
    nulls = spark.range(0, 50).select(
        F.format_string("d%05d", F.col("id")).alias("doc_id"),
        F.lit(None).cast("long").alias("v"),
    )
    mf.checkpointed_write(
        spark, nulls, out, n_buckets=2, input_snapshot="s1", stats_cols=["v"]
    )
    # a comparison predicate can never match an all-NULL column
    plan = mf.prune_plan(spark, out, [("v", ">=", 0)])
    assert plan["kept_groups"] == 0


def test_crashed_epoch_invisible_to_prune_plan(spark, tmp_path):
    """prune_plan derives paths from the ACTIVE manifests only — data
    files from an epoch whose manifest never landed (crash between data
    append and manifest write) are not listed, matching read_committed
    semantics."""
    import shutil

    out = str(tmp_path / "t")
    _write_two_deliveries(spark, out, stats_cols=["v"])
    # simulate a crashed attempt: copy an epoch dir under a fresh epoch
    # name with no manifest row
    import glob as g

    src = g.glob(f"{out}/data/bucket=0/epoch=*")[0]
    shutil.copytree(src, f"{out}/data/bucket=0/epoch=deadbeefdeadbeef")
    plan = mf.prune_plan(spark, out, [("v", ">=", 0)])
    assert plan["kept_groups"] == 8  # not 9: the orphan dir is invisible
    assert not any("deadbeef" in p for p in plan["paths"])
    got = mf.pruned_read(spark, out, [("v", ">=", 0)])
    assert got.count() == 200  # orphan rows not double-read


def test_lookup_read_points(spark, tmp_path):
    """Point lookups read only the keys' hash buckets and return exactly
    the committed rows for those keys — with the writer's key TYPE
    honored (xxhash64 is type-sensitive)."""
    out = str(tmp_path / "t")
    _write_two_deliveries(spark, out, stats_cols=None)  # doc_id is string
    meta = mf.read_table_meta(out)
    assert meta["n_buckets"] == 4 and meta["key_col"] == "doc_id"
    assert meta["key_type"] == "string"

    got = mf.lookup_read(spark, out, ["d00007", "d01050", "nope"])
    rows = {r["doc_id"]: r["v"] for r in got.collect()}
    assert rows == {"d00007": 7, "d01050": 1050}

    # long-keyed table: same lookup path, different hash domain
    out2 = str(tmp_path / "t2")
    longs = spark.range(0, 50).select(
        F.col("id").alias("doc_id"), (F.col("id") * 10).alias("v")
    )
    mf.checkpointed_write(spark, longs, out2, n_buckets=8, input_snapshot="s1")
    assert mf.read_table_meta(out2)["key_type"] == "bigint"
    got2 = {r["doc_id"]: r["v"] for r in mf.lookup_read(spark, out2, [3, 41]).collect()}
    assert got2 == {3: 30, 41: 410}

    # empty key list and missing keys degrade to empty, schema intact
    assert mf.lookup_read(spark, out2, []).count() == 0
    assert mf.lookup_read(spark, out2, [999]).count() == 0


def _interleaved_deliveries(spark, out, n=1000, n_buckets=4):
    """Two deliveries whose tracked column v BOTH span the full domain
    (evens / odds) — epoch-level zone maps are powerless against range
    predicates here, the shape hash-bucketed tables always have."""
    base = spark.range(0, n // 2)
    for snap, off in (("s1", 0), ("s2", 1)):
        d = base.select(
            F.format_string("d%05d", F.col("id") * 2 + off).alias("doc_id"),
            (F.col("id") * 2 + off).alias("v"),
            F.lit("payload").alias("text"),
        )
        mf.checkpointed_write(
            spark, d, out, n_buckets=n_buckets, input_snapshot=snap,
            stats_cols=["v"], bloom_key=True,
        )


def test_clustered_compaction_prunes_files(spark, tmp_path):
    out = str(tmp_path / "t")
    _interleaved_deliveries(spark, out)
    pred = [("v", "between", (100, 140))]

    # before clustering: every (bucket, epoch) group may match
    plan0 = mf.prune_plan(spark, out, pred)
    assert plan0["kept_groups"] == plan0["total_groups"] == 8
    assert plan0["total_files"] == 0  # no sidecar anywhere

    res = mf.compact(
        spark, out, key_col="doc_id", cluster_by="v", max_file_rows=50,
        stats_cols=["v"],
    )
    assert res["epochs_compacted"] == 2

    plan = mf.prune_plan(spark, out, pred)
    # 4 buckets x ~5 rolled files each, near-disjoint v ranges: a 41-unit
    # window keeps at most ~2 files per bucket
    assert plan["total_files"] >= 12
    assert 0 < plan["kept_files"] <= plan["total_files"] // 2
    assert len(plan["paths"]) == plan["kept_files"]

    got = mf.pruned_read(spark, out, pred).filter(F.col("v").between(100, 140))
    want = mf.read_committed(spark, out).filter(F.col("v").between(100, 140))
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) == 41

    # point lookups still work on the clustered rewrite (blooms rebuilt)
    rows = {r["doc_id"]: r["v"] for r in mf.lookup_read(spark, out, ["d00007"]).collect()}
    assert rows == {"d00007": 7}


def test_clustered_prune_can_drop_every_file_in_a_kept_bucket(spark, tmp_path):
    out = str(tmp_path / "t")
    _interleaved_deliveries(spark, out)
    mf.compact(spark, out, cluster_by="v", max_file_rows=50, stats_cols=["v"])
    # '=' on one value: file-level stats keep ~1 file per bucket at most;
    # correctness is unchanged
    plan = mf.prune_plan(spark, out, [("v", "=", 250)])
    assert plan["kept_files"] <= 4 <= plan["total_files"]
    got = mf.pruned_read(spark, out, [("v", "=", 250)]).filter(F.col("v") == 250)
    assert len(_rows(got)) == 1
    # out-of-domain '=': zero files, empty read, schema intact
    plan = mf.prune_plan(spark, out, [("v", "=", 10_000)])
    assert plan["kept_files"] == 0
    empty = mf.pruned_read(spark, out, [("v", "=", 10_000)])
    assert empty.count() == 0 and "doc_id" in empty.columns


def test_missing_sidecar_degrades_to_directory_pruning(spark, tmp_path):
    import os

    out = str(tmp_path / "t")
    _interleaved_deliveries(spark, out)
    res = mf.compact(spark, out, cluster_by="v", max_file_rows=50, stats_cols=["v"])
    os.remove(os.path.join(out, "filestats", f"epoch={res['new_epoch']}.json"))
    plan = mf.prune_plan(spark, out, [("v", "between", (100, 140))])
    assert plan["total_files"] == 0  # sidecar gone → dir-level only
    assert plan["kept_groups"] == 4
    got = mf.pruned_read(spark, out, [("v", "between", (100, 140))]).filter(
        F.col("v").between(100, 140)
    )
    assert len(_rows(got)) == 41


def test_meta_spec_drift_raises(spark, tmp_path):
    out = str(tmp_path / "t")
    _write_two_deliveries(spark, out, stats_cols=None)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="spec drift"):
        mf.checkpointed_write(
            spark,
            _delivery(spark, 0, 10, "2024-01-05"),
            out,
            n_buckets=16,  # different modulus -> existing readers would miss rows
            input_snapshot="s3",
        )


def _two_col_deliveries(spark, out, n=1000, n_buckets=4):
    """Like _interleaved_deliveries, plus a second tracked column w =
    (v*541) mod n — a bijection whose ORDER is uncorrelated with v's, so
    lexicographic clustering on (v, w) localizes only v: within any
    v-sorted run, the w values scatter across the whole domain."""
    base = spark.range(0, n // 2)
    for snap, off in (("s1", 0), ("s2", 1)):
        d = (
            base.select(
                F.format_string("d%05d", F.col("id") * 2 + off).alias("doc_id"),
                (F.col("id") * 2 + off).alias("v"),
            )
            .withColumn("w", (F.col("v") * 541) % n)
            .withColumn("text", F.lit("payload"))
        )
        mf.checkpointed_write(
            spark, d, out, n_buckets=n_buckets, input_snapshot=snap,
            stats_cols=["v", "w"],
        )


def test_zorder_compaction_prunes_every_cluster_column(spark, tmp_path):
    out_z, out_lex = str(tmp_path / "z"), str(tmp_path / "lex")
    for out in (out_z, out_lex):
        _two_col_deliveries(spark, out)
    mf.compact(
        spark, out_z, key_col="doc_id", cluster_by=["v", "w"], zorder=True,
        max_file_rows=25,
    )
    mf.compact(
        spark, out_lex, key_col="doc_id", cluster_by=["v", "w"],
        max_file_rows=25,
    )

    # lexicographic: w is the SECOND sort key, so every rolled file's
    # w-range spans ~the whole domain — file-level zone maps keep
    # (almost) everything on a w predicate
    pred_w = [("w", "between", (100, 140))]
    plan_lex = mf.prune_plan(spark, out_lex, pred_w)
    assert plan_lex["total_files"] >= 30
    assert plan_lex["kept_files"] >= int(plan_lex["total_files"] * 0.9)

    # z-order: per-file w ranges are tight → real pruning on w...
    plan_zw = mf.prune_plan(spark, out_z, pred_w)
    assert plan_zw["total_files"] >= 30
    assert plan_zw["kept_files"] <= int(plan_zw["total_files"] * 0.7)
    assert plan_zw["kept_files"] < plan_lex["kept_files"]
    # ...and v still prunes too (the z tradeoff costs some v-locality,
    # never all of it)
    pred_v = [("v", "between", (100, 140))]
    plan_zv = mf.prune_plan(spark, out_z, pred_v)
    assert plan_zv["kept_files"] <= int(plan_zv["total_files"] * 0.7)

    # superset guarantee on both columns: pruned + filter == full + filter
    for pred, col in ((pred_w, "w"), (pred_v, "v")):
        got = mf.pruned_read(spark, out_z, pred).filter(F.col(col).between(100, 140))
        want = mf.read_committed(spark, out_z).filter(F.col(col).between(100, 140))
        assert sorted(r["doc_id"] for r in got.collect()) == sorted(
            r["doc_id"] for r in want.collect()
        )
        assert got.count() == 41

    # the sort key is internal — it never lands in the table
    assert "_zkey" not in mf.read_committed(spark, out_z).columns


def test_zorder_rejects_string_cluster_column(spark, tmp_path):
    import pytest as _pytest

    out = str(tmp_path / "t")
    _two_col_deliveries(spark, out, n=100)
    with _pytest.raises(ValueError, match="rank-orderable"):
        mf.compact(spark, out, cluster_by=["doc_id", "v"], zorder=True)


def test_zorder_degenerate_columns_degrade_gracefully(spark, tmp_path):
    """Constant and all-null z columns contribute no bits (tied/absent
    quantile boundaries dedupe away) — the compaction still commits and
    the surviving column still prunes."""
    out = str(tmp_path / "t")
    base = spark.range(0, 500)
    for snap, off in (("s1", 0), ("s2", 1)):
        d = base.select(
            F.format_string("d%05d", F.col("id") * 2 + off).alias("doc_id"),
            (F.col("id") * 2 + off).alias("v"),
            F.lit(7).alias("const"),
            F.lit(None).cast("double").alias("allnull"),
            F.lit("payload").alias("text"),
        )
        mf.checkpointed_write(
            spark, d, out, n_buckets=2, input_snapshot=snap, stats_cols=["v"]
        )
    res = mf.compact(
        spark, out, key_col="doc_id", cluster_by=["const", "allnull", "v"],
        zorder=True, max_file_rows=50,
    )
    assert res["epochs_compacted"] == 2
    plan = mf.prune_plan(spark, out, [("v", "between", (100, 140))])
    assert plan["total_files"] >= 10
    assert plan["kept_files"] <= plan["total_files"] // 2  # v still prunes
    got = mf.pruned_read(spark, out, [("v", "between", (100, 140))]).filter(
        F.col("v").between(100, 140)
    )
    assert got.count() == 41


def test_zorder_accepts_timestamp_ntz_cluster_column(spark, tmp_path):
    """Parquet timestamps read back as timestamp_ntz, which has no direct
    numeric cast in Spark 4 — the z-key proxy must route through
    timestamp_ltz (rank-preserving) instead of failing analysis
    (regression: tools/zorder_bench.py on the sf0.1 orders table)."""
    out = str(tmp_path / "tntz")
    d = (
        spark.range(0, 200)
        .select(
            F.format_string("d%05d", F.col("id")).alias("doc_id"),
            F.col("id").alias("v"),
            F.to_timestamp(
                F.lit("2024-01-01").cast("date").cast("timestamp")
                + F.make_interval(days=(F.col("id") * 541) % 200)
            ).cast("timestamp_ntz").alias("ts"),
        )
        .withColumn("text", F.lit("payload"))
    )
    mf.checkpointed_write(
        spark, d, out, n_buckets=2, input_snapshot="s1", stats_cols=["v", "ts"]
    )
    mf.compact(
        spark, out, key_col="doc_id", cluster_by=["v", "ts"], zorder=True,
        max_file_rows=25, min_epochs=1,
    )
    plan = mf.prune_plan(
        spark, out, [("ts", "between", ("2024-02-01", "2024-03-01"))]
    )
    assert plan["total_files"] >= 8
    assert plan["kept_files"] < plan["total_files"]  # ts actually prunes
