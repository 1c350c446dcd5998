"""Epoch compaction on the manifest sink: fewer files, identical reads,
per-delivery slicing intact, resume semantics intact, crash-safe commit."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from ocr_spark.schemas import DOCUMENTS
from ocr_spark.sources import manifests
from ocr_spark.synth import synth_frames

N_BUCKETS = 8


def _docs(spark, n=40, tag=""):
    docs_pd, _ = synth_frames(n)
    df = spark.createDataFrame(docs_pd, schema=DOCUMENTS)
    return (
        df.withColumn("doc_id", F.concat(F.col("doc_id"), F.lit(f"-{tag}")))
        if tag
        else df
    )


def _data_files(out):
    return sorted(
        p
        for p in glob.glob(os.path.join(out, "data", "bucket=*", "epoch=*", "*"))
        if p.endswith(".parquet")
    )


def _deliveries(spark, out, n_snaps=3):
    """n_snaps daily-delivery appends → one epoch (and one file per
    bucket) per delivery."""
    batches = {}
    for i in range(n_snaps):
        docs = _docs(spark, 30, tag=f"b{i}")
        manifests.checkpointed_write(spark, docs, out, N_BUCKETS, f"snap-{i}")
        batches[f"snap-{i}"] = docs
    return batches


def test_compact_preserves_reads_and_reduces_files(spark, tmp_path):
    out = str(tmp_path / "out")
    batches = _deliveries(spark, out)

    before_all = sorted(map(tuple, manifests.read_committed(spark, out).collect()))
    before_files = _data_files(out)
    assert len(before_files) >= 3 * N_BUCKETS / 2  # fragmented across deliveries

    res = manifests.compact(spark, out, vacuum=True)
    assert res["epochs_compacted"] == 3
    assert res["vacuumed_dirs"] > 0

    after_all = sorted(map(tuple, manifests.read_committed(spark, out).collect()))
    assert after_all == before_all
    after_files = _data_files(out)
    assert len(after_files) == res["buckets"]  # one live file per bucket
    assert len(after_files) < len(before_files)

    # per-delivery slicing still works on the merged files
    for snap, docs in batches.items():
        got = manifests.read_committed(spark, out, snap)
        assert sorted(r["doc_id"] for r in got.select("doc_id").collect()) == sorted(
            r["doc_id"] for r in docs.select("doc_id").collect()
        )


def test_compact_preserves_lineage_hashes(spark, tmp_path):
    out = str(tmp_path / "out")
    _deliveries(spark, out)
    old = manifests.read_manifests(spark, out).select(
        "bucket", "input_snapshot", "row_count", "lineage_hash"
    )
    old_rows = sorted(map(tuple, old.collect()))
    manifests.compact(spark, out)
    live = manifests.active_manifests(spark, out).select(
        "bucket", "input_snapshot", "row_count", "lineage_hash"
    )
    assert sorted(map(tuple, live.collect())) == old_rows


def test_resume_still_noop_after_compaction(spark, tmp_path):
    out = str(tmp_path / "out")
    batches = _deliveries(spark, out)
    manifests.compact(spark, out, vacuum=True)
    s = manifests.checkpointed_write(spark, batches["snap-1"], out, N_BUCKETS, "snap-1")
    assert s["rows"] == 0 and s["buckets_written"] == 0


def test_appends_after_compaction_compose(spark, tmp_path):
    out = str(tmp_path / "out")
    _deliveries(spark, out)
    manifests.compact(spark, out, vacuum=True)
    extra = _docs(spark, 15, tag="x")
    manifests.checkpointed_write(spark, extra, out, N_BUCKETS, "snap-9")
    assert manifests.read_committed(spark, out, "snap-9").count() == 15
    assert manifests.read_committed(spark, out).count() == 3 * 30 + 15
    # chained compaction supersedes the first compaction epoch too
    res = manifests.compact(spark, out, vacuum=True)
    assert res["epochs_compacted"] == 2
    assert len(_data_files(out)) == res["buckets"]
    assert manifests.read_committed(spark, out).count() == 3 * 30 + 15


def test_compact_noop_on_single_epoch(spark, tmp_path):
    out = str(tmp_path / "out")
    manifests.checkpointed_write(spark, _docs(spark, 20), out, N_BUCKETS, "snap-1")
    res = manifests.compact(spark, out)
    assert res["new_epoch"] is None and res["epochs_compacted"] == 0


def test_crashed_compaction_is_invisible(spark, tmp_path):
    out = str(tmp_path / "out")
    _deliveries(spark, out)
    before = manifests.read_committed(spark, out).count()

    # simulate a compactor killed between the data rewrite and the commit
    # record: compacted files exist under a c-epoch, no compactions/ row
    orphan = (
        manifests.with_bucket(_docs(spark), N_BUCKETS)
        .withColumn("epoch", F.lit("cdeadbeefdeadbee"))
        .withColumn("input_snapshot", F.lit("snap-0"))
    )
    orphan.write.partitionBy("bucket", "epoch").mode("append").parquet(out + "/data")

    assert manifests.read_committed(spark, out).count() == before


def test_compact_max_file_rows_splits_files(spark, tmp_path):
    out = str(tmp_path / "out")
    _deliveries(spark, out)
    before = sorted(map(tuple, manifests.read_committed(spark, out).collect()))
    res = manifests.compact(spark, out, vacuum=True, max_file_rows=5)
    files = _data_files(out)
    assert len(files) > res["buckets"]  # split beyond one per bucket
    # but still exactly one epoch dir per bucket
    dirs = {os.path.dirname(p) for p in files}
    assert len(dirs) == res["buckets"]
    assert sorted(map(tuple, manifests.read_committed(spark, out).collect())) == before


def test_compact_target_file_bytes_splits_files(spark, tmp_path):
    """target_file_bytes derives the row cap from the manifests' own
    byte/row metrics; a target far below the table size must split
    every bucket, and reads are unchanged."""
    out = str(tmp_path / "out")
    _deliveries(spark, out)
    before = sorted(map(tuple, manifests.read_committed(spark, out).collect()))
    m = manifests.read_manifests(spark, out)
    total_bytes = m.groupBy().sum("byte_count").collect()[0][0]
    res = manifests.compact(
        spark, out, vacuum=True, target_file_bytes=max(1, total_bytes // 40)
    )
    files = _data_files(out)
    assert len(files) > res["buckets"]
    dirs = {os.path.dirname(p) for p in files}
    assert len(dirs) == res["buckets"]
    assert sorted(map(tuple, manifests.read_committed(spark, out).collect())) == before


def test_schema_evolution_survives_reads_and_compaction(spark, tmp_path):
    """A later delivery adds a column: merge_schema=True reads it back
    (null-filled for older rows), and compaction MUST carry it — a
    sampled-schema rewrite plus vacuum would otherwise lose the column
    permanently."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "out")
    d1 = spark.range(0, 10).select(
        F.col("id").cast("string").alias("doc_id"), F.lit("a").alias("text")
    )
    d2 = spark.range(10, 20).select(
        F.col("id").cast("string").alias("doc_id"),
        F.lit("b").alias("text"),
        F.lit("en").alias("lang"),
    )
    manifests.checkpointed_write(spark, d1, out, 2, "s1")
    manifests.checkpointed_write(spark, d2, out, 2, "s2")

    merged = manifests.read_committed(spark, out, merge_schema=True)
    assert set(merged.columns) == {"doc_id", "text", "lang"}
    langs = {r["doc_id"]: r["lang"] for r in merged.collect()}
    assert langs["5"] is None and langs["15"] == "en"

    res = manifests.compact(spark, out, key_col="doc_id", vacuum=True)
    assert res["epochs_compacted"] == 2
    after = manifests.read_committed(spark, out)  # post-compaction: one schema
    assert set(after.columns) == {"doc_id", "text", "lang"}
    assert after.count() == 20
    assert {r["doc_id"]: r["lang"] for r in after.collect()} == langs


def test_read_as_of_time_travel(spark, tmp_path):
    """Deliveries and compactions committed after the as-of instant are
    invisible; history survives compaction until vacuum."""
    import time as _time

    out = str(tmp_path / "tt")
    d1 = _docs(spark, 30, tag="a")
    manifests.checkpointed_write(spark, d1, out, N_BUCKETS, "snap-a")
    mid = _time.time()
    _time.sleep(0.01)
    d2 = _docs(spark, 30, tag="b")
    manifests.checkpointed_write(spark, d2, out, N_BUCKETS, "snap-b")

    want_d1 = {r["doc_id"] for r in d1.select("doc_id").collect()}
    want_all = want_d1 | {r["doc_id"] for r in d2.select("doc_id").collect()}

    got_mid = {r["doc_id"] for r in manifests.read_as_of(spark, out, mid).collect()}
    assert got_mid == want_d1
    got_now = {
        r["doc_id"] for r in manifests.read_as_of(spark, out, _time.time()).collect()
    }
    assert got_now == want_all

    # compaction (no vacuum): invisible at mid — the read resolves to the
    # ORIGINAL epochs, whose files still exist
    res = manifests.compact(spark, out)
    assert res["new_epoch"] is not None
    got_mid2 = {r["doc_id"] for r in manifests.read_as_of(spark, out, mid).collect()}
    assert got_mid2 == want_d1
    # as-of after the compaction sees the compacted view, same rows
    got_post = {
        r["doc_id"] for r in manifests.read_as_of(spark, out, _time.time()).collect()
    }
    assert got_post == want_all
    # current read untouched by time-travel machinery
    got_committed = {
        r["doc_id"] for r in manifests.read_committed(spark, out).collect()
    }
    assert got_committed == want_all


def test_read_as_of_before_first_commit_is_empty(spark, tmp_path):
    import time as _time

    out = str(tmp_path / "tt0")
    before = _time.time()
    _time.sleep(0.01)
    manifests.checkpointed_write(spark, _docs(spark, 10), out, N_BUCKETS, "s")
    assert manifests.read_as_of(spark, out, before).count() == 0
