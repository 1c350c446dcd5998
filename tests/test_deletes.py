"""Equality deletes (merge-on-read): commit-stamp sequence semantics,
re-insert visibility, time travel, physical apply at compaction, and
the pruned/lookup readers honoring tombstones."""

from __future__ import annotations

import time

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


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_delete_hides_rows_and_reinsert_returns(spark, tmp_path):
    out = str(tmp_path / "t")
    d1 = _docs(spark, 30, tag="a")
    manifests.checkpointed_write(spark, d1, out, N_BUCKETS, "snap-a")
    all_ids = _ids(d1)
    victims = sorted(all_ids)[:7]

    res = manifests.delete_keys(spark, out, victims)
    assert res["n_keys"] == 7
    got = _ids(manifests.read_committed(spark, out))
    assert got == all_ids - set(victims)

    # re-insert two of the deleted keys in a later delivery: visible
    # again (their epoch postdates the delete)
    back = d1.filter(F.col("doc_id").isin(victims[:2]))
    manifests.checkpointed_write(spark, back, out, N_BUCKETS, "snap-b")
    got2 = _ids(manifests.read_committed(spark, out))
    assert got2 == (all_ids - set(victims)) | set(victims[:2])


def test_delete_time_travel_and_compaction(spark, tmp_path):
    out = str(tmp_path / "t2")
    d1 = _docs(spark, 30, tag="x")
    manifests.checkpointed_write(spark, d1, out, N_BUCKETS, "s1")
    all_ids = _ids(d1)
    before_delete = time.time()
    time.sleep(0.01)
    victims = sorted(all_ids)[:5]
    manifests.delete_keys(spark, out, victims)

    # as-of before the delete: everything visible
    assert _ids(manifests.read_as_of(spark, out, before_delete)) == all_ids
    # as-of now: deletes applied
    assert _ids(manifests.read_as_of(spark, out, time.time())) == all_ids - set(victims)

    # compaction applies tombstones physically: raw files of the new
    # epoch no longer contain the victims, and reads are unchanged
    res = manifests.compact(spark, out, min_epochs=1)
    assert res["new_epoch"] is not None
    raw = spark.read.parquet(f"{out}/data").filter(
        F.col("epoch") == res["new_epoch"]
    )
    assert _ids(raw) == all_ids - set(victims)
    assert _ids(manifests.read_committed(spark, out)) == all_ids - set(victims)


def test_pruned_and_lookup_readers_honor_deletes(spark, tmp_path):
    out = str(tmp_path / "t3")
    d1 = _docs(spark, 30, tag="y")
    manifests.checkpointed_write(
        spark, d1, out, N_BUCKETS, "s1", stats_cols=["n_chars"], bloom_key=True
    )
    all_ids = sorted(_ids(d1))
    victims = all_ids[:3]
    manifests.delete_keys(spark, out, victims)

    pr = manifests.pruned_read(spark, out, [("n_chars", ">=", 0)])
    assert set(victims) & _ids(pr) == set()

    lk = manifests.lookup_read(spark, out, victims + all_ids[3:5])
    assert _ids(lk) == set(all_ids[3:5])


def test_upsert_write_replaces_matched_inserts_new(spark, tmp_path):
    out = str(tmp_path / "u")
    d1 = _docs(spark, 30, tag="z")
    manifests.checkpointed_write(spark, d1, out, N_BUCKETS, "base")
    base = {
        r["doc_id"]: r["n_spans"]
        for r in d1.select("doc_id", F.size("spans").alias("n_spans")).collect()
    }
    assert any(v > 1 for v in base.values())  # truncation is observable

    some = sorted(k for k, v in base.items() if v > 1)[:5]
    # updated rows: spans truncated to 1 — the observable "new version"
    upd = d1.filter(F.col("doc_id").isin(some)).withColumn(
        "spans", F.slice("spans", 1, 1)
    )
    new = _docs(spark, 3, tag="new")
    manifests.upsert_write(spark, upd.unionByName(new), out, N_BUCKETS, "merge-1")

    got = {
        r["doc_id"]: r["n_spans"]
        for r in manifests.read_committed(spark, out)
        .select("doc_id", F.size("spans").alias("n_spans"))
        .collect()
    }
    assert set(got) == set(base) | _ids(new)
    for k in some:
        assert got[k] == 1             # matched rows replaced
    for k in set(base) - set(some):
        assert got[k] == base[k]       # untouched rows intact
    # exactly one row per key (the old versions are tombstoned)
    assert manifests.read_committed(spark, out).count() == len(base) + 3


def test_changes_between_replays_to_snapshot(spark, tmp_path):
    """CDC contract: applying the window's changes (drop D keys, add I
    rows) to the t1 snapshot reproduces the t2 snapshot — across an
    append, a delete, an upsert, and an insert-then-delete that must
    net out."""
    out = str(tmp_path / "cdc")
    d1 = _docs(spark, 25, tag="c")
    manifests.checkpointed_write(spark, d1, out, N_BUCKETS, "base")
    t1 = time.time()
    time.sleep(0.01)

    ids = sorted(_ids(d1))
    # window activity: delete 3, upsert 2 (of the survivors), append 4
    # new, and insert+delete one key inside the window
    manifests.delete_keys(spark, out, ids[:3])
    upd = d1.filter(F.col("doc_id").isin(ids[5:7])).withColumn(
        "spans", F.slice("spans", 1, 1)
    )
    manifests.upsert_write(spark, upd, out, N_BUCKETS, "m1")
    newly = _docs(spark, 4, tag="cnew")
    manifests.checkpointed_write(spark, newly, out, N_BUCKETS, "d2")
    ephemeral = _docs(spark, 1, tag="ceph")
    manifests.checkpointed_write(spark, ephemeral, out, N_BUCKETS, "d3")
    manifests.delete_keys(spark, out, sorted(_ids(ephemeral)))
    time.sleep(0.01)
    t2 = time.time()

    snap1 = manifests.read_as_of(spark, out, t1)
    snap2 = manifests.read_as_of(spark, out, t2)
    ch = manifests.changes_between(spark, out, t1, t2)
    d_keys = {r["doc_id"] for r in ch.filter(F.col("_op") == "D").collect()}
    ins = ch.filter(F.col("_op") == "I").drop("_op")

    def rows(df):
        return {
            (r["doc_id"], len(r["spans"])) for r in df.collect()
        }

    replayed = rows(snap1.filter(~F.col("doc_id").isin(list(d_keys)))) | rows(ins)
    assert replayed == rows(snap2)
    # the ephemeral insert-then-delete netted out entirely
    eph = next(iter(_ids(ephemeral)))
    got_ids = {r["doc_id"] for r in ch.collect()}
    assert eph not in got_ids
    # the upserted keys appear as both D and I
    i_keys = {r["doc_id"] for r in ch.filter(F.col("_op") == "I").collect()}
    assert set(ids[5:7]) <= d_keys and set(ids[5:7]) <= i_keys


def test_expire_removes_superseded_and_inert_tombstones(spark, tmp_path):
    """Retention: expire removes epochs superseded by an old-enough
    compaction AND tombstones every live epoch postdates, leaving
    current reads identical; a cutoff before the compaction removes
    nothing."""
    import glob as _glob

    out = str(tmp_path / "exp")
    d1 = _docs(spark, 25, tag="e")
    manifests.checkpointed_write(spark, d1, out, N_BUCKETS, "s1")
    all_ids = _ids(d1)
    victims = sorted(all_ids)[:4]
    manifests.delete_keys(spark, out, victims)
    pre_compact = time.time()
    time.sleep(0.01)
    manifests.compact(spark, out, min_epochs=1)
    want = all_ids - set(victims)
    assert _ids(manifests.read_committed(spark, out)) == want

    # cutoff BEFORE the compaction: nothing is removable
    res0 = manifests.expire(spark, out, older_than=pre_compact)
    assert res0 == {"data_epoch_dirs_removed": 0, "tombstone_epochs_removed": 0}

    time.sleep(0.01)
    res = manifests.expire(spark, out, older_than=time.time())
    assert res["data_epoch_dirs_removed"] > 0
    assert res["tombstone_epochs_removed"] == 1
    # tombstone files gone, expiry marker present
    assert _glob.glob(f"{out}/deletes/epoch=*") == []
    # current reads identical after retention
    assert _ids(manifests.read_committed(spark, out)) == want
    # idempotent re-run
    res2 = manifests.expire(spark, out, older_than=time.time())
    assert res2["tombstone_epochs_removed"] == 0


def test_upsert_retry_after_completion_is_lossless(spark, tmp_path):
    """ADVICE r03 (high): re-running a completed upsert with the same
    input_snapshot must NOT lose the delivery — the retry detects its
    committed tombstone stamp and skips the delete step, so no fresh
    tombstone postdates the delivered epoch."""
    out = str(tmp_path / "ur")
    d1 = _docs(spark, 20, tag="r")
    manifests.checkpointed_write(spark, d1, out, N_BUCKETS, "base")
    base = _ids(d1)

    some = sorted(base)[:4]
    upd = d1.filter(F.col("doc_id").isin(some)).withColumn(
        "spans", F.slice("spans", 1, 1)
    )
    manifests.upsert_write(spark, upd, out, N_BUCKETS, "merge-r")
    want = {
        r["doc_id"]: r["n"]
        for r in manifests.read_committed(spark, out)
        .select("doc_id", F.size("spans").alias("n"))
        .collect()
    }
    assert set(want) == base and all(want[k] == 1 for k in some)

    # the retry: same call, same snapshot — must be a pure no-op
    manifests.upsert_write(spark, upd, out, N_BUCKETS, "merge-r")
    got = {
        r["doc_id"]: r["n"]
        for r in manifests.read_committed(spark, out)
        .select("doc_id", F.size("spans").alias("n"))
        .collect()
    }
    assert got == want  # rows survive, values intact, no dupes

    # exactly one tombstone carries this snapshot stamp
    dm = spark.read.option("mergeSchema", "true").parquet(
        f"{out}/delete_manifests"
    )
    assert dm.filter(F.col("input_snapshot") == "merge-r").count() == 1


def test_upsert_resume_between_tombstone_and_data(spark, tmp_path):
    """Crash point: tombstone committed, data not yet landed. The retry
    must skip straight to the append (no second tombstone) and the
    delivery becomes fully visible."""
    out = str(tmp_path / "uc")
    d1 = _docs(spark, 20, tag="c")
    manifests.checkpointed_write(spark, d1, out, N_BUCKETS, "base")
    base = _ids(d1)

    some = sorted(base)[:5]
    upd = d1.filter(F.col("doc_id").isin(some)).withColumn(
        "spans", F.slice("spans", 1, 1)
    )
    # simulate the first run dying right after its delete committed
    manifests.delete_keys(spark, out, upd.select("doc_id"), input_snapshot="m-crash")
    assert _ids(manifests.read_committed(spark, out)) == base - set(some)

    manifests.upsert_write(spark, upd, out, N_BUCKETS, "m-crash")
    got = {
        r["doc_id"]: r["n"]
        for r in manifests.read_committed(spark, out)
        .select("doc_id", F.size("spans").alias("n"))
        .collect()
    }
    assert set(got) == base and all(got[k] == 1 for k in some)
    dm = spark.read.option("mergeSchema", "true").parquet(
        f"{out}/delete_manifests"
    )
    assert dm.filter(F.col("input_snapshot") == "m-crash").count() == 1
