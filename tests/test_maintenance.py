"""Table maintenance: snapshot tags, metadata-only counts, orphan removal.

Invariants:
* a tag pins rows across later deliveries, upserts, and compactions
  (until retention strips the history it points into);
* fast_count is exact ALWAYS — "manifests" source only claimed when
  tombstones are provably inert, otherwise it scans;
* remove_orphans deletes only epochs referenced by NO metadata, never
  live or superseded ones, and respects the grace window.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from ocr_spark.sources import manifests as mf


def _delivery(spark, lo: int, n: int):
    return spark.range(lo, lo + n).select(
        F.format_string("d%05d", F.col("id")).alias("doc_id"),
        F.col("id").cast("long").alias("v"),
    )


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_tag_pins_snapshot_across_deliveries_and_compaction(spark, tmp_path):
    out = str(tmp_path / "t")
    mf.checkpointed_write(spark, _delivery(spark, 0, 50), out, n_buckets=4,
                          input_snapshot="s1")
    mf.create_tag(out, "v1")
    mf.checkpointed_write(spark, _delivery(spark, 1000, 30), out, n_buckets=4,
                          input_snapshot="s2")

    assert len(_ids(mf.read_tag(spark, out, "v1"))) == 50
    assert len(_ids(mf.read_committed(spark, out))) == 80

    # compaction rewrites the data but the tag still resolves pre-compaction
    mf.compact(spark, out, key_col="doc_id")
    assert len(_ids(mf.read_tag(spark, out, "v1"))) == 50

    # tag CRUD semantics
    with pytest.raises(FileExistsError):
        mf.create_tag(out, "v1")
    mf.create_tag(out, "v1", replace=True)  # moved to now
    assert len(_ids(mf.read_tag(spark, out, "v1"))) == 80
    assert [t["name"] for t in mf.list_tags(out)] == ["v1"]
    assert mf.drop_tag(out, "v1") is True
    assert mf.drop_tag(out, "v1") is False
    with pytest.raises(FileNotFoundError):
        mf.read_tag(spark, out, "v1")
    with pytest.raises(ValueError):
        mf.create_tag(out, "../escape")


def test_fast_count_metadata_vs_scan(spark, tmp_path):
    out = str(tmp_path / "t")
    mf.checkpointed_write(spark, _delivery(spark, 0, 60), out, n_buckets=4,
                          input_snapshot="s1")
    mf.checkpointed_write(spark, _delivery(spark, 1000, 40), out, n_buckets=4,
                          input_snapshot="s2")
    got = mf.fast_count(spark, out)
    assert got == {"count": 100, "source": "manifests"}
    assert mf.fast_count(spark, out, input_snapshot="s2") == {
        "count": 40, "source": "manifests"
    }

    # a live tombstone forces the scan path — and the count is still exact
    mf.delete_keys(spark, out, ["d00003", "d00007", "d01005"])
    got = mf.fast_count(spark, out)
    assert got == {"count": 97, "source": "scan"}

    # compaction applies tombstones physically; its fresh commit stamp
    # postdates them, so metadata counting is provably exact again
    mf.compact(spark, out, key_col="doc_id")
    got = mf.fast_count(spark, out)
    assert got == {"count": 97, "source": "manifests"}


def test_remove_orphans(spark, tmp_path):
    import glob

    out = str(tmp_path / "t")
    mf.checkpointed_write(spark, _delivery(spark, 0, 50), out, n_buckets=2,
                          input_snapshot="s1")
    mf.checkpointed_write(spark, _delivery(spark, 1000, 50), out, n_buckets=2,
                          input_snapshot="s2")
    mf.compact(spark, out, key_col="doc_id")  # superseded epochs now exist

    # fabricate a crashed write: data landed, no manifest row
    src = glob.glob(f"{out}/data/bucket=0/epoch=*")[0]
    orphan = f"{out}/data/bucket=0/epoch=deadbeefcafe0000"
    shutil.copytree(src, orphan)

    plan = mf.remove_orphans(spark, out, grace_seconds=0, dry_run=True)
    assert plan["removed"] == 0 and plan["orphans"] == [orphan]
    assert os.path.isdir(orphan)

    # a YOUNG orphan is protected by the grace window
    assert mf.remove_orphans(spark, out, grace_seconds=3600)["orphans"] == []

    got = mf.remove_orphans(spark, out, grace_seconds=0)
    assert got["removed"] == 1 and not os.path.isdir(orphan)

    # superseded + live epochs untouched: committed reads and time travel intact
    assert mf.read_committed(spark, out).count() == 100
    n_dirs = len(glob.glob(f"{out}/data/bucket=*/epoch=*"))
    assert n_dirs == 6  # 2 buckets x (s1 + s2 + compacted)


def test_maybe_compact_respects_the_epoch_threshold(spark, tmp_path):
    out = str(tmp_path / "t")
    for i in range(3):
        mf.checkpointed_write(
            spark, _delivery(spark, i * 100, 20), out, n_buckets=2,
            input_snapshot=f"s{i}",
        )
    # 3 live epochs <= threshold: policy declines, table untouched
    res = mf.maybe_compact(spark, out, max_live_epochs=3)
    assert res == {"skipped": True, "live_epochs": 3}
    # threshold crossed: the policy compacts and reports both facts
    res = mf.maybe_compact(spark, out, max_live_epochs=2, key_col="doc_id")
    assert res["skipped"] is False and res["live_epochs"] == 3
    assert res["epochs_compacted"] == 3 and res["new_epoch"]
    assert len(_ids(mf.read_committed(spark, out))) == 60
    # post-compaction: one live epoch, policy declines again
    res = mf.maybe_compact(spark, out, max_live_epochs=2)
    assert res == {"skipped": True, "live_epochs": 1}


def test_maybe_compact_on_missing_table(spark, tmp_path):
    res = mf.maybe_compact(spark, str(tmp_path / "nope"), max_live_epochs=1)
    assert res == {"skipped": True, "live_epochs": 0}


def test_expire_respects_live_tags(spark, tmp_path):
    import time as _time

    out = str(tmp_path / "t")
    mf.checkpointed_write(spark, _delivery(spark, 0, 30), out, n_buckets=2,
                          input_snapshot="s1")
    mf.create_tag(out, "training-v1")
    pinned = _ids(mf.read_tag(spark, out, "training-v1"))
    mf.checkpointed_write(spark, _delivery(spark, 1000, 20), out, n_buckets=2,
                          input_snapshot="s2")
    mf.compact(spark, out, key_col="doc_id")

    # aggressive retention, but the tag pins history: nothing removed
    res = mf.expire(spark, out, older_than=_time.time() + 10)
    assert res["data_epoch_dirs_removed"] == 0
    assert _ids(mf.read_tag(spark, out, "training-v1")) == pinned

    # drop the tag: the same sweep now strips the superseded epochs
    mf.drop_tag(out, "training-v1")
    res = mf.expire(spark, out, older_than=_time.time() + 10)
    assert res["data_epoch_dirs_removed"] > 0
    assert len(_ids(mf.read_committed(spark, out))) == 50

    # respect_tags=False would have ignored the pin (documented escape)


def test_table_stats_reports_the_whole_lifecycle(spark, tmp_path):
    out = str(tmp_path / "t")
    for i in range(2):
        mf.checkpointed_write(
            spark, _delivery(spark, i * 100, 25), out, n_buckets=2,
            input_snapshot=f"s{i}", stats_cols=["v"], bloom_key=True,
        )
    mf.create_tag(out, "v1")
    mf.delete_keys(spark, out, ["d00003"])
    st = mf.table_stats(spark, out)
    assert st["live_epochs"] == 2 and st["deliveries"] == 2
    assert st["buckets"] == 2 and st["live_rows"] == 50
    assert st["live_bytes"] > 0 and st["spec"]["key_col"] == "doc_id"
    assert st["tombstone_epochs"] == 1 and st["tombstone_keys"] == 1
    assert st["tags"] == ["v1"] and st["stats_cols"] == ["v"]
    assert st["has_blooms"] is True and st["superseded_epochs"] == 0

    mf.compact(spark, out, key_col="doc_id", cluster_by="v", max_file_rows=10)
    st = mf.table_stats(spark, out)
    assert st["live_epochs"] == 1 and st["superseded_epochs"] == 2
    assert st["live_rows"] == 49          # compaction applied the tombstone
    assert st["filestat_epochs"] == 1     # clustered rewrite left a sidecar
    assert st["stats_cols"] == ["v"]      # pruning power carried across


def test_table_stats_on_missing_table(spark, tmp_path):
    st = mf.table_stats(spark, str(tmp_path / "nope"))
    assert st["live_epochs"] == 0 and st["tags"] == [] and st["spec"] == {}
