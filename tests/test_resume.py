"""Checkpoint-manifest protocol: kill → resume → no dupes, orphans invisible."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from ocr_spark.sources import manifests
from ocr_spark.schemas import DOCUMENTS
from ocr_spark.synth import synth_frames

N_BUCKETS = 8


def _docs(spark, n=40):
    docs_pd, _ = synth_frames(n)
    return spark.createDataFrame(docs_pd, schema=DOCUMENTS)


def test_kill_resume_no_duplicates(spark, tmp_path):
    out = str(tmp_path / "out")
    docs = _docs(spark)
    snapshot = "snap-1"

    # simulate a killed run: only buckets 0..3 got processed+manifested
    partial = manifests.with_bucket(docs, N_BUCKETS).filter(F.col("bucket") < 4).drop("bucket")
    s1 = manifests.checkpointed_write(spark, partial, out, N_BUCKETS, snapshot)
    assert 0 < s1["buckets_written"] <= 4

    # resume with the FULL input and same snapshot: completed buckets skipped
    s2 = manifests.checkpointed_write(spark, docs, out, N_BUCKETS, snapshot)
    assert s2["buckets_skipped"] == s1["buckets_written"]

    committed = manifests.read_committed(spark, out, snapshot)
    assert committed.count() == docs.count()
    assert committed.select("doc_id").distinct().count() == docs.count()

    # re-running a third time is a no-op (idempotent)
    s3 = manifests.checkpointed_write(spark, docs, out, N_BUCKETS, snapshot)
    assert s3["rows"] == 0
    assert manifests.read_committed(spark, out, snapshot).count() == docs.count()


def test_orphan_epoch_files_are_invisible(spark, tmp_path):
    out = str(tmp_path / "out")
    docs = _docs(spark, 20)
    manifests.checkpointed_write(spark, docs, out, N_BUCKETS, "snap-1")
    before = manifests.read_committed(spark, out, "snap-1").count()

    # a crashed epoch left committed task files but no manifest row
    orphan = manifests.with_bucket(docs.limit(5), N_BUCKETS).withColumn(
        "epoch", F.lit("deadbeefdeadbeef")
    )
    orphan.write.partitionBy("bucket", "epoch").mode("append").parquet(out + "/data")

    after = manifests.read_committed(spark, out, "snap-1").count()
    assert after == before  # orphans excluded


def test_manifest_metrics_present(spark, tmp_path):
    out = str(tmp_path / "out")
    manifests.checkpointed_write(spark, _docs(spark, 20), out, N_BUCKETS, "snap-1")
    m = manifests.read_manifests(spark, out).toPandas()
    assert (m["row_count"] > 0).all()
    assert (m["byte_count"] > 0).all()
    assert m["lineage_hash"].notna().all()
    assert m["bucket"].is_unique
