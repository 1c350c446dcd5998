"""Incremental LSH index: probe(new, index(old)) must equal the
full-batch near_dup_pairs(old ∪ new) restricted to cross pairs (the
pair-locality property), appends must extend the corpus, and the probe
scan must dynamic-partition-prune."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators import dedup

SF_DIR = "/root/testdata/sf0.001"
SPLIT = 400  # old: doc_id < 400, new: doc_id >= 400


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")


def _pairset(df):
    return {
        (r.doc_a, r.doc_b, round(r.jaccard, 6)) for r in df.collect()
    }


def test_probe_equals_batch_cross_pairs(spark, docs, tmp_path):
    old = docs.filter(F.col("doc_id") < SPLIT)
    new = docs.filter(F.col("doc_id") >= SPLIT)
    idx = str(tmp_path / "idx")
    dedup.build_lsh_index(old, idx)
    probe = _pairset(dedup.lsh_index_probe(new, idx, threshold=0.5))
    batch = _pairset(
        dedup.near_dup_pairs(docs, threshold=0.5).filter(
            (F.col("doc_a") < SPLIT) & (F.col("doc_b") >= SPLIT)
        )
    )
    assert probe == batch and probe  # non-trivial: corpus plants near-dups


def test_append_extends_the_index(spark, docs, tmp_path):
    idx = str(tmp_path / "idx")
    dedup.build_lsh_index(docs.filter(F.col("doc_id") < 200), idx)
    dedup.build_lsh_index(
        docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < SPLIT)),
        idx,
        mode="append",
    )
    new = docs.filter(F.col("doc_id") >= SPLIT)
    probe = _pairset(dedup.lsh_index_probe(new, idx, threshold=0.5))
    batch = _pairset(
        dedup.near_dup_pairs(docs, threshold=0.5).filter(
            (F.col("doc_a") < SPLIT) & (F.col("doc_b") >= SPLIT)
        )
    )
    assert probe == batch


def test_probe_scan_partition_prunes(spark, docs, tmp_path):
    idx = str(tmp_path / "idx")
    dedup.build_lsh_index(docs.filter(F.col("doc_id") < SPLIT), idx)
    new = docs.filter(F.col("doc_id") >= SPLIT).limit(5)
    df = dedup.lsh_index_probe(new, idx, threshold=0.5)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the bands/ scan must carry literal partition filters on
    # (band, bucket) derived from the batch (static pruning — chosen over
    # DPP, whose benefit heuristic may decline to prune)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan[:2000]


def test_meta_mismatch_refuses_append(spark, docs, tmp_path):
    idx = str(tmp_path / "idx")
    dedup.build_lsh_index(docs.filter(F.col("doc_id") < 50), idx)
    with pytest.raises(ValueError, match="built with"):
        dedup.build_lsh_index(
            docs.filter(F.col("doc_id") >= 50),
            idx,
            mode="append",
            bucket_width=1,
        )
