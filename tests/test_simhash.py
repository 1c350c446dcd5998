"""SimHash correctness: the numpy-vectorized UDF must match the scalar
spec bit-for-bit, and segment blocking must have 100 % recall vs brute
pairwise hamming at the requested ``max_hamming`` (the pigeonhole
guarantee — VERDICT r01 flagged the old fixed-4-segment scheme silently
dropping pairs at max_hamming > 3)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators import dedup

SF_DIR = "/root/testdata/sf0.001"

SAMPLES = [
    None,
    "",
    "   ",
    "one",
    "one one one",
    "The quick brown fox jumps over the lazy dog",
    "THE QUICK BROWN FOX jumps over the lazy dog",  # case folding
    "facture n° 2025-001 total ttc 1'858.73 CHF",
    "àccénts et ünïcode ﬁ ligature   nbsp",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 4,
]


def test_vectorized_matches_scalar_spec(spark):
    import pandas as pd

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(SAMPLES)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", dedup.simhash64(F.col("text")).alias("h")).collect()
    }
    for i, t in enumerate(SAMPLES):
        assert got[i] == dedup.simhash64_py(t), f"mismatch on sample {i!r}: {t!r}"


def _brute_pairs(hashes: dict, max_hamming: int) -> set:
    out = set()
    for (a, ha), (b, hb) in itertools.combinations(sorted(hashes.items()), 2):
        if bin((ha ^ hb) & ((1 << 64) - 1)).count("1") <= max_hamming:
            out.add((a, b))
    return out


@pytest.mark.parametrize("max_hamming", [0, 3, 8])
def test_blocking_recall_is_total(spark, max_hamming):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < 150
    )
    if max_hamming == 0:
        # single-segment edge (64-bit seg_val, no mask literal): needs
        # exact simhash twins, which the corpus lacks — clone some docs
        clones = docs.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            *[c for c in docs.columns if c != "doc_id"],
        )
        docs = docs.select(*docs.columns).unionByName(clones)
    hashes = {
        r["doc_id"]: r["h"]
        for r in docs.select("doc_id", dedup.simhash64(F.col("text")).alias("h")).collect()
    }
    expected = _brute_pairs(hashes, max_hamming)
    assert expected, "test corpus produced no near-dup pairs — vacuous"
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.simhash_near_dups(docs, max_hamming=max_hamming).collect()
    }
    assert got == expected


def test_unsupported_hamming_rejected():
    with pytest.raises(ValueError):
        dedup._hamming_segments(16)
    with pytest.raises(ValueError):
        dedup._hamming_segments(-1)
