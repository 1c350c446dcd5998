"""Deduplication family for training-data pipelines.

* exact (hash-groupBy on a canonical fingerprint)
* n-gram Jaccard (shingle arrays + array_intersect/union)
* MinHash + LSH (shingle → per-seed min-hash → band → bucket join)
* SimHash (64-bit, vectorized pandas_udf)

MinHash signatures use ``min(md5(seed || ':' || shingle))`` — the
lexicographic minimum of md5 hex digests — so the identical signature is
computable in any engine with md5 (the DuckDB oracle uses the same
construction; no engine-specific hash functions anywhere).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from ocr_spark.operators.textstats import fingerprint

DEFAULT_SHINGLE = 5
DEFAULT_SEEDS = 8
DEFAULT_BANDS = 4  # 2 seeds per band


def exact_dedup_groups(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (canonicalized) docs: fp, size, keeper id."""
    return (
        documents.select(F.col("doc_id"), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("group_size"), F.min("doc_id").alias("keep_doc_id"))
    )


def exact_dedup(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one representative (min doc_id) per fingerprint."""
    keep = exact_dedup_groups(documents, text_col).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    return documents.join(keep, on="doc_id", how="left_semi")


def normalized(col: Column) -> Column:
    """Canonical text form shared by all dedup ops: lower, collapse ws."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def _shingle_expr(norm: Column, k: int) -> Column:
    """k-shingles of an ALREADY-MATERIALIZED norm column reference.

    The norm argument must be a plain column reference, never an inline
    expression: Spark evaluates expressions referenced inside a
    higher-order-function lambda once per array ELEMENT, so an inline
    regexp_replace here costs O(len) regex passes per row (measured 10×
    slowdown). Callers project ``normalized()`` first — CollapseProject
    leaves the projection alone because the alias is referenced more than
    once (length + lambda)."""
    return F.array_sort(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(norm) - F.lit(k - 1), F.lit(1))),
                lambda i: F.substring(norm, i, k),
            )
        )
    )


def shingles(col: Column, k: int = DEFAULT_SHINGLE) -> Column:
    """Distinct character k-shingles of the canonicalized text (sorted so
    downstream aggregates are order-independent).

    NOTE: expression form — recomputes the normalization per array element
    inside the HOF lambda. Prefer ``with_shingles`` (two-step projection)
    anywhere performance matters."""
    return _shingle_expr(normalized(col), k)


def with_shingles(
    documents: DataFrame,
    text_col: str = "text",
    k: int = DEFAULT_SHINGLE,
    id_col: str = "doc_id",
    out_col: str = "sh",
) -> DataFrame:
    """(id, sh) with the norm pass materialized once per row (fast path)."""
    return documents.select(
        id_col, normalized(F.col(text_col)).alias("_norm")
    ).select(id_col, _shingle_expr(F.col("_norm"), k).alias(out_col))


def minhash_signature(sh: Column, n_seeds: int = DEFAULT_SEEDS) -> Column:
    """Array of n_seeds minhashes: min over shingles of md5(seed:shingle)."""
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s))))
            for seed in range(n_seeds)
        ]
    )


def lsh_candidate_pairs(
    documents: DataFrame,
    text_col: str = "text",
    k: int = DEFAULT_SHINGLE,
    n_seeds: int = DEFAULT_SEEDS,
    n_bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Near-dup candidate pairs: docs sharing ≥1 LSH band bucket.

    Scale path: the self-join runs per (band, band_hash) bucket — a shuffle
    keyed on the band hash, never a full cross join.
    """
    rows_per_band = n_seeds // n_bands
    sig = with_shingles(documents, text_col, k).select(
        "doc_id", minhash_signature(F.col("sh"), n_seeds).alias("sig")
    )
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|", *[F.element_at("sig", b * rows_per_band + r + 1) for r in range(rows_per_band)]
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.band_hash")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, on=["band", "band_hash"], how="inner")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_pairs(
    documents: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    k: int = DEFAULT_SHINGLE,
    threshold: float = 0.7,
) -> DataFrame:
    """Verify candidate pairs with exact shingle Jaccard ≥ threshold."""
    sh = with_shingles(documents, text_col, k)
    out = (
        candidates.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), on="doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), on="doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)  # raw ratio, rounding is the caller's
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def near_dup_pairs(documents: DataFrame, text_col: str = "text", threshold: float = 0.7) -> DataFrame:
    """MinHash-LSH candidates verified by exact Jaccard."""
    return jaccard_pairs(documents, lsh_candidate_pairs(documents, text_col), text_col, threshold=threshold)


@pandas_udf(T.LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (Arrow-vectorized batch UDF)."""
    out = []
    for t in texts:
        tokens = (t or "").lower().split()
        if not tokens:
            out.append(0)
            continue
        acc = [0] * 64
        for tok in tokens:
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            for bit in range(64):
                acc[bit] += 1 if (h >> bit) & 1 else -1
        v = 0
        for bit in range(64):
            if acc[bit] > 0:
                v |= 1 << bit
        # to signed 64-bit
        out.append(v - (1 << 64) if v >= (1 << 63) else v)
    return pd.Series(out, dtype="int64")


def simhash_near_dups(documents: DataFrame, text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs via 4-segment pigeonhole blocking: pairs with
    hamming ≤ 3 share at least one identical 16-bit segment, so the
    self-join is keyed on (segment_idx, segment_value) — no cross join."""
    with_h = documents.select("doc_id", simhash64(F.col(text_col)).alias("h"))
    segs = with_h.select(
        "doc_id",
        "h",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("seg"),
                    F.shiftrightunsigned(F.col("h"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("seg_val"),
                )
                for i in range(4)
            ])
        ).alias("s"),
    ).select("doc_id", "h", "s.seg", "s.seg_val")
    a, b = segs.alias("a"), segs.alias("b")
    pairs = (
        a.join(b, on=["seg", "seg_val"], how="inner")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.h").bitwiseXOR(F.col("b.h"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs
