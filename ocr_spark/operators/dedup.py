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
# 12 seeds in 4 bands of 3: with 2-row bands a templated corpus produced
# 1.1M candidate pairs from 5k docs (only 256 real at j>=0.5); 3-row bands
# cut band-collision probability from s^2 to s^3 (~5x fewer false
# candidates at s~0.3) while keeping >=0.97 recall at s>=0.9.
DEFAULT_SEEDS = 12
DEFAULT_BANDS = 4  # 3 seeds per band
_SUBHASHES_PER_MD5 = 4  # md5 = 128 bits -> four 8-hex-char minhash fns


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


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition when the input arrives under-split (e.g. a
    single small parquet file → one task pinning a core for every
    CPU-bound shingle/hash stage). No-op when the source already has
    enough splits, so a 100 TB many-file input pays nothing."""
    target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() < max(2, target // 4):
        return df.repartition(target)
    return df


def with_shingles(
    documents: DataFrame,
    text_col: str = "text",
    k: int = DEFAULT_SHINGLE,
    id_col: str = "doc_id",
    out_col: str = "sh",
) -> DataFrame:
    """(id, sh) with the norm pass materialized once per row (fast path)."""
    return _ensure_parallelism(documents).select(
        id_col, normalized(F.col(text_col)).alias("_norm")
    ).select(id_col, _shingle_expr(F.col("_norm"), k).alias(out_col))


def minhash_signature(sh: Column, n_seeds: int = DEFAULT_SEEDS) -> Column:
    """Array of n_seeds minhashes.

    One md5 per (seed-group, shingle) yields FOUR independent 32-bit
    minhash functions (8 hex chars each) — 12 seeds cost 3 md5 passes
    instead of 12 (md5 dominates the signature cost). Seed j uses
    substr(md5(group_j ':' shingle), 1 + 8*(j mod 4), 8); minima are
    lexicographic over fixed-width hex, portable to any engine with md5.
    """
    # constants are bound via factory-function closures, NEVER lambda
    # default args: pyspark treats a two-parameter lambda as (element,
    # index) and silently binds the "default" to the array index.
    def group_hash(g: int) -> Column:
        return F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{g}:"), s)))

    def sub_min(arr: Column, off: int) -> Column:
        return F.array_min(F.transform(arr, lambda h: F.substring(h, off, 8)))

    n_groups = (n_seeds + _SUBHASHES_PER_MD5 - 1) // _SUBHASHES_PER_MD5
    group_hashes = [group_hash(g) for g in range(n_groups)]
    return F.array(
        *[
            sub_min(
                group_hashes[j // _SUBHASHES_PER_MD5],
                1 + 8 * (j % _SUBHASHES_PER_MD5),
            )
            for j in range(n_seeds)
        ]
    )


def with_minhash(
    sh_df: DataFrame,
    sh_col: str = "sh",
    out_col: str = "sig",
    n_seeds: int = DEFAULT_SEEDS,
) -> DataFrame:
    """(…, sh) → (…, sig): signature with the md5 group arrays
    MATERIALIZED as projected columns first.

    The expression form (minhash_signature) re-evaluates each group's md5
    transform once per referencing sub-seed — 4× the md5 work; a
    projection boundary makes each group hash compute once (CollapseProject
    leaves multi-referenced non-cheap aliases alone)."""
    n_groups = (n_seeds + _SUBHASHES_PER_MD5 - 1) // _SUBHASHES_PER_MD5

    def group_hash(g: int) -> Column:
        return F.transform(
            F.col(sh_col), lambda s: F.md5(F.concat(F.lit(f"{g}:"), s))
        )

    def sub_min(arr: Column, off: int) -> Column:
        return F.array_min(F.transform(arr, lambda h: F.substring(h, off, 8)))

    staged = sh_df.select(
        "*", *[group_hash(g).alias(f"_gh{g}") for g in range(n_groups)]
    )
    sig = F.array(
        *[
            sub_min(
                F.col(f"_gh{j // _SUBHASHES_PER_MD5}"),
                1 + 8 * (j % _SUBHASHES_PER_MD5),
            )
            for j in range(n_seeds)
        ]
    )
    return staged.select(*sh_df.columns, sig.alias(out_col))


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
    sig = with_minhash(with_shingles(documents, text_col, k), n_seeds=n_seeds).select(
        "doc_id", "sig"
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


def with_winnow_fingerprints(
    documents: DataFrame,
    text_col: str = "text",
    k: int = DEFAULT_SHINGLE,
    window: int = 4,
    id_col: str = "doc_id",
    out_col: str = "fps",
) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al., SIGMOD 2003): hash every
    ORDERED k-gram (rolling window of the canonical text), then keep the
    minimum hash of each length-``window`` run; distinct minima are the
    document's fingerprint set. Two docs sharing a sufficiently long
    substring share a fingerprint — the rolling-hash dedup primitive.

    Staged projections materialize the norm text and the gram-hash array
    before any HOF references them (per-element re-evaluation otherwise).
    """
    normed = _ensure_parallelism(documents).select(
        id_col, normalized(F.col(text_col)).alias("_norm")
    )
    grams = normed.select(
        id_col,
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.length("_norm") - F.lit(k - 1), F.lit(1))
            ),
            lambda i: F.md5(F.substring(F.col("_norm"), i, k)),
        ).alias("_h"),
    )
    n_windows = F.greatest(F.size("_h") - F.lit(window - 1), F.lit(1))
    return grams.select(
        id_col,
        F.array_sort(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n_windows),
                    lambda j: F.array_min(F.slice(F.col("_h"), j, window)),
                )
            )
        ).alias(out_col),
    )


def near_dup_pairs(
    documents: DataFrame,
    text_col: str = "text",
    threshold: float = 0.7,
    k: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """MinHash-LSH candidates verified by exact Jaccard.

    The shingle frame is persisted (memory, spill to disk): it feeds the
    signature/banding pass AND both sides of the verify join — without
    the persist each reference re-runs scan+normalize+shingle (three full
    passes measured). The persist is the same disk volume a shuffle of
    the shingles would cost, amortized across all three consumers.
    """
    from pyspark import StorageLevel

    sh = with_shingles(documents, text_col, k).persist(StorageLevel.MEMORY_AND_DISK)
    rows_per_band = DEFAULT_SEEDS // DEFAULT_BANDS
    sig = with_minhash(sh).select("doc_id", "sig")
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(DEFAULT_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.band_hash")
    a, b = bands.alias("a"), bands.alias("b")
    candidates = (
        a.join(b, on=["band", "band_hash"], how="inner")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # explicit partition counts on the verify joins: candidate rows are
    # byte-small but each costs an array_intersect over shingle arrays, so
    # AQE's byte-based coalescing would run the verify on ~3 tasks
    # (measured); user-specified repartitions are exempt from coalescing
    n_parts = int(documents.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    out = (
        candidates.repartition(n_parts, "doc_a")
        .join(
            sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"),
            on="doc_a",
        )
        .repartition(n_parts, "doc_b")
        .join(
            sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"),
            on="doc_b",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


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
