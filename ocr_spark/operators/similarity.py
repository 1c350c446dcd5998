"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exactness baseline, all JVM-native
  (`zip_with` + `aggregate`, no Python);
* LSH-bucketed variant (random-hyperplane signs) — the scale path: the
  probe join is keyed on the hyperplane signature, so candidate
  generation never cross-joins the corpus.

Hyperplanes are derived deterministically from md5 — no RNG state, so any
engine (and any rerun) regenerates identical planes.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector.

    The (small) query set is broadcast and the corpus is scanned once;
    ranking is a per-query window.  Ties break on neighbor id; similarity
    is rounded to 6 dp so results are hash-stable across engines.
    """
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    c = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = q.join(c, F.col("query_id") != F.col("neighbor_id"), "inner").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 bytes."""
    vals: list[float] = []
    counter = 0
    while len(vals) < dim:
        digest = hashlib.md5(f"plane:{plane_idx}:{counter}".encode()).digest()
        for i in range(0, 16, 2):
            if len(vals) >= dim:
                break
            raw = int.from_bytes(digest[i : i + 2], "big")
            vals.append((raw - 32767.5) / 32767.5)
        counter += 1
    return vals


def signature(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign pattern of the vector against n_planes fixed hyperplanes."""
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, p)])
        bits.append(F.when(dot(vec, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the hyperplane signature bucket,
    then exact cosine ranks within the bucket.  At 10^12 scale the bucket
    join replaces the corpus scan per query."""
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        signature(F.col(vec_col), dim, n_planes).alias("sig"),
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            signature(F.col(vec_col), dim, n_planes).alias("sig"),
        )
    )
    scored = (
        q.join(c, on="sig", how="inner")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )
