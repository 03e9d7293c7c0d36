"""Similarity search over embedding columns (array<float>).

Two paths:
- ``brute_force_topk``: exact cosine top-k. The query set broadcasts;
  each partition scores its corpus slice independently (one cross join
  against a tiny side, then a per-query window cut). O(Q·N) work but
  zero corpus shuffle — the right baseline up to ~10⁴ queries.
- ``lsh_topk``: random-hyperplane LSH. Deterministic pseudo-random
  planes derived from the portable hash (no RNG state to ship);
  vectors bucket by sign pattern, the exact rescoring runs within
  buckets only. At 100 TB this is the shape that works: signature
  build is map-only, the join key is the bucket id, and recall/cost
  trades via n_planes (coarser buckets = more recall, more work).
An IVF variant would cluster on a sampled k-means codebook; with the
same "bucket then rescore" shape — LSH chosen here because it needs
no training pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.hashing import MOD


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    q = queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(corpus_id).alias("corpus_id"), F.col(vec_col).alias("cv"))
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine", F.round(cosine(F.col("qv"), F.col("cv")), 6)
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "corpus_id")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("query_id", "corpus_id", "cosine")
    )


def plane_weight(plane: int, dim: int) -> int:
    """Deterministic pseudo-random weight in [-1000, 1000] for
    (plane, dimension): the portable polynomial hash of 'p{plane}d{dim}'
    — the DuckDB oracle derives the identical values with its SQL fold,
    so the hyperplanes are engine-portable with no RNG state."""
    acc = 7
    for ch in f"p{plane}d{dim}":
        acc = (acc * 31 + ord(ch)) % MOD
    return (acc % 2001) - 1000


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    out: str = "bucket",
    dim: int = 64,
) -> DataFrame:
    """Sign pattern of n_planes hyperplane projections → bucket id.

    Plane weights are precomputed on the driver and embedded as array
    literals (constant-folded into codegen) — re-deriving the hash per
    row per dimension would cost ~n_planes·dim fold evaluations per
    vector for values that never change."""
    terms = []
    for p in range(n_planes):
        ws = ", ".join(f"{plane_weight(p, d)}.0D" for d in range(dim))
        # slice to the vector's size so shorter embeddings zip cleanly
        proj = (
            f"aggregate(zip_with({vec_col}, slice(array({ws}), 1, size({vec_col})), "
            f"(x, w) -> CAST(x AS DOUBLE) * w), 0.0D, (acc, v) -> acc + v)"
        )
        terms.append(f"CASE WHEN ({proj}) >= 0 THEN shiftleft(1L, {p}) ELSE 0L END")
    bucket = " + ".join(terms)
    return df.withColumn(out, F.expr(bucket))


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: join on LSH bucket, exact cosine within."""
    q = with_lsh_bucket(
        queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv")),
        "qv",
        n_planes,
    )
    c = with_lsh_bucket(
        corpus.select(F.col(corpus_id).alias("corpus_id"), F.col(vec_col).alias("cv")),
        "cv",
        n_planes,
    )
    scored = c.join(F.broadcast(q), "bucket").withColumn(
        "cosine", F.round(cosine(F.col("qv"), F.col("cv")), 6)
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "corpus_id")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("query_id", "corpus_id", "cosine")
    )
