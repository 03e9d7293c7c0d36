"""Deduplication operator suite for training-data pipelines
(BASELINE.json north star): exact, keyed keep-last, n-gram Jaccard,
MinHash+LSH, and SimHash — all as pure DataFrame programs.

Scale design:
- exact: shuffle on a 128-bit content hash, never on the payload.
- keep-last: window over explicit arrival order (no stable row order
  in a distributed engine).
- MinHash+LSH: signature build is embarrassingly parallel (array
  expressions per row); candidate generation joins on (band, band
  hash) buckets, so the shuffle is bounded by bucket collisions, not
  O(n²). The exact Jaccard verify runs only on candidates.
- hashes are the engine-portable polynomial fold (functions/hashing.py)
  so results are reproducible across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.hashing import MOD, perm_a, perm_b, spark_charhash

# ---------------------------------------------------------------------------
# exact + keep-last
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep the min-id row per exact content (hash-groupBy)."""
    w = W.partitionBy(F.md5(F.col(content_col))).orderBy(id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def keep_last(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Keyed keep-last (reference K3 dedup: processed_file_utils.py:51-67)."""
    w = W.partitionBy(*keys).orderBy(F.desc(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# shingling + MinHash + LSH
# ---------------------------------------------------------------------------


def with_shingles(
    df: DataFrame, text_col: str, n: int = 3, out: str = "shingles"
) -> DataFrame:
    """Distinct word n-gram shingles as an array column."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    df = df.withColumn("_toks", toks)
    expr = (
        f"array_distinct(transform(sequence(1, greatest(size(_toks) - {n - 1}, 0)), "
        f"i -> concat_ws(' ', slice(_toks, i, {n}))))"
    )
    return df.withColumn(out, F.expr(expr)).drop("_toks")


def _shingle_hash_expr(arr: str) -> str:
    # polynomial hash of each shingle, computed once per shingle
    return f"transform({arr}, s -> {spark_charhash('s')})"


def with_minhash_signature(
    df: DataFrame, shingle_col: str = "shingles", k: int = 16, out: str = "signature"
) -> DataFrame:
    """k-permutation MinHash signature (array<bigint>). hash_i(x) =
    (a_i·h(x)+b_i) mod M with fixed odd constants — deterministic and
    engine-portable."""
    hashed = f"transform({shingle_col}, s -> {spark_charhash('s')})"
    perms = ", ".join(
        f"array_min(transform(_sh, h -> ({perm_a(i)}L * h + {perm_b(i)}L) % {MOD}L))"
        for i in range(k)
    )
    return (
        df.withColumn("_sh", F.expr(hashed))
        .withColumn(out, F.expr(f"array({perms})"))
        .drop("_sh")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    signature_col: str = "signature",
    bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: equal band-slices become join buckets; output is
    candidate (id_a < id_b) pairs with their estimated Jaccard
    (fraction of equal signature positions)."""
    banded = (
        df.select(F.col(id_col).alias("id"), F.col(signature_col).alias("sig"))
        .select(
            "id",
            "sig",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {bands - 1}), b -> "
                    f"struct(b AS band, "
                    f"concat_ws(',', slice(sig, b * {rows_per_band} + 1, {rows_per_band})) AS bhash))"
                )
            ).alias("bb"),
        )
        .select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bhash").alias("bhash"))
    )

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.expr(
        "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / size(sig_a)"
    )
    return pairs.withColumn("est_jaccard", est).drop("sig_a", "sig_b")


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → signature → banded
    candidates → exact Jaccard verify on candidates only."""
    sh = with_shingles(df.select(id_col, text_col), text_col)
    sig = with_minhash_signature(sh, k=k)
    cands = lsh_candidate_pairs(sig, id_col, bands=bands, rows_per_band=k // bands)

    shing = sh.select(F.col(id_col).alias("id"), F.col("shingles"))
    j = (
        cands.join(shing.withColumnRenamed("id", "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(shing.withColumnRenamed("id", "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.expr(
                "size(array_intersect(sh_a, sh_b)) / size(array_union(sh_a, sh_b))"
            ),
        )
        .drop("sh_a", "sh_b")
    )
    return j.where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def with_simhash(
    df: DataFrame, text_col: str, bits: int = 32, out: str = "simhash"
) -> DataFrame:
    """Token-level SimHash fingerprint: bit b is set when the sum of
    ±1 votes (per token, from bit b of the token's portable hash) is
    positive. Near-dup docs differ in few bits (Hamming distance)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    hashed = f"transform(_toks, t -> {spark_charhash('t')})"
    bit_terms = (
        f"transform(sequence(0, {bits - 1}), b -> "
        f"CASE WHEN aggregate(_th, 0L, (acc, h) -> acc + (h div shiftleft(1L, b)) % 2 * 2 - 1) > 0 "
        f"THEN shiftleft(1L, b) ELSE 0L END)"
    )
    return (
        df.withColumn("_toks", toks)
        .withColumn("_th", F.expr(hashed))
        .withColumn(out, F.expr(f"aggregate({bit_terms}, 0L, (acc, x) -> acc + x)"))
        .drop("_toks", "_th")
    )


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3, bits: int = 32
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, bucketed on the
    upper half of the fingerprint so the join is not O(n²) (docs within
    max_hamming of each other usually share the coarse prefix; a full
    multi-probe table trades recall/cost — this is the scale shape)."""
    sh = with_simhash(df.select(id_col, text_col), text_col, bits=bits).select(
        F.col(id_col).alias("id"), "simhash"
    )
    half = bits // 2
    sh = sh.withColumn("bucket", F.expr(f"simhash div shiftleft(1L, {half})"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = a.join(
        b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id"))
    )
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return pairs.select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        ham.alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)
