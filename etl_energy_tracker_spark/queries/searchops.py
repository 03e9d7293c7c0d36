"""Search-index construction over the document corpus — the indexing
side of the retrieval stack (textops.py's TF-IDF / BM25 are the
scoring side).

``inverted_index_postings`` builds the classic token -> sorted posting
list with per-document term frequency, for the highest-df tokens.
Posting lists are built with sort_array(collect_list(...)) so the
array content is deterministic regardless of shuffle order — the
invariant that makes an index build reproducible across cluster
sizes.

Scale notes: one token explode (map-side), one (token, doc) count
aggregate, one token-level list aggregate. Posting lists for stop-like
tokens are the skew risk at 100 TB — production indexes shard a hot
token's postings into fixed-size blocks (doc-id ranges) so no single
reducer holds an unbounded list; the df ranking computed here is
exactly the signal used to pick which tokens get sharded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .catalog import register

_TOP_DF = 10  # index the 10 highest-document-frequency tokens


@register(
    "inverted_index_postings",
    oracle=f"""
    WITH tf AS (
        SELECT tok, doc_id, COUNT(*) AS tf
        FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
            FROM documents
        )
        GROUP BY tok, doc_id
    ),
    df AS (
        SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
        ORDER BY df DESC, tok LIMIT {_TOP_DF}
    )
    SELECT tf.tok, df.df,
           array_to_string(list_sort(list(tf.doc_id * 1000000 + tf.tf)), ',')
               AS postings
    FROM tf JOIN df ON tf.tok = df.tok
    GROUP BY tf.tok, df.df
    """,
    tags=("search",),
    doc="Inverted-index build for the top-df tokens: token -> document "
    "frequency + sorted posting list, each posting packing (doc_id, "
    "term frequency) into one BIGINT (doc_id*1e6 + tf) so the list is "
    "a flat sorted integer list — the compact, merge-friendly layout "
    "real indexes use before delta/varint encoding. sort_array over "
    "collect_list makes the output independent of shuffle order; the "
    "sorted list is emitted comma-joined as one string column so the "
    "result is canonicalizable by row-hash tooling (nested arrays "
    "aren't hashable in a pandas sort).",
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    tf = (
        docs.select(
            # explode_outer + notnull: plain explode's synthesized
            # size()>0 filter would re-run the split per row
            "doc_id",
            F.explode_outer(F.split(F.trim("text"), r"\s+")).alias("tok"),
        )
        .where(F.col("tok").isNotNull())
        .groupBy("tok", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = (
        tf.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), "tok")
        .limit(_TOP_DF)
    )
    return (
        tf.join(F.broadcast(df), "tok")
        .groupBy("tok", "df")
        .agg(
            F.concat_ws(
                ",",
                F.sort_array(
                    F.collect_list(F.col("doc_id") * 1000000 + F.col("tf"))
                ),
            ).alias("postings")
        )
    )


# ------------------------------------------- hybrid retrieval (RRF)

_RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
_RRF_TOPN = 20  # per-system candidate depth
_RRF_OUT = 10  # fused result size


def _hybrid_oracle() -> str:
    from .catalog import CATALOG
    from .llmprep import _COS64_AB

    bm25 = CATALOG["bm25_topk_docs"].oracle
    cos = _COS64_AB.format(a="e.embedding", b="qv")
    return f"""
    WITH bm AS ({bm25}),
    lex AS (
        SELECT doc_id, CAST(SUM(score_scaled) AS BIGINT) AS lex_score
        FROM bm GROUP BY doc_id
    ),
    lexr AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY lex_score DESC, doc_id) AS r_lex
        FROM lex
        ORDER BY lex_score DESC, doc_id LIMIT {_RRF_TOPN}
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    sem AS (
        SELECT e.vec_id AS doc_id, {cos} AS cos
        FROM embeddings e, q WHERE e.vec_id <> 0
    ),
    semr AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS r_sem
        FROM sem
        ORDER BY cos DESC, doc_id LIMIT {_RRF_TOPN}
    ),
    fused AS (
        SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
               l.r_lex AS r_lex, s.r_sem AS r_sem,
               COALESCE(1000000 // ({_RRF_K} + l.r_lex), 0)
                   + COALESCE(1000000 // ({_RRF_K} + s.r_sem), 0) AS rrf_micro
        FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id
    )
    SELECT doc_id, r_lex, r_sem, rrf_micro FROM fused
    ORDER BY rrf_micro DESC, doc_id LIMIT {_RRF_OUT}
    """


@register(
    "hybrid_rrf_fusion",
    oracle=_hybrid_oracle(),
    tags=("text", "vector", "search"),
    doc="Hybrid retrieval via reciprocal-rank fusion: the BM25 lexical "
    "ranking (summed integer-scaled term scores) and the embedding "
    "cosine ranking (query = vec_id 0) are each cut to their top-20, "
    "then fused with the standard RRF formula 1/(60+rank) in exact "
    "integer micro-units and re-ranked. The fusion step every hybrid "
    "search stack runs — lexical recall + semantic recall, neither "
    "score scale trusted, only ranks. Scale: each system's ranking is "
    "its own top-k (bounded output); the fusion join touches only "
    "2*top-k rows, so fusion cost is independent of corpus size.",
)
def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.similarity import dot
    from .textops import bm25_topk_docs

    bm = bm25_topk_docs(spark, sf_dir)
    lex = bm.groupBy("doc_id").agg(F.sum("score_scaled").alias("lex_score"))
    lexr = (
        lex.withColumn(
            "r_lex", F.row_number().over(W.orderBy(F.desc("lex_score"), "doc_id"))
        )
        .where(F.col("r_lex") <= _RRF_TOPN)
        .select("doc_id", "r_lex")
    )
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    cos = F.round(
        F.try_divide(
            dot(F.col("embedding"), F.col("qv")),
            F.sqrt(dot(F.col("embedding"), F.col("embedding")))
            * F.sqrt(dot(F.col("qv"), F.col("qv"))),
        ),
        6,
    )
    sem = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(F.col("vec_id").alias("doc_id"), cos.alias("cos"))
    )
    semr = (
        sem.withColumn(
            "r_sem", F.row_number().over(W.orderBy(F.desc("cos"), "doc_id"))
        )
        .where(F.col("r_sem") <= _RRF_TOPN)
        .select("doc_id", "r_sem")
    )
    fused = lexr.join(semr, "doc_id", "full_outer").select(
        "doc_id",
        "r_lex",
        "r_sem",
        (
            F.coalesce(
                F.expr(f"1000000 DIV ({_RRF_K} + r_lex)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"1000000 DIV ({_RRF_K} + r_sem)"), F.lit(0)
            )
        ).alias("rrf_micro"),
    )
    return fused.orderBy(F.desc("rrf_micro"), "doc_id").limit(_RRF_OUT)


# ------------------------------------------ posting-list compression


@register(
    "delta_encode_postings",
    oracle=f"""
    WITH tf AS (
        SELECT tok, doc_id, COUNT(*) AS tf
        FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
            FROM documents
        )
        GROUP BY tok, doc_id
    ),
    df AS (
        SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
        ORDER BY df DESC, tok LIMIT {_TOP_DF}
    ),
    gaps AS (
        SELECT tf.tok, df.df,
               tf.doc_id - COALESCE(lag(tf.doc_id) OVER (
                   PARTITION BY tf.tok ORDER BY tf.doc_id), 0) AS gap
        FROM tf JOIN df ON tf.tok = df.tok
    ),
    sized AS (
        SELECT tok, df, gap,
               CASE WHEN gap < 128 THEN 1
                    WHEN gap < 16384 THEN 2
                    WHEN gap < 2097152 THEN 3
                    WHEN gap < 268435456 THEN 4
                    ELSE 5 END AS nb
        FROM gaps
    )
    SELECT tok, df,
           CAST(SUM(nb) AS BIGINT) AS varint_bytes,
           df * 8 AS raw_bytes,
           MAX(gap) AS max_gap,
           CAST(SUM(nb) * 1000000 // (df * 8) AS BIGINT) AS compressed_ppm
    FROM sized GROUP BY tok, df
    """,
    tags=("search", "layout"),
    doc="Posting-list delta + varint sizing for the top-df tokens: "
    "doc-id gaps (delta from the previous posting, first delta from "
    "0) and the exact LEB128 byte count per gap, aggregated into the "
    "compressed-vs-raw budget every search index build computes "
    "before choosing a posting encoding. Delta-gap + varint is the "
    "standard layout (Lucene, ES) — small gaps dominate for high-df "
    "tokens, so the hottest lists compress best; the compressed_ppm "
    "column makes the effect measurable per token. Scale: one token "
    "explode, one (tok,doc) aggregate, one per-token window over "
    "df-bounded postings — the window partitions by token, so a hot "
    "token's list is one partition (the same skew the sharded-"
    "postings note on inverted_index_postings addresses).",
)
def delta_encode_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    tf = (
        docs.select(
            # explode_outer + notnull: plain explode's synthesized
            # size()>0 filter would re-run the split per row
            "doc_id",
            F.explode_outer(F.split(F.trim("text"), r"\s+")).alias("tok"),
        )
        .where(F.col("tok").isNotNull())
        .groupBy("tok", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = (
        tf.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), "tok")
        .limit(_TOP_DF)
    )
    w = W.partitionBy("tok").orderBy("doc_id")
    gaps = (
        tf.join(F.broadcast(df), "tok")
        .select(
            "tok",
            "df",
            (
                F.col("doc_id")
                - F.coalesce(F.lag("doc_id").over(w), F.lit(0))
            ).alias("gap"),
        )
    )
    nb = (
        F.when(F.col("gap") < 128, 1)
        .when(F.col("gap") < 16384, 2)
        .when(F.col("gap") < 2097152, 3)
        .when(F.col("gap") < 268435456, 4)
        .otherwise(5)
    )
    return (
        gaps.withColumn("nb", nb)
        .groupBy("tok", "df")
        .agg(
            F.sum("nb").cast("bigint").alias("varint_bytes"),
            (F.col("df") * 8).alias("raw_bytes"),
            F.max("gap").alias("max_gap"),
            F.expr("CAST(SUM(nb) * 1000000 DIV (df * 8) AS BIGINT)").alias(
                "compressed_ppm"
            ),
        )
    )
