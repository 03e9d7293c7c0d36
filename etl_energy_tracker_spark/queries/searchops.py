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
           list_sort(list(tf.doc_id * 1000000 + tf.tf)) AS postings
    FROM tf JOIN df ON tf.tok = df.tok
    GROUP BY tf.tok, df.df
    """,
    tags=("search",),
    doc="Inverted-index build for the top-df tokens: token -> document "
    "frequency + sorted posting list, each posting packing (doc_id, "
    "term frequency) into one BIGINT (doc_id*1e6 + tf) so the list is "
    "a flat sorted integer array — the compact, merge-friendly layout "
    "real indexes use before delta/varint encoding. sort_array over "
    "collect_list makes the output independent of shuffle order.",
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    tf = (
        docs.select(
            "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
        )
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
            F.sort_array(
                F.collect_list(F.col("doc_id") * 1000000 + F.col("tf"))
            ).alias("postings")
        )
    )
