"""Graph analytics over relational data — iterative algorithms
expressed as bounded join/aggregate rounds (the near_dup_clusters
connected-components operator in operators/dedup.py is the other
member of this family).

``pagerank_bipartite`` runs PageRank on the customer<->supplier graph
induced by orders x lineitem, with ALL arithmetic in scaled integers:
score mass starts at 10^6 per vertex, the damping contribution is
floor(score * 85 / (100 * outdeg)) and the teleport term floor(15 *
10^6 / 100) — every value is an exact BIGINT on both engines, so a
3-iteration unrolled DuckDB oracle reproduces the Spark loop bit for
bit. (A float PageRank would diverge across engines through
sum-ordering; the integer formulation is the determinism trick, and
at 100 TB it is also the overflow-safe fixed-point form.)

Scale notes: each iteration is one shuffle join (edges x scores on
src) + one aggregate (group by dst) — the standard Pregel-on-
DataFrames shape. Iterations are a fixed small count driven from the
driver; for long chains you checkpoint every few rounds to cut
lineage (as operators/dedup.py does for connected components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .catalog import register

_SCALE = 1_000_000
_ITER = 3
_TELEPORT = 15 * _SCALE // 100  # 150000


def _duck_iter(k: int) -> str:
    return f"""
    s{k + 1} AS (
        SELECT verts.v,
               {_TELEPORT} + COALESCE(contrib.c, 0) AS score
        FROM verts
        LEFT JOIN (
            SELECT e.dst AS v,
                   CAST(SUM((s.score * 85) // (100 * d.deg)) AS BIGINT) AS c
            FROM edges e
            JOIN s{k} s ON s.v = e.src
            JOIN deg d ON d.v = e.src
            GROUP BY e.dst
        ) contrib ON contrib.v = verts.v
    )"""


@register(
    "pagerank_bipartite",
    oracle=f"""
    WITH pairs AS (
        SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (
        SELECT 'c' || CAST(ck AS VARCHAR) AS src, 's' || CAST(sk AS VARCHAR) AS dst FROM pairs
        UNION ALL
        SELECT 's' || CAST(sk AS VARCHAR) AS src, 'c' || CAST(ck AS VARCHAR) AS dst FROM pairs
    ),
    verts AS (SELECT DISTINCT src AS v FROM edges),
    deg AS (SELECT src AS v, COUNT(*) AS deg FROM edges GROUP BY src),
    s0 AS (SELECT v, CAST({_SCALE} AS BIGINT) AS score FROM verts),
    {",".join(_duck_iter(k) for k in range(_ITER))}
    SELECT v, score FROM s{_ITER}
    """,
    tags=("graph",),
    doc="PageRank over the customer<->supplier bipartite graph from "
    "orders x lineitem, 3 iterations, fixed-point integer arithmetic "
    "(mass 10^6/vertex, floor-div damping) so both engines agree "
    "exactly — see module docstring. One shuffle join + one aggregate "
    "per iteration, the Pregel-on-DataFrames shape; the edge list is "
    "reused across iterations (cache it at scale).",
)
def pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    pairs = (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    cv = F.concat(F.lit("c"), F.col("ck").cast("string"))
    sv = F.concat(F.lit("s"), F.col("sk").cast("string"))
    edges = (
        pairs.select(cv.alias("src"), sv.alias("dst"))
        .unionByName(pairs.select(sv.alias("src"), cv.alias("dst")))
    )
    # a handful of re-uses below: materialize the (small) edge list once
    edges = edges.localCheckpoint(eager=True)
    verts = edges.select(F.col("src").alias("v")).distinct()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    scores = verts.select("v", F.lit(_SCALE).cast("long").alias("score"))
    for _ in range(_ITER):
        contrib = (
            edges.join(scores, edges.src == scores.v)
            .join(deg, edges.src == deg.src)
            .select(
                F.col("dst").alias("cv"),
                F.expr("(score * 85) div (100 * deg)").alias("part"),
            )
            .groupBy("cv")
            .agg(F.sum("part").alias("c"))
        )
        scores = (
            verts.join(contrib, verts.v == contrib.cv, "left")
            .select(
                "v",
                (F.lit(_TELEPORT) + F.coalesce("c", F.lit(0))).alias("score"),
            )
        )
    return scores
