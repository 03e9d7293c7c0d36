"""Entity-linking (vinculación) operator surface mapped onto testdata.

The reference's linking algorithm (vinculacion/_linking_algorithm.py)
matches UP↔UOF entities by md5-hashing their ordered non-zero volume
profiles, then joining on hash and resolving ambiguity/conflicts.
Here the profile-hash build (A5) and the hash-equality match (J5) +
conflict classification (J7) run over `events` (entity = user_id);
the full two-round algorithm with market-shaped fixtures lives in
``operators/linking.py`` + tests.

Hash compatibility: floats are pinned to DECIMAL(12,2) *strings* on
both engines before md5, sorted by an explicit (ts, event_id) key —
the reference's deterministic-ordering semantic
(_linking_algorithm.py:240-280) without relying on row order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .catalog import register

# shared profile-building SQL (DuckDB side): ordered non-zero values
# as fixed-scale decimal strings, comma-joined, md5-hashed.
_PROFILE_CTE = """
    SELECT user_id,
           md5(string_agg(CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR), ','
               ORDER BY ts, event_id)) AS profile_hash
    FROM events
    WHERE value IS NOT NULL AND value <> 0.0
    GROUP BY user_id
"""


def _profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    cleaned = ev.where(F.col("value").isNotNull() & (F.col("value") != 0.0))
    # deterministic ordering via array_sort over an explicit sort key —
    # collect_list order is otherwise partition-dependent.
    item = F.struct(
        F.col("ts").alias("ts"),
        F.col("event_id").alias("event_id"),
        F.col("value").cast("decimal(12,2)").cast("string").alias("v"),
    )
    return cleaned.groupBy("user_id").agg(
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(item)), lambda x: x.getField("v")
                ),
            )
        ).alias("profile_hash")
    )


@register(
    "linking_profile_hash",
    oracle=f"""
    {_PROFILE_CTE}
    """,
    tags=("linking", "hash", "aggregate"),
    doc="A5 per-entity ordered non-zero profile md5 "
    "(_linking_algorithm.py:240-280): groupBy + array_sort(collect_list) "
    "+ md5(concat_ws) — one shuffle, no driver loop.",
)
def linking_profile_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _profiles(spark, sf_dir)


@register(
    "linking_hash_match",
    oracle=f"""
    WITH up_side AS ({_PROFILE_CTE}),
    uof_side AS (
        SELECT user_id + 100000 AS uof_id, profile_hash
        FROM ({_PROFILE_CTE})
    ),
    matched AS (
        SELECT u.user_id AS up_id, o.uof_id, u.profile_hash
        FROM up_side u JOIN uof_side o USING (profile_hash)
    )
    SELECT up_id, uof_id, profile_hash,
           COUNT(*) OVER (PARTITION BY profile_hash) AS n_candidates
    FROM matched
    """,
    tags=("linking", "join", "window"),
    doc="J5/J7 hash-equality entity match + ambiguity classification: join "
    "UP and UOF profile hashes, count candidates per hash via window "
    "(_linking_algorithm.py:331-378,426-466). UOF side synthesised as "
    "entity_id+100000 so every match is verifiable.",
)
def linking_hash_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    up = _profiles(spark, sf_dir).withColumnRenamed("user_id", "up_id")
    uof = (
        _profiles(spark, sf_dir)
        .select((F.col("user_id") + 100000).alias("uof_id"), "profile_hash")
    )
    matched = up.join(uof, "profile_hash").select("up_id", "uof_id", "profile_hash")
    return matched.withColumn(
        "n_candidates", F.count(F.lit(1)).over(W.partitionBy("profile_hash"))
    )
