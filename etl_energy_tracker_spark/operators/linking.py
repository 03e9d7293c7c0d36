"""UOF↔UP entity linking (vinculación) — Spark rendering of
UOFUPLinkingAlgorithm (vinculacion/_linking_algorithm.py:542-728).

The reference matches market entities by md5-hashing each entity's
ordered non-zero hourly volume profile across markets 1-4, joining UP
hashes to UOF hashes, resolving ambiguity by exact-name match, adding
a second round on the previous day for leftovers, and dropping any UOF
linked to more than one UP.

Spark-first shape — everything is one DataFrame program:
- profile build (A5): groupBy(entity) + array_sort(collect_list(struct))
  + md5(concat_ws) — one shuffle per side, deterministic ordering via
  explicit (id_mercado, hour) sort keys instead of pandas row order
- hash match (J5): inner join on profile_hash
- ambiguity classification: window count per hash (J7's count idiom)
- name resolution (J6): string-equality filter + anti-join remainder
- conflict removal (J7): window count per uof, keep cnt==1
- round 2: anti-join carryover re-runs the same steps on the previous
  day's profiles for still-unmatched UPs

The reference's asyncio hashing pool (_linking_algorithm.py:278)
disappears — parallelism is Spark's. Float-format compatibility:
volumes are rounded to 2 decimals and pinned to DECIMAL(18,2) strings
before hashing (SURVEY §7 hard part c).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

LINKING_MARKET_IDS = (1, 2, 3, 4)


def prepare_volumes(df: DataFrame, entity_col: str, target_date: str) -> DataFrame:
    """Linking prep (_linking_algorithm.py:82-173): Madrid-local-day
    filter, drop 0/NA, round(2), sum per (entity, local hour,
    id_mercado)."""
    from ..timegrid import utc_to_madrid_date

    local_ts = F.from_utc_timestamp("datetime_utc", "Europe/Madrid")
    return (
        df.where(F.col("id_mercado").isin(list(LINKING_MARKET_IDS)))
        .where(utc_to_madrid_date(F.col("datetime_utc")) == F.to_date(F.lit(target_date)))
        .where(F.col("volumenes").isNotNull() & (F.col("volumenes") != 0))
        .groupBy(
            F.col(entity_col).alias("entity"),
            F.hour(local_ts).alias("hour"),
            F.col("id_mercado"),
        )
        .agg(F.round(F.sum("volumenes"), 2).alias("vol"))
    )


def profile_hashes(prepared: DataFrame) -> DataFrame:
    """A5 (_linking_algorithm.py:240-280): per entity, non-zero volumes
    ordered by (id_mercado, hour), comma-joined, md5-hashed."""
    item = F.struct(
        F.col("id_mercado").cast("int").alias("id_mercado"),
        F.col("hour").alias("hour"),
        F.col("vol").cast("decimal(18,2)").cast("string").alias("v"),
    )
    return (
        prepared.where(F.col("vol") != 0)
        .groupBy("entity")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list(item)), lambda x: x.getField("v")
                    ),
                )
            ).alias("profile_hash")
        )
    )


def match_round(up_hashes: DataFrame, uof_hashes: DataFrame) -> tuple[DataFrame, DataFrame]:
    """J5 + J6: returns (matched pairs, still-ambiguous UPs).

    Exact matches are hash pairs where both sides are unique for that
    hash; ambiguous hash groups resolve by up==uof name equality
    (_linking_algorithm.py:331-424)."""
    up = up_hashes.select(F.col("entity").alias("up"), "profile_hash")
    uof = uof_hashes.select(F.col("entity").alias("uof"), "profile_hash")
    cand = up.join(uof, "profile_hash")
    w = W.partitionBy("profile_hash")
    cand = cand.withColumn("n_pairs", F.count(F.lit(1)).over(w))

    exact = cand.where(F.col("n_pairs") == 1)
    ambiguous = cand.where(F.col("n_pairs") > 1)
    by_name = ambiguous.where(F.col("up") == F.col("uof"))
    matched = exact.unionByName(by_name).select("up", "uof")

    unresolved = (
        up.join(matched.select("up"), "up", "left_anti").select("up", "profile_hash")
    )
    return matched, unresolved


def remove_conflicts(matched: DataFrame) -> DataFrame:
    """J7 (_linking_algorithm.py:426-466): drop every match for a UOF
    linked to >1 UP."""
    w = W.partitionBy("uof")
    return (
        matched.withColumn("_n", F.count(F.lit(1)).over(w))
        .where(F.col("_n") == 1)
        .drop("_n")
    )


def link_uofs_to_ups(
    up_day1: DataFrame,
    uof_day1: DataFrame,
    up_day0: DataFrame | None = None,
    uof_day0: DataFrame | None = None,
) -> DataFrame:
    """Two-round linking (the full algorithm,
    _linking_algorithm.py:542-728). Inputs are *prepared* volume frames
    (see prepare_volumes) keyed by `entity`; day0 frames enable round 2
    on the previous day for UPs still unmatched after round 1.

    Returns (up, uof, date_updated).
    """
    matched, unresolved = match_round(profile_hashes(up_day1), profile_hashes(uof_day1))

    if up_day0 is not None and uof_day0 is not None:
        up0 = profile_hashes(up_day0).join(
            F.broadcast(unresolved.select(F.col("up").alias("entity"))), "entity", "left_semi"
        )
        m2, _ = match_round(up0, profile_hashes(uof_day0))
        matched = matched.unionByName(m2)

    final = remove_conflicts(matched.dropDuplicates(["up", "uof"]))
    return final.withColumn("date_updated", F.current_date())
