"""Entity-dimension tracking (SCD-style maintenance of UP/UOF/ZR
listings) — Spark rendering of tracking/UP_tracking.py:282-320 and
UOF_tracking.py:297-363.

new = incoming ∖ dimension, obsolete = dimension ∖ incoming — both as
broadcast left-anti joins (J8); `apply_changes` produces the updated
dimension the way the reference's keyed UPDATE/INSERT does, as a pure
DataFrame so the caller overwrites the dim table in the lake."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_changes(incoming: DataFrame, dimension: DataFrame, key: str) -> DataFrame:
    """Returns (entity key, change ∈ {'new','obsolete'})."""
    inc = incoming.select(key).distinct()
    dim = dimension.select(key).distinct()
    new = inc.join(dim, key, "left_anti").withColumn("change", F.lit("new"))
    obsolete = dim.join(inc, key, "left_anti").withColumn("change", F.lit("obsolete"))
    return new.unionByName(obsolete)


def apply_changes(
    incoming: DataFrame, dimension: DataFrame, key: str, obsolete_col: str = "obsoleta"
) -> DataFrame:
    """Updated dimension: new entities appended (obsoleta=0), missing
    entities flagged obsoleta=1, surviving entities keep their row.
    Matches the up_listado shape (FIXTURES.md §3.2)."""
    changes = detect_changes(incoming, dimension, key)
    new_rows = (
        changes.where(F.col("change") == "new")
        .select(key)
        .withColumn(obsolete_col, F.lit(0))
        .withColumn("date_updated", F.current_date())
    )
    obsolete_keys = changes.where(F.col("change") == "obsolete").select(key)
    kept = dimension.join(F.broadcast(obsolete_keys), key, "left_anti").withColumn(
        "date_updated", F.current_date()
    )
    flagged = (
        dimension.join(F.broadcast(obsolete_keys), key, "left_semi")
        .withColumn(obsolete_col, F.lit(1))
        .withColumn("date_updated", F.current_date())
    )
    cols = [key, obsolete_col, "date_updated"]
    return (
        kept.select(*cols)
        .unionByName(flagged.select(*cols))
        .unionByName(new_rows.select(*cols))
    )
