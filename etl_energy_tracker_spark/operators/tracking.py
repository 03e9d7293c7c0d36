"""Entity-dimension tracking (SCD-style maintenance of UP/UOF/ZR
listings) — Spark rendering of tracking/UP_tracking.py:282-320 and
UOF_tracking.py:297-363.

new = incoming ∖ dimension, obsolete = dimension ∖ incoming — both as
broadcast left-anti joins (J8); `apply_changes` produces the updated
dimension the way the reference's keyed UPDATE/INSERT does, as a pure
DataFrame so the caller overwrites the dim table in the lake."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
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


def update_tecnologias(
    p48_raw: DataFrame,
    dim: DataFrame,
    concepto_col: str = "Concepto",
    name_col: str = "tecnologia",
    id_col: str = "id",
) -> DataFrame:
    """Technology-dimension maintenance from P48 data — Spark rendering
    of tecnologias_generacion/p48_tecnologias_generacion.py:27-108: the
    distinct non-null Concepto values of the latest P48 file that are
    not yet in `tecnologias_generacion` are appended; existing rows are
    untouched. The reference leans on DB auto-increment for ids; here
    new rows get max(id)+rank ordered by name — deterministic across
    runs and engines. The global window is safe: it runs on the handful
    of *new* names, never on the P48 fact rows (distinct reduces
    first)."""
    incoming = (
        p48_raw.select(F.col(concepto_col).alias(name_col))
        .where(F.col(name_col).isNotNull())
        .distinct()
    )
    new = incoming.join(dim.select(name_col), name_col, "left_anti")
    max_id = dim.agg(F.coalesce(F.max(id_col), F.lit(0)).alias("_mx"))
    new_rows = (
        new.crossJoin(F.broadcast(max_id))
        .withColumn(
            id_col,
            (F.col("_mx") + F.row_number().over(W.orderBy(name_col))).cast("int"),
        )
        .select(id_col, name_col)
    )
    return dim.select(id_col, name_col).unionByName(new_rows)
