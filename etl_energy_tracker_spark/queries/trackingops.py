"""Entity-tracking query surface (round 2).

Covers the reference's regulation-zone (ZR) tracking and the P48-driven
technology-dimension maintenance:

- ``tracking/ZR_tracking.py`` — BSP/regulation-zone entity dimension with
  change detection and dated history.
- ``tecnologias_generacion/p48_tecnologias_generacion.py`` — updating the
  generation-technology dimension from P48-shaped observations.

Queries are registered here via :func:`~.catalog.register`; implementations
live in ``operators/tracking.py`` / ``operators/zr.py``.

The testdata stand-ins: nations play regulation zones, suppliers play
programming units (s_acctbal as max power, positive balance as the
'Generación' filter), and the prior dim state is a deterministic
subset/variation so every change kind fires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .catalog import register

_ZR_DATE = "2026-08-13"


def _zr_inputs(spark: SparkSession, sf_dir: str):
    """(esios snapshot, prior dim, BSP mapping) built from testdata."""
    from ..operators.zr import esios_zone_aggregate

    nation = load_table(spark, "nation", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    sup = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier.s_nationkey == nation.n_nationkey,
    )

    up_export = sup.select(
        F.col("n_name").alias("Zona de Regulación"),
        F.col("s_acctbal").alias("Potencia máxima MW"),
        F.when(F.col("s_acctbal") > 0, "Generación").otherwise("Consumo").alias("Tipo de UP"),
    )
    esios = esios_zone_aggregate(up_export, parse_potencia=False)

    dim_pot = (
        supplier.where(F.col("s_suppkey") % 3 != 0)
        .groupBy("s_nationkey")
        .agg(
            F.sum(F.round("s_acctbal", 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("potencia")
        )
    )
    dim = (
        nation.where(F.col("n_nationkey") < 20)
        .join(F.broadcast(dim_pot), nation.n_nationkey == dim_pot.s_nationkey, "left")
        .select(
            F.trim("n_name").alias("esios_id"),
            F.when(
                F.col("n_nationkey") % 2 == 0,
                F.concat(F.lit("Z"), F.lpad(F.col("n_nationkey").cast("string"), 3, "0")),
            ).alias("i90_id"),
            F.when(F.col("n_nationkey") % 7 == 3, 1).otherwise(0).alias("obsoleta"),
            "potencia",
        )
    )
    mapping = nation.select(
        F.trim("n_name").alias("esios_id"),
        F.concat(F.lit("Z"), F.lpad(F.col("n_nationkey").cast("string"), 3, "0")).alias(
            "i90_id"
        ),
    )
    return esios, dim, mapping


@register(
    "zr_tracking_changes",
    oracle=f"""
    WITH esios AS (
        SELECT trim(n_name) AS esios_id,
               CAST(SUM(CAST(round(s_acctbal, 2) AS DECIMAL(18,2))) AS DOUBLE) AS e_pot
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_acctbal > 0
        GROUP BY trim(n_name)
    ),
    dim_pot AS (
        SELECT s_nationkey,
               CAST(SUM(CAST(round(s_acctbal, 2) AS DECIMAL(18,2))) AS DOUBLE) AS potencia
        FROM supplier WHERE s_suppkey % 3 != 0
        GROUP BY s_nationkey
    ),
    dim AS (
        SELECT trim(n_name) AS esios_id,
               CASE WHEN n_nationkey % 2 = 0
                    THEN 'Z' || lpad(CAST(n_nationkey AS VARCHAR), 3, '0') END AS i90_id,
               CASE WHEN n_nationkey % 7 = 3 THEN 1 ELSE 0 END AS obsoleta,
               potencia
        FROM nation LEFT JOIN dim_pot ON n_nationkey = s_nationkey
        WHERE n_nationkey < 20
    ),
    mapping AS (
        SELECT trim(n_name) AS esios_id,
               'Z' || lpad(CAST(n_nationkey AS VARCHAR), 3, '0') AS i90_id
        FROM nation
    )
    SELECT esios_id, 'habilitada' AS field_changed,
           CAST(NULL AS DOUBLE) AS old_num, CAST(NULL AS DOUBLE) AS new_num,
           'false' AS old_str, 'true' AS new_str,
           '{_ZR_DATE}' AS date_updated
    FROM esios WHERE esios_id NOT IN (SELECT esios_id FROM dim)
    UNION ALL
    SELECT d.esios_id, 'potencia',
           round(d.potencia, 2), round(e.e_pot, 2),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), '{_ZR_DATE}'
    FROM dim d JOIN esios e USING (esios_id)
    WHERE d.obsoleta = 0 AND round(d.potencia, 2) != round(e.e_pot, 2)
    UNION ALL
    SELECT d.esios_id, 'i90_id',
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           CAST(NULL AS VARCHAR), m.i90_id, '{_ZR_DATE}'
    FROM dim d JOIN mapping m USING (esios_id)
    WHERE d.obsoleta = 0 AND d.i90_id IS NULL
    """,
    tags=("tracking", "join", "setops"),
    doc="ZR/BSP regulation-zone tracking change log "
    "(tracking/ZR_tracking.py:173-341): 'habilitada' for zones never "
    "seen, 'potencia' for 2-dp power drift on active zones, 'i90_id' "
    "backfills from the BSP mapping; obsolete flagging intentionally "
    "unlogged, obsolete rows untouched. All joins broadcast — the zone "
    "dim is inherently small; the heavy side is the UP-export "
    "aggregation (one hash agg, decimal-exact).",
)
def zr_tracking_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.zr import zr_change_log

    esios, dim, mapping = _zr_inputs(spark, sf_dir)
    return zr_change_log(dim, esios, mapping, _ZR_DATE)


@register(
    "p48_tecnologias_update",
    oracle="""
    WITH dim AS (
        SELECT CAST(row_number() OVER (ORDER BY t) AS INT) AS id, t AS tecnologia
        FROM (SELECT DISTINCT p_type AS t FROM part WHERE p_partkey < 1000)
    ),
    incoming AS (
        SELECT DISTINCT p_type AS tecnologia FROM part
        WHERE p_size > 25 AND p_type IS NOT NULL
    ),
    new AS (
        SELECT tecnologia FROM incoming
        WHERE tecnologia NOT IN (SELECT tecnologia FROM dim)
    ),
    mx AS (SELECT MAX(id) AS m FROM dim)
    SELECT id, tecnologia FROM dim
    UNION ALL
    SELECT CAST(m + row_number() OVER (ORDER BY tecnologia) AS INT) AS id, tecnologia
    FROM new, mx
    """,
    tags=("tracking", "setops"),
    doc="P48-driven technology-dimension maintenance "
    "(tecnologias_generacion/p48_tecnologias_generacion.py:27-108): "
    "distinct Concepto values of the latest P48 file not yet in "
    "tecnologias_generacion are appended with max(id)+alphabetical-rank "
    "ids (deterministic stand-in for DB auto-increment); existing rows "
    "untouched. Stand-ins: part p_type as technologies — the early "
    "partkeys seed the dim, large-size parts are the incoming P48 set.",
)
def p48_tecnologias_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.tracking import update_tecnologias

    part = load_table(spark, "part", sf_dir)
    seed = part.where(F.col("p_partkey") < 1000).select("p_type").distinct()
    dim = seed.select(
        F.row_number().over(W.orderBy("p_type")).cast("int").alias("id"),
        F.col("p_type").alias("tecnologia"),
    )
    p48 = part.where(F.col("p_size") > 25).select(F.col("p_type").alias("Concepto"))
    return update_tecnologias(p48, dim)
