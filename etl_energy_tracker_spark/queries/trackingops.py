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
    "up_tracking_changes",
    oracle=f"""
    WITH sup AS (
        SELECT s_suppkey AS k, round(s_acctbal, 2) AS pot, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
    ),
    inc AS (
        SELECT 'UP' || CAST(k AS VARCHAR) AS up,
               CASE WHEN k % 11 = 0 THEN NULL ELSE pot END AS n_pot,
               CASE WHEN k % 11 = 0 THEN NULL ELSE n_name END AS n_zona
        FROM sup WHERE k % 4 != 0
    ),
    dim AS (
        SELECT 'UP' || CAST(k AS VARCHAR) AS up,
               pot + CASE WHEN k % 3 = 0 THEN 10 ELSE 0 END AS o_pot,
               CASE WHEN k % 7 = 0 THEN 'ZONA_X' ELSE n_name END AS o_zona
        FROM sup WHERE k % 5 != 0
    ),
    j AS (
        SELECT coalesce(i.up, d.up) AS entity,
               i.up IS NOT NULL AS in_inc, d.up IS NOT NULL AS in_dim,
               n_pot, n_zona, o_pot, o_zona
        FROM inc i FULL OUTER JOIN dim d ON i.up = d.up
    )
    SELECT entity, 'habilitada' AS field_changed,
           CAST(NULL AS DOUBLE) AS old_num, CAST(NULL AS DOUBLE) AS new_num,
           'false' AS old_str, 'true' AS new_str,
           '{_ZR_DATE}' AS date_updated
    FROM j WHERE NOT in_dim
    UNION ALL
    SELECT entity, 'obsoleta', CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           'false', 'true', '{_ZR_DATE}'
    FROM j WHERE in_dim AND NOT in_inc
    UNION ALL
    SELECT entity, 'potencia', o_pot, n_pot,
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), '{_ZR_DATE}'
    FROM j WHERE in_inc AND in_dim AND n_pot IS NOT NULL AND n_zona IS NOT NULL
             AND n_pot IS DISTINCT FROM o_pot
    UNION ALL
    SELECT entity, 'zona_regulacion', CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           o_zona, n_zona, '{_ZR_DATE}'
    FROM j WHERE in_inc AND in_dim AND n_pot IS NOT NULL AND n_zona IS NOT NULL
             AND n_zona IS DISTINCT FROM o_zona
    """,
    tags=("tracking", "join", "setops"),
    doc="UP-listing attribute-drift tracking (UP_tracking.py:388-494): "
    "potencia + zona_regulacion per-field change log with the "
    "reference's null-skip rule (any null incoming field → entity "
    "skipped, old values kept; null OLD vs non-null new IS a change), "
    "plus habilitada/obsoleta transitions — the UP tracker logs "
    "obsoletions, unlike ZR. One full-outer join + per-field "
    "projections, no per-entity loop.",
)
def up_tracking_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.tracking import up_change_log

    nation = load_table(spark, "nation", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    sup = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier.s_nationkey == nation.n_nationkey,
    ).select(
        F.col("s_suppkey").alias("k"),
        F.round("s_acctbal", 2).alias("pot"),
        "n_name",
    )
    up_code = F.concat(F.lit("UP"), F.col("k").cast("string"))
    skip = F.col("k") % 11 == 0
    incoming = sup.where(F.col("k") % 4 != 0).select(
        up_code.alias("UP"),
        F.when(skip, F.lit(None)).otherwise(F.col("pot")).alias("potencia"),
        F.when(skip, F.lit(None)).otherwise(F.col("n_name")).alias("zona_regulacion"),
    )
    dim = sup.where(F.col("k") % 5 != 0).select(
        up_code.alias("UP"),
        (F.col("pot") + F.when(F.col("k") % 3 == 0, 10).otherwise(0)).alias("potencia"),
        F.when(F.col("k") % 7 == 0, "ZONA_X").otherwise(F.col("n_name")).alias(
            "zona_regulacion"
        ),
    )
    return up_change_log(incoming, dim, _ZR_DATE)


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


@register(
    "up_link_eligibility",
    oracle=f"""
    WITH log AS (
        SELECT 'UP' || CAST(s_suppkey AS VARCHAR) AS up, 'habilitada' AS f,
               DATE '{_ZR_DATE}' - CAST(s_suppkey * 3 % 200 AS INT) AS d
        FROM supplier WHERE s_suppkey % 4 != 0
        UNION ALL
        SELECT 'UP' || CAST(s_suppkey AS VARCHAR), 'obsoleta',
               DATE '{_ZR_DATE}' - CAST(s_suppkey * 3 % 200 AS INT) + 10
        FROM supplier WHERE s_suppkey % 4 != 0 AND s_suppkey % 13 = 0
    ),
    state AS (
        SELECT up, f AS state, d AS state_date FROM (
            SELECT *, row_number() OVER (
                PARTITION BY up ORDER BY d DESC,
                CASE WHEN f = 'obsoleta' THEN 1 ELSE 0 END DESC) AS rn
            FROM log) WHERE rn = 1
    )
    SELECT up AS UP, state_date AS enabled_date,
           CAST(DATE '{_ZR_DATE}' - state_date AS INT) AS days_enabled
    FROM state
    WHERE state = 'habilitada'
      AND state_date <= DATE '{_ZR_DATE}' - 93
      AND up NOT IN (SELECT 'UP' || CAST(s_suppkey AS VARCHAR)
                     FROM supplier WHERE s_suppkey % 6 = 0)
    """,
    tags=("tracking", "linking", "window"),
    doc="Vinculación 93-day eligibility queue "
    "(vinculacion/_vinculacion_monitoring.py:17-22, vinculacion_main.py"
    ":43-55): UPs whose latest habilitada/obsoleta transition in "
    "up_change_log is an enable at least 93 days old and that have no "
    "stored UP-UOF link — the retry set each daily monitoring round "
    "re-attempts. Latest-state per UP is one max_by aggregate (no "
    "window over the log), links anti-join broadcasts. Stand-ins: "
    "suppliers as UPs, enable dates spread by (3k mod 200) days, every "
    "13th UP obsoleted 10 days after enabling, every 6th already "
    "linked.",
)
def up_link_eligibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.vinculacion import eligible_ups

    sup = load_table(spark, "supplier", sf_dir).select(
        F.col("s_suppkey").alias("k")
    )
    up = F.concat(F.lit("UP"), F.col("k").cast("string"))
    enable_date = F.date_sub(
        F.to_date(F.lit(_ZR_DATE)), (F.col("k") * 3 % 200).cast("int")
    )
    enables = sup.where(F.col("k") % 4 != 0).select(
        up.alias("UP"),
        F.lit("habilitada").alias("field_changed"),
        enable_date.alias("date_updated"),
    )
    obsoletes = sup.where((F.col("k") % 4 != 0) & (F.col("k") % 13 == 0)).select(
        up.alias("UP"),
        F.lit("obsoleta").alias("field_changed"),
        F.date_add(enable_date, 10).alias("date_updated"),
    )
    links = sup.where(F.col("k") % 6 == 0).select(
        up.alias("UP"),
        F.concat(F.lit("UOF"), F.col("k").cast("string")).alias("UOF"),
    )
    return eligible_ups(
        enables.unionByName(obsoletes), links, _ZR_DATE
    )


_VM_LINK_DATE = "2024-01-01"  # stamp on pre-existing link rows


@register(
    "vinculacion_monitor_e2e",
    oracle=f"""
    WITH ks AS (SELECT s_suppkey AS k FROM supplier),
    log AS (
        SELECT 'UP' || CAST(k AS VARCHAR) AS up, 'habilitada' AS f,
               DATE '{_ZR_DATE}' - CAST(k * 3 % 200 AS INT) AS d
        FROM ks WHERE k % 4 != 0
        UNION ALL
        SELECT 'UP' || CAST(k AS VARCHAR), 'obsoleta',
               DATE '{_ZR_DATE}' - CAST(k * 3 % 200 AS INT) + 10
        FROM ks WHERE k % 4 != 0 AND k % 13 = 0
    ),
    state AS (
        SELECT up, f AS state, d AS state_date FROM (
            SELECT *, row_number() OVER (
                PARTITION BY up ORDER BY d DESC,
                CASE WHEN f = 'obsoleta' THEN 1 ELSE 0 END DESC) AS rn
            FROM log) WHERE rn = 1
    ),
    eligible AS (
        SELECT up AS UP,
               CAST(DATE '{_ZR_DATE}' - state_date AS INT) AS days_enabled
        FROM state
        WHERE state = 'habilitada'
          AND state_date <= DATE '{_ZR_DATE}' - 93
          AND up NOT IN (SELECT 'UP' || CAST(k AS VARCHAR)
                         FROM ks WHERE k % 6 = 0)
    ),
    cur AS (
        SELECT 'UP' || CAST(k AS VARCHAR) AS UP,
               'UOF' || CAST(k AS VARCHAR) AS UOF
        FROM ks WHERE k % 6 = 0
        UNION ALL
        SELECT 'UP' || CAST(k AS VARCHAR), NULL FROM ks WHERE k % 10 = 5
    ),
    nm AS (
        SELECT 'UP' || CAST(k AS VARCHAR) AS UP,
               CASE WHEN k % 18 = 0 THEN 'UOFX' || CAST(k AS VARCHAR)
                    ELSE 'UOF' || CAST(k AS VARCHAR) END AS UOF
        FROM ks WHERE k % 6 = 0 AND k % 24 != 0
        UNION ALL
        SELECT 'UP' || CAST(k AS VARCHAR), 'UOFR' || CAST(k AS VARCHAR)
        FROM ks WHERE k % 20 = 5
        UNION ALL
        SELECT 'UP' || CAST(k AS VARCHAR), 'UOFN' || CAST(k AS VARCHAR)
        FROM ks WHERE k % 6 != 0 AND k % 10 != 5 AND k % 7 = 0
    ),
    listado AS (
        SELECT 'UP' || CAST(k AS VARCHAR) AS UP,
               CASE WHEN k % 9 = 3 THEN 1 ELSE 0 END AS obsoleta
        FROM ks
    ),
    j AS (
        SELECT COALESCE(c.UP, n.UP) AS UP, c.UOF AS uof_old,
               n.UOF AS uof_new,
               c.UP IS NOT NULL AS in_cur, n.UP IS NOT NULL AS in_new
        FROM cur c FULL OUTER JOIN nm n ON c.UP = n.UP
    ),
    new_links AS (SELECT UP, uof_new FROM j WHERE NOT in_cur AND in_new),
    raw_changes AS (
        SELECT UP, uof_old, uof_new FROM j
        WHERE in_cur AND in_new AND uof_old IS DISTINCT FROM uof_new
        UNION ALL
        SELECT UP, uof_old, 'unknown' FROM j
        WHERE in_cur AND NOT in_new AND uof_old IS NOT NULL
    ),
    classified AS (
        SELECT c.UP, c.uof_old,
               CASE WHEN kind = 'obsolete' THEN NULL
                    ELSE c.uof_new END AS uof_new, kind
        FROM (
            SELECT rc.*,
                   CASE WHEN rc.uof_new != 'unknown' THEN 'uof_change'
                        WHEN COALESCE(l.obsoleta, 1) = 1 THEN 'obsolete'
                        ELSE 'unknown' END AS kind
            FROM raw_changes rc LEFT JOIN listado l ON l.UP = rc.UP
        ) c
    ),
    change_log AS (
        SELECT UP,
               CASE WHEN kind = 'uof_change' THEN 'UOF'
                    ELSE 'obsoleta' END AS field_changed,
               uof_old, uof_new
        FROM classified WHERE kind IN ('uof_change', 'obsolete')
    ),
    updated_links AS (
        SELECT UP, UOF, '{_VM_LINK_DATE}' AS date_updated FROM cur
        WHERE UP NOT IN (SELECT UP FROM classified
                         WHERE kind IN ('uof_change', 'obsolete'))
        UNION ALL
        SELECT UP, uof_new, '{_ZR_DATE}' FROM classified
        WHERE kind IN ('uof_change', 'obsolete')
        UNION ALL
        SELECT UP, uof_new, '{_ZR_DATE}' FROM new_links
    ),
    outcomes AS (
        SELECT e.UP,
               CASE WHEN e.UP IN (SELECT UP FROM nm) THEN 'linked'
                    WHEN e.UP IN (SELECT UP FROM listado
                                  WHERE obsoleta = 1) THEN 'obsolete'
                    ELSE 'retry' END AS outcome,
               days_enabled
        FROM eligible e
    )
    SELECT 'outcome' AS rec, UP, outcome AS a,
           CAST(days_enabled AS VARCHAR) AS b
    FROM outcomes
    UNION ALL
    SELECT 'change', UP, field_changed,
           COALESCE(uof_old, '~') || '->' || COALESCE(uof_new, '~')
    FROM change_log
    UNION ALL
    SELECT 'link', UP, COALESCE(UOF, '~'), date_updated
    FROM updated_links
    """,
    tags=("tracking", "linking", "e2e"),
    doc="Full vinculación monitoring round end-to-end (VERDICT r11 "
    "task 8): the complete monitor_links chain — 93-day eligibility "
    "queue, full-outer link diff with presence flags, unlinked "
    "classification against the listado obsoleta flag, change log, "
    "keyed link-table update, per-UP outcome log — in ONE driver-"
    "checked query (only up_link_eligibility was oracle-gated "
    "before; the retry loop lived in pytests). Ref parity: "
    "vinculacion/_vinculacion_monitoring.py:346-430 "
    "(monitor_existing_links) + vinculacion_main.py:43-55. "
    "Stand-ins exercise every branch at sf0.01: unchanged links "
    "(k%6=0), moves (k%18=0), drops split obsolete/unknown by "
    "k%9, retired NULL rows (k%10=5) half re-found (k%20=5), "
    "first-time matches (k%7), eligibility as in "
    "up_link_eligibility. Scale: one shuffle over the change log "
    "(max_by state), everything else broadcast joins on entity "
    "dims; the three output families union without re-shuffling.",
)
def vinculacion_monitor_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.vinculacion import monitor_links

    ks = load_table(spark, "supplier", sf_dir).select(
        F.col("s_suppkey").alias("k")
    )
    up = F.concat(F.lit("UP"), F.col("k").cast("string"))
    enable_date = F.date_sub(
        F.to_date(F.lit(_ZR_DATE)), (F.col("k") * 3 % 200).cast("int")
    )
    change_log = (
        ks.where(F.col("k") % 4 != 0)
        .select(
            up.alias("UP"),
            F.lit("habilitada").alias("field_changed"),
            enable_date.alias("date_updated"),
        )
        .unionByName(
            ks.where((F.col("k") % 4 != 0) & (F.col("k") % 13 == 0)).select(
                up.alias("UP"),
                F.lit("obsoleta").alias("field_changed"),
                F.date_add(enable_date, 10).alias("date_updated"),
            )
        )
    )
    current_links = (
        ks.where(F.col("k") % 6 == 0)
        .select(
            up.alias("UP"),
            F.concat(F.lit("UOF"), F.col("k").cast("string")).alias("UOF"),
            F.lit(_VM_LINK_DATE).alias("date_updated"),
        )
        .unionByName(
            ks.where(F.col("k") % 10 == 5).select(
                up.alias("UP"),
                F.lit(None).cast("string").alias("UOF"),
                F.lit(_VM_LINK_DATE).alias("date_updated"),
            )
        )
    )
    new_matches = (
        ks.where((F.col("k") % 6 == 0) & (F.col("k") % 24 != 0))
        .select(
            up.alias("UP"),
            F.concat(
                F.when(F.col("k") % 18 == 0, "UOFX").otherwise("UOF"),
                F.col("k").cast("string"),
            ).alias("UOF"),
        )
        .unionByName(
            ks.where(F.col("k") % 20 == 5).select(
                up.alias("UP"),
                F.concat(F.lit("UOFR"), F.col("k").cast("string")).alias(
                    "UOF"
                ),
            )
        )
        .unionByName(
            ks.where(
                (F.col("k") % 6 != 0)
                & (F.col("k") % 10 != 5)
                & (F.col("k") % 7 == 0)
            ).select(
                up.alias("UP"),
                F.concat(F.lit("UOFN"), F.col("k").cast("string")).alias(
                    "UOF"
                ),
            )
        )
    )
    listado = ks.select(
        up.alias("UP"),
        F.when(F.col("k") % 9 == 3, 1).otherwise(0).alias("obsoleta"),
    )
    out = monitor_links(
        change_log, current_links, new_matches, listado, _ZR_DATE
    )
    tilde = F.lit("~")
    outcomes = out["outcomes"].select(
        F.lit("outcome").alias("rec"),
        "UP",
        F.col("outcome").alias("a"),
        F.col("days_enabled").cast("string").alias("b"),
    )
    changes = out["change_log"].select(
        F.lit("change").alias("rec"),
        "UP",
        F.col("field_changed").alias("a"),
        F.concat(
            F.coalesce(F.col("old_value"), tilde),
            F.lit("->"),
            F.coalesce(F.col("new_value"), tilde),
        ).alias("b"),
    )
    links = out["updated_links"].select(
        F.lit("link").alias("rec"),
        "UP",
        F.coalesce(F.col("UOF"), tilde).alias("a"),
        F.col("date_updated").alias("b"),
    )
    return outcomes.unionByName(changes).unionByName(links)
