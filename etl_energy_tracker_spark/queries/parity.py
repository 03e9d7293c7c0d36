"""Reference-parity queries: the *actual pipeline functions* from
``pipelines/`` run on market-shaped frames fabricated deterministically
from the testdata tables, with the oracle reproducing the reference
semantics in pure SQL. This puts the domain engine itself (not just
its operator primitives) under the driver's hash-compare gate.

Plus the remaining SURVEY §2 inventory rows: literal-map lookups
(J2/J3), JSON property extraction, percentile/distinct aggregates,
ROLLUP, range-frame windows, ordered-first semantics, zero-padded
codes (C10), and an as-of join (beyond-reference; DuckDB's native
ASOF JOIN is the oracle, so two independent formulations must agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..pipelines import esios, i90
from ..sources.registry import load_table
from .catalog import register

# ---------------------------------------------------------------------------
# pipeline end-to-end parity
# ---------------------------------------------------------------------------

_IND_MAP = {"click": "600", "view": "612", "purchase": "2130", "signup": "634", "error": "99999"}


def _fake_esios_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    ind = F.create_map(*[x for k, v in _IND_MAP.items() for x in (F.lit(k), F.lit(v))])
    return ev.select(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
            "datetime_utc"
        ),
        F.col("value"),
        ind[F.col("event_type")].alias("indicador_id"),
        F.when(F.col("user_id") % 7 == 0, "Portugal").otherwise("España").alias(
            "geo_name"
        ),
        F.lit("Hora").alias("granularidad"),
    )


@register(
    "pipeline_esios_e2e",
    oracle="""
    WITH raw AS (
        SELECT date_trunc('hour', ts) AS dt,
               value,
               CASE event_type WHEN 'click' THEN 600 WHEN 'view' THEN 612
                    WHEN 'purchase' THEN 2130 WHEN 'signup' THEN 634
                    ELSE 99999 END AS ind,
               CASE WHEN user_id % 7 = 0 THEN 'Portugal' ELSE 'España' END AS geo
        FROM events
    ),
    filtered AS (
        -- geo filter applies only to the geo-scoped indicator list
        SELECT * FROM raw
        WHERE (ind NOT IN (600, 612, 613, 614, 615, 616, 617, 618)) OR geo = 'España'
    ),
    mapped AS (
        -- indicator → market id (600→1 diario, 612→2 intra1,
        -- 2130→14 secundaria subir, 634→15 secundaria bajar)
        SELECT dt, ROUND(value, 2) AS precio,
               CASE ind WHEN 600 THEN 1 WHEN 612 THEN 2 WHEN 2130 THEN 14
                    WHEN 634 THEN 15 END AS id_mercado
        FROM filtered WHERE ind IN (600, 612, 2130, 634)
    )
    SELECT dt + to_minutes(off) AS datetime_utc,
           CAST(id_mercado AS SMALLINT) AS id_mercado,
           CAST(precio AS FLOAT) AS precio
    FROM mapped CROSS JOIN (VALUES (0), (15), (30), (45)) AS offsets(off)
    """,
    tags=("pipeline", "parity"),
    doc="The real ESIOS pipeline (pipelines/esios.transform_price_data: "
    "geo filter → indicator map → rounding → ×4 granularity "
    "harmonization → schema validate) on events-derived raw rows; the "
    "oracle re-derives the reference semantics independently in SQL.",
)
def pipeline_esios_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    return esios.transform_price_data(spark, _fake_esios_raw(spark, sf_dir))


@register(
    "precios_hourly_read_e2e",
    oracle="""
    WITH p15 AS (
        SELECT DISTINCT
               TIMESTAMP '1970-01-01' + to_seconds(
                   CAST(floor(epoch(ts) / 900) * 900 AS BIGINT)) AS dt,
               CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
                    WHEN 'purchase' THEN 14 WHEN 'signup' THEN 15 END AS id_mercado,
               CAST(round(value, 2) AS FLOAT) AS precio
        FROM events
        WHERE event_type IN ('click', 'view', 'purchase', 'signup')
    )
    SELECT date_trunc('hour', dt) AS datetime_utc,
           CAST(id_mercado AS SMALLINT) AS id_mercado,
           ROUND(AVG(CAST(precio AS DOUBLE)), 4) AS precio
    FROM p15
    GROUP BY date_trunc('hour', dt), id_mercado
    """,
    tags=("pipeline", "parity", "aggregate"),
    doc="The hourly price READ surface end-to-end "
    "(read/precios_reader.py:22-56 is_quinceminutal routing): a 15-min "
    "price series is upserted into a real (temp) lake — exercising the "
    "keyed keep-last dedup on (datetime_utc, id_mercado, precio) — and "
    "read back through PreciosReader(granularity='hour'), which rolls "
    "up on read via the A3 kernel (prices average within the hour). "
    "The oracle mirrors the dedup with DISTINCT and the rollup with "
    "AVG.",
)
def precios_hourly_read_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..lake import Lake
    from ..read.readers import PreciosReader

    ev = load_table(spark, "events", sf_dir)
    mid = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "view", 2)
        .when(F.col("event_type") == "purchase", 14)
        .when(F.col("event_type") == "signup", 15)
    )
    p15 = ev.select(
        F.timestamp_seconds((F.unix_timestamp("ts") / 900).cast("long") * 900).alias(
            "datetime_utc"
        ),
        mid.alias("id_mercado"),
        F.round("value", 2).cast("float").alias("precio"),
    ).where(F.col("id_mercado").isNotNull())

    lake = Lake(spark, tempfile.mkdtemp(prefix="precios_read_e2e_"))
    lake.upsert_processed(p15, "precios")
    hourly = PreciosReader(lake).read(granularity="hour")
    return hourly.select(
        "datetime_utc",
        "id_mercado",
        F.round("precio", 4).alias("precio"),
    )


@register(
    "pipeline_i90_errors_e2e",
    oracle="""
    WITH raw AS (
        SELECT '2024-01-' || lpad(CAST(day(ts) AS VARCHAR), 2, '0') AS fecha,
               hour(ts) * 4 + minute(ts) // 15 + 1 AS q,
               value,
               user_id
        FROM events
    )
    SELECT CAST(fecha AS TIMESTAMP) + to_minutes((q - 1) * 15 - 60) AS datetime_utc,
           'UP' || CAST(user_id % 50 AS VARCHAR) AS up,
           CAST(value AS FLOAT) AS volumenes,
           CAST(9 AS SMALLINT) AS id_mercado
    FROM raw
    WHERE user_id % 2 = 0           -- Sentido = 'Subir' (market 9)
      AND user_id % 3 = 0           -- Redespacho in the ECO list
      AND value IS NOT NULL AND value != 0
      AND fecha != '2024-01-05'     -- F10: known-bad sheet 03 date
    """,
    tags=("pipeline", "parity"),
    doc="The real I90 volume pipeline for market 9 (Restricciones MD a "
    "subir) with the F10 error-sheet exclusion wired in: a known-bad "
    "(fecha='2024-01-05', sheet='03') entry in the Errores_i90_OMIE-"
    "shaped config removes that day's rows during ingest "
    "(_descargador_i90.py:77-86, configs/i90_config.py:196-215), then "
    "sentido/redespacho filters, zero/NA drop, and 15-min-grid "
    "standardization (January dates → fixed CET offset, so the oracle "
    "needs no DST table; the DST kernel itself is oracle-checked by "
    "madrid_local_to_utc).",
)
def pipeline_i90_errors_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..config.market_config import I90Error, i90_errores_df

    ev = load_table(spark, "events", sf_dir)
    raw = ev.select(
        F.concat(
            F.lit("2024-01-"), F.lpad(F.dayofmonth("ts").cast("string"), 2, "0")
        ).alias("fecha"),
        (F.hour("ts") * 4 + (F.minute("ts") / 15).cast("int") + 1)
        .cast("string")
        .alias("hora"),
        F.lit("Quince minutos").alias("granularity"),
        F.col("value").alias("volumenes"),
        F.concat(F.lit("UP"), (F.col("user_id") % 50).cast("string")).alias(
            "Unidad de Programación"
        ),
        F.when(F.col("user_id") % 2 == 0, "Subir").otherwise("Bajar").alias("Sentido"),
        F.when(F.col("user_id") % 3 == 0, "ECO").otherwise("Otro").alias("Redespacho"),
    )
    errors = i90_errores_df(spark, (I90Error("2024-01-05", "03"),))
    from .. import timegrid as tg

    return i90.transform_volumenes(raw, 9, tg.dst_dim(spark), errors=errors)


@register(
    "pipeline_intra_differencing_e2e",
    oracle="""
    WITH baseline AS (
        SELECT date_trunc('hour', ts) AS datetime_utc,
               CAST(user_id AS VARCHAR) AS up,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS volumenes,
               1 AS session
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ),
    s2 AS (
        SELECT date_trunc('hour', ts) AS datetime_utc,
               CAST(user_id AS VARCHAR) AS up,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS volumenes,
               2 AS session
        FROM events WHERE event_type = 'click'
        GROUP BY 1, 2
    ),
    s3 AS (
        SELECT date_trunc('hour', ts) AS datetime_utc,
               CAST(user_id AS VARCHAR) AS up,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS volumenes,
               3 AS session
        FROM events WHERE event_type = 'view'
        GROUP BY 1, 2
    ),
    uni AS (
        SELECT * FROM baseline UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3
    ),
    lagged AS (
        SELECT datetime_utc, up, session, volumenes,
               lag(volumenes) OVER w AS prev_vol,
               lag(session) OVER w AS prev_ses
        FROM uni
        WINDOW w AS (PARTITION BY up, datetime_utc ORDER BY session)
    )
    SELECT datetime_utc, up,
           volumenes - CASE WHEN prev_ses = session - 1
                            THEN COALESCE(prev_vol, 0.0) ELSE 0.0 END AS volumenes,
           session
    FROM lagged WHERE session > 1
    """,
    tags=("pipeline", "parity", "window"),
    doc="The real intra differencing operator (pipelines/i90."
    "intra_incremental): diario baseline + cumulative sessions → "
    "per-session increments with the exactly-one-session-back guard "
    "(_procesador_i90.py:525-537). Sessions fabricated from event "
    "types; oracle re-derives the guarded lag independently.",
)
def pipeline_intra_differencing_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)

    def cum(event_type: str, session: int) -> DataFrame:
        return (
            ev.where(F.col("event_type") == event_type)
            .groupBy(
                F.date_trunc("hour", "ts").alias("datetime_utc"),
                F.col("user_id").cast("string").alias("up"),
            )
            .agg(F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("volumenes"))
            .withColumn("session", F.lit(session))
        )

    baseline = cum("purchase", 1).drop("session")
    sessions = cum("click", 2).unionByName(cum("view", 3))
    return i90.intra_incremental(baseline, sessions)


# ---------------------------------------------------------------------------
# remaining inventory rows
# ---------------------------------------------------------------------------


@register(
    "asof_join_last_click",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           c.ts AS clicked_at, c.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    tags=("join", "asof", "window"),
    doc="As-of join (beyond-reference; Spark lacks a native one): for "
    "each purchase, the latest click at-or-before it. Implemented as "
    "the union-stream window (tag both sides, one sort per entity, "
    "last_value ignorenulls) — a single shuffle on the entity key, vs "
    "an O(n·m) theta join. Oracle is DuckDB's native ASOF JOIN, an "
    "independent formulation.",
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    stream = ev.where(F.col("event_type").isin("purchase", "click")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("_click_ts"),
        F.when(F.col("event_type") == "click", F.col("value")).alias("_click_val"),
    )
    # clicks sort before purchases at identical ts so `<=` semantics hold
    order = F.when(F.col("event_type") == "click", 0).otherwise(1)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", order, "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        stream.withColumn("clicked_at", F.last("_click_ts", ignorenulls=True).over(w))
        .withColumn("click_value", F.last("_click_val", ignorenulls=True).over(w))
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "clicked_at", "click_value")
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
               AS sum_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("parse", "aggregate"),
    doc="Semi-structured property extraction: JSON path into the props "
    "column, typed cast, aggregate — stays inside codegen via "
    "get_json_object.",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("n")
    )


@register(
    "literal_map_lookup",
    oracle="""
    SELECT event_id,
           CASE event_type WHEN 'click' THEN 'PHF-1' WHEN 'view' THEN 'PHF-2'
                WHEN 'purchase' THEN 'PHF-3' WHEN 'signup' THEN 'PHF-4'
                ELSE NULL END AS programa,
           CASE event_type WHEN 'click' THEN 2 WHEN 'view' THEN 3
                WHEN 'purchase' THEN 4 WHEN 'signup' THEN 5
                ELSE NULL END AS id_mercado
    FROM events
    """,
    tags=("join", "project"),
    doc="J2/J3 chained literal-map lookup (sheet→market, PHF→Intra→id; "
    "configs/i3_config.py:180-188): create_map chains evaluate inline — "
    "no join, no broadcast, pure codegen.",
)
def literal_map_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    phf = F.create_map(
        *[
            x
            for k, v in {"click": "PHF-1", "view": "PHF-2", "purchase": "PHF-3", "signup": "PHF-4"}.items()
            for x in (F.lit(k), F.lit(v))
        ]
    )
    intra_id = F.create_map(
        *[
            x
            for k, v in {"PHF-1": 2, "PHF-2": 3, "PHF-3": 4, "PHF-4": 5}.items()
            for x in (F.lit(k), F.lit(v))
        ]
    )
    programa = phf[F.col("event_type")]
    return ev.select(
        "event_id", programa.alias("programa"), intra_id[programa].alias("id_mercado")
    )


@register(
    "percentile_distinct_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
           ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
           COUNT(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "stats"),
    doc="Exact interpolated percentiles + distinct counts (§2.4: the "
    "reference has nunique only; Spark adds percentile/approx_* free). "
    "percentile() is exact here for oracle parity; at 100 TB swap to "
    "approx_percentile (sketch, one pass, mergeable).",
)
def percentile_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95_price"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


@register(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("aggregate",),
    doc="ROLLUP grouping sets — the hierarchy the reference's NL prompt "
    "suggests to DuckDB (natlanguage_duckdb_queries.py:242).",
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("sum_qty")
    )


@register(
    "range_window_1h",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS sum_1h
    FROM events
    """,
    tags=("window", "time"),
    doc="Time-range window frame (trailing 1 hour per entity) — RANGE on "
    "microseconds, identical frame on both engines.",
)
def range_window_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double").alias("sum_1h"),
    )


@register(
    "first_ordered_per_group",
    oracle="""
    SELECT user_id, event_type AS first_type, ts AS first_ts FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts, event_id
        ) AS rn FROM events
    ) WHERE rn = 1
    """,
    tags=("aggregate", "window"),
    doc="Deterministic ordered-first (A2/A3 'first' semantics: pandas "
    "groupby.first is row-order dependent; distributed engines need the "
    "explicit ordering — SURVEY §2.4 note).",
)
def first_ordered_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("first_type"),
            F.col("ts").alias("first_ts"),
        )
    )


@register(
    "zero_padded_codes",
    oracle="""
    SELECT DISTINCT p_size, lpad(CAST(p_size AS VARCHAR), 2, '0') AS sheet_code
    FROM part
    """,
    tags=("project",),
    doc="C10 zero-padded sheet codes (configs/i90_config.py:97: "
    "str(int(x)).zfill(2)).",
)
def zero_padded_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, "part", sf_dir)
    return p.select(
        "p_size", F.lpad(F.col("p_size").cast("string"), 2, "0").alias("sheet_code")
    ).distinct()


@register(
    "pipeline_omie_e2e",
    oracle="""
    WITH raw AS (
        SELECT strftime(ts, '%Y-%m-%d') AS fecha,
               EXTRACT(hour FROM ts) + 1 AS h,
               'U' || CAST(user_id AS VARCHAR) AS unidad,
               replace(CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR), '.', ',') AS energia,
               CASE WHEN event_id % 11 = 0 THEN 'O' ELSE 'C' END AS casada,
               CASE WHEN event_type = 'purchase' THEN 'C' ELSE 'V' END AS tipo,
               1 AS id_mercado
        FROM events
    ),
    parsed AS (
        -- C1 + C9: euro parse, buys negate; F5: matched only
        SELECT fecha, h, unidad, id_mercado,
               CASE WHEN tipo = 'C' THEN -1 ELSE 1 END
                 * CAST(replace(replace(energia, '.', ''), ',', '.') AS DOUBLE) AS vol
        FROM raw WHERE casada = 'C'
    ),
    expanded AS (
        -- 1-based hour index → elapsed (h-1); events are all January
        -- (winter, day-start offset 1h); ×4 expansion ÷4
        SELECT CAST(fecha AS TIMESTAMP)
                 + to_minutes((h - 1) * 60 - 60 + off) AS datetime_utc,
               unidad AS uof, vol / 4 AS vol, id_mercado
        FROM parsed CROSS JOIN (VALUES (0), (15), (30), (45)) AS o(off)
    )
    SELECT datetime_utc, uof,
           CAST(CAST(SUM(CAST(vol AS DECIMAL(38,6))) AS DOUBLE) AS FLOAT) AS volumenes,
           CAST(id_mercado AS SMALLINT) AS id_mercado
    FROM expanded
    GROUP BY datetime_utc, uof, id_mercado
    """,
    tags=("pipeline", "parity"),
    doc="The real OMIE pipeline (pipelines/omie.transform_volumenes: "
    "matched filter → European decimal parse → buy/sell sign → 1-based "
    "hour index through the DST kernel → ×4 expansion → duplicate "
    "aggregation → schema validate) on events-derived raw rows; oracle "
    "re-derives the semantics independently (offset pinned to the "
    "events' winter month).",
)
def pipeline_omie_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import timegrid as tg
    from ..pipelines import omie

    ev = load_table(spark, "events", sf_dir)
    raw = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("Fecha"),
        (F.hour("ts") + 1).cast("string").alias("Hora"),
        F.concat(F.lit("U"), F.col("user_id").cast("string")).alias("Unidad"),
        F.replace(
            F.col("value").cast("decimal(12,2)").cast("string"),
            F.lit("."),
            F.lit(","),
        ).alias("Energía Compra/Venta"),
        F.when(F.col("event_id") % 11 == 0, "O").otherwise("C").alias(
            "Ofertada (O)/Casada (C)"
        ),
        F.when(F.col("event_type") == "purchase", "C").otherwise("V").alias(
            "Tipo Oferta"
        ),
        F.lit(1).alias("id_mercado"),
    )
    dim = tg.dst_dim(spark, 2023, 2026)
    out = omie.transform_volumenes(raw, dim)
    # float sum in the pipeline is partition-order dependent; re-sum
    # decimal-exact for the oracle compare (the lake stores float32).
    # This second exchange of the (small, already-aggregated) output
    # cannot be elided: validate() inside transform_volumenes casts
    # datetime_utc to the schema type AFTER the pipeline aggregate, so
    # the re-sum keys are derived attributes and Catalyst cannot prove
    # the partitioning carries over (checked r13 — key reordering does
    # not help; the cast is the pipeline's schema contract).
    return (
        out.groupBy("datetime_utc", "uof", "id_mercado")
        .agg(
            F.sum(F.col("volumenes").cast("decimal(38,6)"))
            .cast("double")
            .cast("float")
            .alias("volumenes")
        )
        .select("datetime_utc", "uof", "volumenes", "id_mercado")
    )


@register(
    "pipeline_curtailments_e2e",
    oracle="""
    WITH raw AS (
        SELECT strftime(ts, '%Y-%m-%d') AS fecha,
               EXTRACT(hour FROM ts) AS h,
               'U' || CAST(user_id AS VARCHAR) AS up,
               value AS volumenes,
               CASE WHEN user_id % 2 = 0 THEN 'Bajar' ELSE 'Subir' END AS sentido,
               CASE event_type WHEN 'purchase' THEN 'UPLPVPV'
                    WHEN 'click' THEN 'Restricciones Técnicas'
                    WHEN 'view' THEN 'ECO'
                    WHEN 'signup' THEN 'UPLPVPCBN'
                    ELSE 'Indisponibilidad' END AS redespacho
        FROM events
    ),
    classified AS (
        SELECT *, CASE WHEN redespacho IN ('UPLPVPV', 'UPLPVPCBN') THEN 'R1'
                       WHEN redespacho = 'Restricciones Técnicas' THEN 'R5'
                       ELSE NULL END AS rtx
        FROM raw
        WHERE sentido = 'Bajar' AND volumenes IS NOT NULL AND volumenes <> 0
    )
    SELECT CAST(fecha AS TIMESTAMP) + to_minutes(h * 60 - 60 + off) AS datetime_utc,
           up, rtx AS RTx, redespacho AS tipo,
           CAST(volumenes / 4 AS FLOAT) AS volumenes,
           CAST(13 AS SMALLINT) AS id_mercado
    FROM classified CROSS JOIN (VALUES (0), (15), (30), (45)) AS o(off)
    WHERE rtx IS NOT NULL
    """,
    tags=("pipeline", "parity"),
    doc="The real curtailment pipeline (pipelines/curtailments.transform: "
    "Bajar prefilter → RTx classification from the redespacho lists → "
    "DST standardization → ×4 expansion → id_mercado=13) on "
    "events-derived raw rows; oracle re-derives independently (winter "
    "offset pinned).",
)
def pipeline_curtailments_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import timegrid as tg
    from ..pipelines import curtailments

    ev = load_table(spark, "events", sf_dir)
    hour = F.hour("ts")
    raw = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("fecha"),
        F.concat(
            F.lpad(hour.cast("string"), 2, "0"),
            F.lit("-"),
            F.lpad(((hour + 1) % 24).cast("string"), 2, "0"),
        ).alias("hora"),
        F.lit("Hora").alias("granularity"),
        F.col("value").alias("volumenes"),
        F.concat(F.lit("U"), F.col("user_id").cast("string")).alias(
            "Unidad de Programación"
        ),
        F.when(F.col("user_id") % 2 == 0, "Bajar").otherwise("Subir").alias("Sentido"),
        F.when(F.col("event_type") == "purchase", "UPLPVPV")
        .when(F.col("event_type") == "click", "Restricciones Técnicas")
        .when(F.col("event_type") == "view", "ECO")
        .when(F.col("event_type") == "signup", "UPLPVPCBN")
        .otherwise("Indisponibilidad")
        .alias("Redespacho"),
    )
    dim = tg.dst_dim(spark, 2023, 2026)
    return curtailments.transform(raw, dim)


@register(
    "json_map_explode",
    oracle="""
    WITH kv AS (
        SELECT event_id, unnest(json_keys(props)) AS prop_key, props
        FROM events
    )
    SELECT event_id, prop_key,
           CAST(json_extract(props, '$.' || prop_key) AS INTEGER) AS prop_value
    FROM kv
    """,
    tags=("parse", "reshape"),
    doc="Semi-structured map handling: props parsed to map<string,int> "
    "via from_json and exploded to (key, value) rows — the MapType "
    "path the reference never needed (SURVEY §1.1: no maps) but a "
    "lake engine must have. Oracle unnests json_keys then extracts per key.",
)
def json_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    m = F.from_json(F.col("props"), "map<string,int>")
    return ev.select("event_id", F.explode(m).alias("prop_key", "prop_value"))
