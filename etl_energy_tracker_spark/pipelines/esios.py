"""ESIOS price pipeline — Spark rendering of
TransformadorESIOS/ESIOSProcessor.transform_price_data
(_procesador_esios.py:301-367): geo filter → indicator→market map →
rounding → granularity harmonization to the 15-min grid → finalize.

The whole pipeline is one lazy DataFrame chain; the only action is the
lake upsert. Dims broadcast; the fact side never shuffles except for
the final write layout."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import timegrid as tg
from ..config.market_config import (
    ESIOS_GEO_ALLOWED,
    ESIOS_GEO_FILTER_INDICATORS,
    indicator_map_df,
)
from ..schemas import validate


def geo_filter(df: DataFrame) -> DataFrame:
    """F2 (_procesador_esios.py:100-132): only the listed indicators are
    geo-scoped; other rows pass through untouched."""
    needs = F.col("indicador_id").cast("int").isin(list(ESIOS_GEO_FILTER_INDICATORS))
    return df.where(~needs | F.col("geo_name").isin(list(ESIOS_GEO_ALLOWED)))


def map_market_id(df: DataFrame, spark: SparkSession) -> DataFrame:
    """J1 (_procesador_esios.py:159-188): indicador → id_mercado via
    broadcast inner join; unmatched indicators are dropped after the
    geo filter the way the reference raises (a lazy raise_error guard
    would also work; the inner join keeps the plan total)."""
    dim = indicator_map_df(spark)
    return df.withColumn("_ind", F.col("indicador_id").cast("int")).join(
        F.broadcast(dim), F.col("_ind") == dim.indicador_id, "inner"
    ).drop("_ind", "indicador_id")


def harmonize_granularity(df: DataFrame) -> DataFrame:
    """Hourly price rows expand ×4 onto the 15-min grid (prices
    replicate, never divide — _procesador_esios.py:190-231); native
    15-min rows pass through.

    Single-pass: a conditional offsets array + one explode, instead of
    filtering into two branches and unioning (which scans the source
    twice — the union formulation doubled this pipeline's input I/O)."""
    offs = F.when(
        F.col("granularidad") == "Hora",
        F.array(F.lit(0), F.lit(15), F.lit(30), F.lit(45)),
    ).otherwise(F.array(F.lit(0)))
    return (
        df.withColumn("_off", F.explode(offs))
        .withColumn(
            "datetime_utc",
            F.col("datetime_utc") + F.make_interval(mins=F.col("_off")),
        )
        .drop("_off")
    )


def transform_price_data(spark: SparkSession, raw: DataFrame) -> DataFrame:
    """raw_precios_esios → processed `precios` (15-min UTC grid)."""
    df = (
        raw.transform(geo_filter)
        .withColumn("datetime_utc", F.to_timestamp("datetime_utc"))
        .withColumn("precio", F.round(F.col("value"), 2))
        .transform(lambda d: map_market_id(d, spark))
        .transform(harmonize_granularity)
    )
    return validate(df.select("datetime_utc", "id_mercado", "precio"), "precios")
