"""Streaming incremental upsert, schema-drift renames, latest-period
discovery."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_energy_tracker_spark.lake import Lake, latest_raw_period
from etl_energy_tracker_spark.pipelines.common import normalize_schema_drift
from etl_energy_tracker_spark.schemas import validate
from etl_energy_tracker_spark.streaming.jobs import incremental_upsert_stream


def test_incremental_upsert_stream(spark, tmp_path):
    src = str(tmp_path / "raw_in")
    lake = Lake(spark, str(tmp_path / "lake"))

    df1 = spark.createDataFrame(
        [(dt.datetime(2024, 1, 15, 10), 1, 50.0)],
        "datetime_utc timestamp, id_mercado int, precio double",
    )
    df1.write.mode("append").parquet(src)

    def transform(batch):
        return validate(batch, "precios")

    ck = str(tmp_path / "ck")
    incremental_upsert_stream(
        spark, src, "datetime_utc timestamp, id_mercado int, precio double",
        lake, "precios", transform, ck,
    )
    assert lake.read_processed("precios").count() == 1

    # new file lands; AvailableNow picks up ONLY the new one (checkpoint)
    spark.createDataFrame(
        [(dt.datetime(2024, 1, 15, 11), 1, 60.0)],
        "datetime_utc timestamp, id_mercado int, precio double",
    ).write.mode("append").parquet(src)
    incremental_upsert_stream(
        spark, src, "datetime_utc timestamp, id_mercado int, precio double",
        lake, "precios", transform, ck,
    )
    out = lake.read_processed("precios")
    assert out.count() == 2
    assert {r["precio"] for r in out.collect()} == {50.0, 60.0}


def test_schema_drift_renames(spark):
    df = spark.createDataFrame(
        [("1", "x", "1,5")], "`Periodo` string, `Participante del Mercado` string, `Potencia Compra/Venta` string"
    )
    out = normalize_schema_drift(df)
    assert set(out.columns) == {
        "Hora",
        "Unidad de Programación",
        "Energía Compra/Venta",
    }
    # already-normalized frames pass through untouched
    assert normalize_schema_drift(out).columns == out.columns


def test_latest_raw_period(spark, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    assert latest_raw_period(lake, "diario", "volumenes_i90") is None
    df = spark.createDataFrame(
        [("2024-01-15", 1.0, 2024, 1), ("2024-03-02", 2.0, 2024, 3), ("2023-12-31", 3.0, 2023, 12)],
        "fecha string, volumenes double, year int, month int",
    )
    lake.write_raw(df, "diario", "volumenes_i90")
    assert latest_raw_period(lake, "diario", "volumenes_i90") == (2024, 3)
