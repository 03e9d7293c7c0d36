"""Job entry points — the orchestration surface (SURVEY §3.1 step 4).

Each job is extract → transform → load over the two-zone lake and
returns the reference's status-dict shape
(dags/ESIOS/esios_precios_etl_dag.py:97-156), so any scheduler can
wrap it: Airflow PythonOperator, cron spark-submit, or Structured
Streaming Trigger.AvailableNow for the incremental variant
(streaming/jobs.py). DataFrames never cross the scheduler boundary —
the lake is the hand-off (no XCom frames)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import timegrid as tg
from .lake import Lake
from .load.loader import DataLakeLoader
from .pipelines import curtailments as curt_pipeline
from .pipelines import esios as esios_pipeline
from .pipelines import i90 as i90_pipeline
from .pipelines.common import filter_date_mode


def run_esios_precios_etl(
    spark: SparkSession,
    lake: Lake,
    raw: DataFrame,
    mode: str = "latest",
    start: str | None = None,
    end: str | None = None,
) -> dict:
    """Daily ESIOS price job: F1 date filter → transform → upsert."""
    try:
        filtered = filter_date_mode(raw, "datetime_utc", mode, start, end)
        processed = esios_pipeline.transform_price_data(spark, filtered)
        return DataLakeLoader(lake).load_transformed_data({0: processed}, "precios")
    except Exception as e:  # noqa: BLE001 - job surface returns status
        return {"success": False, "details": {"error": f"{type(e).__name__}: {e}"}}


def run_i90_volumenes_etl(
    spark: SparkSession,
    lake: Lake,
    raw: DataFrame,
    market_ids: list[int],
    mode: str = "latest",
    start: str | None = None,
    end: str | None = None,
    error_list: DataFrame | None = None,
) -> dict:
    """Per-market I90 volume job (transform/i90_transform.py routing).
    ``error_list`` defaults to the config seed (F10: known-bad
    (fecha, sheet) pairs are excluded during ingest)."""
    from .config.market_config import i90_errores_df

    dim = tg.dst_dim(spark)
    if error_list is None:
        error_list = i90_errores_df(spark)
    frames: dict[int, DataFrame] = {}
    errors: dict[int, str] = {}
    filtered = filter_date_mode(raw, "fecha", mode, start, end)
    for mid in market_ids:
        try:
            frames[mid] = i90_pipeline.transform_volumenes(
                filtered, mid, dim, errors=error_list
            )
        except Exception as e:  # noqa: BLE001
            errors[mid] = f"{type(e).__name__}: {e}"
    status = DataLakeLoader(lake).load_transformed_data(frames, "volumenes_i90")
    status["details"]["markets_failed"].update(errors)
    status["success"] = status["success"] and not errors
    return status


def run_curtailment_etl(
    spark: SparkSession,
    lake: Lake,
    raw: DataFrame,
    mode: str = "latest",
    start: str | None = None,
    end: str | None = None,
) -> dict:
    try:
        dim = tg.dst_dim(spark)
        filtered = filter_date_mode(raw, "fecha", mode, start, end)
        processed = curt_pipeline.transform(filtered, dim)
        return DataLakeLoader(lake).load_transformed_data(
            {13: processed}, "curtailments_i90"
        )
    except Exception as e:  # noqa: BLE001
        return {"success": False, "details": {"error": f"{type(e).__name__}: {e}"}}


def run_omie_volumenes_etl(
    spark: SparkSession,
    lake: Lake,
    raw: DataFrame,
    mode: str = "latest",
    start: str | None = None,
    end: str | None = None,
) -> dict:
    from .pipelines import omie as omie_pipeline
    from .pipelines.common import normalize_schema_drift

    try:
        dim = tg.dst_dim(spark)
        filtered = filter_date_mode(
            normalize_schema_drift(raw), "Fecha", mode, start, end
        )
        processed = omie_pipeline.transform_volumenes(filtered, dim)
        return DataLakeLoader(lake).load_transformed_data(
            {0: processed}, "volumenes_omie"
        )
    except Exception as e:  # noqa: BLE001
        return {"success": False, "details": {"error": f"{type(e).__name__}: {e}"}}


def run_i3_volumenes_etl(
    spark: SparkSession,
    lake: Lake,
    raw: DataFrame,
    market_id: int | None = None,
    mode: str = "latest",
    start: str | None = None,
    end: str | None = None,
) -> dict:
    from .pipelines import i3 as i3_pipeline

    try:
        dim = tg.dst_dim(spark)
        filtered = filter_date_mode(raw, "fecha", mode, start, end)
        processed = i3_pipeline.transform_volumenes(spark, filtered, dim, market_id)
        return DataLakeLoader(lake).load_transformed_data(
            {market_id or 0: processed}, "volumenes_i3"
        )
    except Exception as e:  # noqa: BLE001
        return {"success": False, "details": {"error": f"{type(e).__name__}: {e}"}}
