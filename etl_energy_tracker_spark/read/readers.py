"""Programmatic query surface — Spark rendering of the reference's
read layer (read/precios_reader.py, utilidades/db_utils.py:224-301):
typed readers over the processed lake with market/date validation, and
lake-table registration for ad-hoc Spark SQL.

All filters route through Lake.read_processed, so every read is
partition-pruned (mercado/id_mercado/year/month directories) before
parquet row-group stats prune inside files."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config.market_config import MARKET_BY_ID, MARKETS
from ..lake import Lake
from ..schemas import PROCESSED_SCHEMAS


def _validate_ids(mercado_ids: list[int] | None) -> None:
    if mercado_ids:
        bad = [i for i in mercado_ids if i not in MARKET_BY_ID]
        if bad:
            raise ValueError(
                f"unknown market ids {bad}; valid: 1..{max(MARKET_BY_ID)}"
            )


class PreciosReader:
    """Price reads (read/precios_reader.py analog)."""

    def __init__(self, lake: Lake):
        self.lake = lake

    def read(
        self,
        start: str | None = None,
        end: str | None = None,
        mercado_ids: list[int] | None = None,
        columns: list[str] | None = None,
    ) -> DataFrame:
        _validate_ids(mercado_ids)
        return self.lake.read_processed(
            "precios", start=start, end=end, mercado_ids=mercado_ids, columns=columns
        )


class VolumenesReader:
    """Volume reads across the i90/omie/mic/i3 datasets."""

    DATASETS = ("volumenes_i90", "volumenes_omie", "volumenes_mic", "volumenes_i3")

    def __init__(self, lake: Lake):
        self.lake = lake

    def read(
        self,
        dataset: str,
        start: str | None = None,
        end: str | None = None,
        mercado_ids: list[int] | None = None,
        columns: list[str] | None = None,
    ) -> DataFrame:
        if dataset not in self.DATASETS:
            raise ValueError(f"unknown volumenes dataset {dataset!r}")
        _validate_ids(mercado_ids)
        return self.lake.read_processed(
            dataset, start=start, end=end, mercado_ids=mercado_ids, columns=columns
        )


def register_lake_tables(spark: SparkSession, lake: Lake) -> list[str]:
    """Register every existing processed dataset as a temp view so
    `spark.sql` (and the NL→SQL path) can query the lake directly —
    the Spark analog of DuckDB's read_parquet(..., hive_partitioning=1)
    registration (db_utils.py:224-301)."""
    registered = []
    for dataset in PROCESSED_SCHEMAS:
        try:
            lake.read_processed(dataset).createOrReplaceTempView(dataset)
            registered.append(dataset)
        except Exception:  # dataset not materialized yet
            continue
    return registered
