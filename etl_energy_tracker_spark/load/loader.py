"""Load facade (K5) — Spark rendering of
load/data_lake_loader.py:84-265: thin driver code around the lake
upsert that returns the reference's status-dict shape
(``{success, details{markets_processed, markets_failed, ...}}``) so
any scheduler (Airflow PythonOperator, cron spark-submit) can wrap it.
DataFrames never pass through scheduler state (no XCom frames) — the
lake is the hand-off."""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..lake import Lake


class DataLakeLoader:
    def __init__(self, lake: Lake):
        self.lake = lake

    def load_transformed_data(
        self, frames: dict[int, DataFrame], dataset: str
    ) -> dict:
        """Per-market upsert loop with per-market status capture
        (data_lake_loader.py:142-157)."""
        ok: list[int] = []
        failed: dict[int, str] = {}
        for market_id, df in frames.items():
            try:
                self.lake.upsert_processed(df, dataset)
                ok.append(market_id)
            except Exception as e:  # noqa: BLE001 - status dict, not control flow
                failed[market_id] = f"{type(e).__name__}: {e}"
        return {
            "success": not failed,
            "details": {
                "dataset": dataset,
                "markets_processed": ok,
                "markets_failed": failed,
            },
        }
