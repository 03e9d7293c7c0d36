"""JDBC dimension scan / sink (S7/K4) — the reference reads its dims
from MySQL (utilidades/db_utils.py:52-166). The engine's default is
config-as-data + lake dim tables (config/market_config.py), but the
JDBC path is kept for parity; it needs a JDBC driver jar on the
classpath, so calls fail with a clear message in this container."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    columns: list[str] | None = None,
    where_clause: str | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """SELECT cols FROM table WHERE ... via spark.read.jdbc — pushdown
    happens through the dbtable subquery."""
    cols = ", ".join(columns) if columns else "*"
    query = f"(SELECT {cols} FROM {table}"
    if where_clause:
        query += f" WHERE {where_clause}"
    query += ") AS t"
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", query)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_table(
    df: DataFrame, url: str, table: str, mode: str = "append",
    properties: dict[str, str] | None = None,
) -> None:
    """Batch INSERT sink (K4). SCD-style keyed updates are done
    lake-side (operators/tracking.apply_changes) then overwritten here."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()
