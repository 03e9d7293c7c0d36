"""Testdata / lake table registry.

The driver harness materializes deterministic parquet tables (see
/root/repo/TESTDATA.md). This module is the single place that maps
logical table names to parquet paths and registers them as temp views
so both the DataFrame-API queries and ``spark.sql`` queries resolve
the same relations.

Scale notes: ``spark.read.parquet`` gives Catalyst partition discovery
+ predicate pushdown for free; at 100 TB these would be external
tables over a partitioned layout (see ``lake.py``) — the query code
is identical either way, which is the point of routing every read
through here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

# The driver's parquet files carry TIMESTAMP(NANOS) columns, which the
# Spark vectorized reader rejects. We read them as int64 nanos
# (legacy.parquet.nanosAsLong) and convert with exact integer division
# — `DIV 1000` keeps microsecond precision where a double divide would
# round at the 1e18-nanos magnitude. DuckDB truncates ns→us the same
# way, so both engines see identical timestamps.
_TS_COLS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def sf_dir_or_default(sf_dir: str | None = None) -> str:
    return sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # defensive: oracle comparison assumes UTC-naive semantics even when
    # the caller built its own session (the driver harness does).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir_or_default(sf_dir)}/{name}.parquet")
    for c in _TS_COLS.get(name, ()):
        dtype = dict(df.dtypes).get(c)
        if dtype == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
        elif dtype == "timestamp_ntz":
            # TIMESTAMP(MICROS, isAdjustedToUTC=false) infers as NTZ on
            # Spark 4; the engine's contract is tz-aware TIMESTAMP under a
            # UTC session zone, so the cast is a bit-identical relabel.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table_split(
    spark: SparkSession, name: str, sf_dir: str | None = None
) -> DataFrame:
    """load_table + repartition to defaultParallelism.

    The toy-SF tables are single parquet files under
    spark.sql.files.maxPartitionBytes, so they read as ONE partition
    and serialize any map-heavy first stage (charhash folds, token
    explodes, per-vector scoring) onto one core — measured 3.5x on
    the scale probe, whose multi-file layout parallelized the same
    op. At production scale the input is already split and the
    repartition is the only cost, so use this ONLY for operators
    whose first stage does real per-row compute; scan-then-shuffle
    operators get their parallelism from the first exchange anyway.
    """
    return load_table(spark, name, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )


def events_ts_is_nanos(sf_dir: str | None = None) -> bool:
    """True when the events parquet stores ``ts`` as TIMESTAMP(NANOS)
    (testdata encoding has flipped between rounds: r1 nanos, r2
    micros). One footer read; lets the streaming reader share batch
    ``load_table``'s both-encodings contract — a fixed reader schema
    would fail at read time if nanos testdata reappears."""
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    t = pq.read_schema(
        f"{sf_dir_or_default(sf_dir)}/events.parquet"
    ).field("ts").type
    return pat.is_timestamp(t) and t.unit == "ns"


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Register every table as a temp view named after itself."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
