"""SparkSession factory.

Single place where execution-relevant config lives, so every entry
point (tests, bench, driver harness) runs with the same plan-shaping
settings: AQE on, UTC session time zone, Arrow enabled, shuffle
partitions sized to the local core count rather than the 200 default.

At cluster scale the same builder applies — only master/memory change;
the semantic configs (timezone, AQE, partition-overwrite mode) are the
contract the engine relies on.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl_energy_tracker_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    Local mode is a single JVM; ``spark.driver.memory`` is the only
    memory knob. On a real cluster pass ``master=None`` and let
    spark-submit provide master/memory.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # deterministic UTC semantics — the lake stores tz-naive UTC
        # (reference: processed_file_utils.py:371-381) and the DuckDB
        # oracle compares UTC-naive timestamps.
        .config("spark.sql.session.timeZone", "UTC")
        # AQE: runtime coalesce, skew-join splitting, broadcast demotion.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for any pandas-interop path (multimodal UDFs).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # upsert sink overwrites only the partitions present in the
        # incoming batch (reference K3 semantics).
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # processed zone is zstd like the reference
        # (processed_file_utils.py:352).
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
