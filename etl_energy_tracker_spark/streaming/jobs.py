"""Structured Streaming jobs.

The reference is daily batch (Airflow '0 23 * * *'); its natural Spark
upgrade is incremental processing of the raw zone with
Trigger.AvailableNow — same semantics as the batch pipelines (the
transforms are shared functions), but new files are picked up
automatically with checkpointed exactly-once progress, and the lake
upsert runs per micro-batch via foreachBatch.

``hourly_event_agg_stream`` is the windowed-aggregation path: watermark
+ tumbling window, driven to completion synchronously with
processAllAvailable for tests/oracle comparison.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake import Lake


def hourly_event_agg_stream(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour window aggregation over the events table read as
    a stream; returns the final (batch-equivalent) result DataFrame.

    Late data handling: event-time watermark bounds state; `complete`
    output to a memory sink makes the synchronous drive deterministic
    (every window emitted once all files are processed)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string"
    )
    # streaming file sources need a directory; select the one table via
    # a glob filter over the sf dir
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("hour_ts"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def incremental_upsert_stream(
    spark: SparkSession,
    source_glob: str,
    schema: str,
    lake: Lake,
    dataset: str,
    transform,
    checkpoint_dir: str,
) -> None:
    """Incremental raw-zone → processed-zone pipeline: stream new raw
    files, apply the shared batch transform, upsert each micro-batch
    into the lake (exactly-once via checkpointed source progress +
    idempotent keyed upsert). Trigger.AvailableNow processes the
    backlog then stops — the scheduled-batch replacement."""
    stream = spark.readStream.schema(schema).parquet(source_glob)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        lake.upsert_processed(transform(batch_df), dataset)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
