"""Invariant tests for the streaming funnel, incremental aggregate
maintenance, and compaction planning operators."""

from __future__ import annotations

from etl_energy_tracker_spark.queries.behaviorops import funnel_conversion
from etl_energy_tracker_spark.queries.cdcops import incremental_agg_maintenance
from etl_energy_tracker_spark.queries.hygieneops import compaction_bin_packing
from etl_energy_tracker_spark.queries.streamops import stream_funnel_stage

from conftest import SF_DIR


def _us(ts):
    import datetime

    if ts is None:
        return -1
    epoch = datetime.datetime(1970, 1, 1, tzinfo=ts.tzinfo)
    return int((ts - epoch).total_seconds() * 1_000_000)


def test_stream_funnel_equals_batch_funnel(spark):
    batch = {
        r.user_id: (_us(r.ts_view), _us(r.ts_click), _us(r.ts_purchase), r.stage)
        for r in funnel_conversion(spark, SF_DIR).collect()
    }
    stream = {
        r.user_id: (r.ts_view_us, r.ts_click_us, r.ts_purchase_us, r.stage)
        for r in stream_funnel_stage(spark, SF_DIR).collect()
    }
    assert stream == batch


def test_ivm_merge_equals_full_recompute(spark):
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    full = {
        (r.user_id, r.n): float(r.s)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("s"),
        )
        .collect()
    }
    rows = incremental_agg_maintenance(spark, SF_DIR).collect()
    got = {(r.user_id, r.n_events): r.sum_value for r in rows}
    assert got == full
    for r in rows:
        assert r.n_base + r.n_delta == r.n_events


def test_compaction_bins_are_key_contiguous(spark):
    rows = sorted(compaction_bin_packing(spark, SF_DIR).collect(), key=lambda r: r.bin)
    n = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    assert sum(r.total_rows for r in rows) == n
    # key-ordered packing: bins must not interleave in ym space
    for a, b in zip(rows, rows[1:]):
        assert a.max_ym < b.min_ym
        assert a.min_ym <= a.max_ym
