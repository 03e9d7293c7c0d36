"""Lake upsert semantics (FIXTURES.md §4.4): same partition written
twice with overlapping keys → keep-last wins; untouched partitions
survive; reader prunes by date/market."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_energy_tracker_spark.lake import Lake


def _precios(spark, rows):
    return spark.createDataFrame(
        rows, "datetime_utc timestamp, id_mercado int, precio double"
    )


@pytest.fixture()
def lake(spark, tmp_path):
    return Lake(spark, str(tmp_path / "lake"))


T0 = dt.datetime(2024, 1, 15, 10)
T1 = dt.datetime(2024, 1, 15, 11)
T2 = dt.datetime(2024, 2, 2, 9)


def test_upsert_keep_last(spark, lake):
    lake.upsert_processed(_precios(spark, [(T0, 1, 50.0), (T1, 1, 60.0), (T2, 1, 70.0)]), "precios")
    first = lake.read_processed("precios")
    assert first.count() == 3

    # re-ingest January with a corrected price for T0 — precios dedup
    # key is (datetime_utc, id_mercado, precio), so a *changed* price is
    # a new row (reference semantics: keys include the value column) and
    # an identical row dedups to one.
    lake.upsert_processed(_precios(spark, [(T0, 1, 50.0), (T1, 1, 61.0)]), "precios")
    out = lake.read_processed("precios")
    rows = {(r["datetime_utc"], r["precio"]) for r in out.collect()}
    assert (T0, 50.0) in rows  # identical re-ingest deduped
    assert (T1, 60.0) in rows and (T1, 61.0) in rows  # changed price adds a row
    assert (T2, 70.0) in rows  # February untouched by January upsert
    assert out.count() == 4


def test_upsert_keep_last_on_keyed_dataset(spark, lake):
    # volumenes_i90 keys include volumenes; a true keep-last case is an
    # identical key row arriving twice — latest _ingest_seq wins and
    # count stays 1.
    df = spark.createDataFrame(
        [(T0, "ABO3", 10.0, 1)],
        "datetime_utc timestamp, up string, volumenes double, id_mercado int",
    )
    lake.upsert_processed(df, "volumenes_i90")
    lake.upsert_processed(df, "volumenes_i90")
    out = lake.read_processed("volumenes_i90")
    assert out.count() == 1


def test_mic_no_dedup(spark, lake):
    df = spark.createDataFrame(
        [(T0, "UOF1", 5.0, 45.1, 21, "2024-01-15")] * 2,
        "datetime_utc timestamp, uof string, volumenes double, precio double, "
        "id_mercado int, fecha_fichero string",
    )
    lake.upsert_processed(df, "volumenes_mic")
    assert lake.read_processed("volumenes_mic").count() == 2


def test_reader_prunes(spark, lake):
    lake.upsert_processed(
        _precios(spark, [(T0, 1, 50.0), (T2, 2, 70.0)]), "precios"
    )
    jan = lake.read_processed("precios", start="2024-01-01", end="2024-01-31 23:59:59")
    assert jan.count() == 1
    only2 = lake.read_processed("precios", mercado_ids=[2])
    assert only2.count() == 1
    cols = lake.read_processed("precios", columns=["datetime_utc", "precio"])
    assert cols.columns == ["datetime_utc", "precio"]
    # partition filters must reach the scan (pruning, not post-filter)
    plan = jan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_raw_append_dedup(spark, lake):
    df = spark.createDataFrame(
        [("2024-01-15", "00-01", 10.0, 2024, 1)],
        "fecha string, hora string, volumenes double, year int, month int",
    )
    lake.write_raw(df, "diario", "volumenes_i90")
    lake.write_raw(df, "diario", "volumenes_i90")  # exact re-ingest dedups
    assert lake.read_raw("diario", "volumenes_i90").count() == 1


def _leaf_file_counts(root):
    import os

    counts = {}
    for dirpath, _dirs, files in os.walk(root):
        pq = [f for f in files if f.endswith(".parquet")]
        if pq:
            counts[os.path.relpath(dirpath, root)] = len(pq)
    return counts


def _fragment_leaf(root, leaf, copies=2):
    """Simulate the small files a multi-task append run leaves behind by
    duplicating the leaf's parquet file."""
    import glob
    import os
    import shutil

    src = glob.glob(os.path.join(root, leaf, "*.parquet"))[0]
    for i in range(copies):
        shutil.copy(src, os.path.join(root, leaf, f"copy{i}-{os.path.basename(src)}"))


def test_compaction(spark, lake):
    from etl_energy_tracker_spark.lake import compact_processed

    lake.upsert_processed(
        _precios(spark, [(T0, 1, 50.0), (T1, 1, 51.0)]), "precios"
    )
    lake.upsert_processed(_precios(spark, [(T2, 1, 70.0)]), "precios")
    root = lake.processed_path("precios")
    jan = next(l for l in _leaf_file_counts(root) if "month=1" in l)
    _fragment_leaf(root, jan, copies=2)  # January: 3 files; February: 1

    pre = _leaf_file_counts(root)
    assert pre[jan] == 3
    before = lake.read_processed("precios").count()

    n = compact_processed(lake, "precios")
    assert n == sum(1 for c in pre.values() if c >= 2) == 1
    post = _leaf_file_counts(root)
    # fragmented leaves collapse to one file; clean leaves untouched
    for leaf, c in pre.items():
        assert post[leaf] == (1 if c >= 2 else c)
    after = lake.read_processed("precios")
    assert after.count() == before
    assert {r["precio"] for r in after.collect()} == {50.0, 51.0, 70.0}
    # idempotent: nothing fragmented remains
    assert compact_processed(lake, "precios") == 0


def test_compaction_plan_parallelism(spark, lake):
    """The rewrite plan must parallelize across leaves — at least one
    task per fragmented leaf, and no single-partition exchange (the
    round-1 bug funneled the whole table through numPartitions=1)."""
    from etl_energy_tracker_spark.lake import compaction_plan

    lake.upsert_processed(
        _precios(spark, [(T0, 1, 50.0), (T2, 2, 51.0)]), "precios"
    )
    root = lake.processed_path("precios")
    for leaf in _leaf_file_counts(root):
        _fragment_leaf(root, leaf, copies=1)  # both leaves: 2 files
    plan = compaction_plan(lake, "precios")
    assert plan is not None
    df, leaves = plan
    assert len(leaves) == 2
    # each leaf maps to its own shuffle partition (range partitioning
    # keys lead with the partition columns)
    per_leaf = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("mercado", "id_mercado", "year", "month")
        .agg(F.countDistinct("pid").alias("n_tasks"))
        .collect()
    )
    assert len(per_leaf) == 2
    assert all(r["n_tasks"] >= 1 for r in per_leaf)
    assert df.rdd.getNumPartitions() >= len(leaves)
    plan_str = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan_str


def test_omie_i3_jobs(spark, tmp_path):
    import etl_energy_tracker_spark.jobs as jobs
    from etl_energy_tracker_spark.lake import Lake

    lake = Lake(spark, str(tmp_path / "lake2"))
    raw_omie = spark.createDataFrame(
        [("2024-01-15", "11", "UOF1", "100,00", "C", "V", 1)],
        "Fecha string, Hora string, Unidad string, `Energía Compra/Venta` string, "
        "`Ofertada (O)/Casada (C)` string, `Tipo Oferta` string, id_mercado int",
    )
    st = jobs.run_omie_volumenes_etl(spark, lake, raw_omie, mode="latest")
    assert st["success"], st
    assert lake.read_processed("volumenes_omie").count() == 4

    raw_i3 = spark.createDataFrame(
        [("2024-01-15", "41", "Quince minutos", 12.0, "Eólica", "PHF-2")],
        "fecha string, hora string, granularity string, volumenes double, "
        "Concepto string, Programa string",
    )
    st = jobs.run_i3_volumenes_etl(spark, lake, raw_i3, mode="latest")
    assert st["success"], st
    assert lake.read_processed("volumenes_i3").count() == 1
