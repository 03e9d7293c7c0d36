"""Scale-mechanics operators: observe metrics, salted joins, bucketed
co-located joins (plan-level assertions, not just results)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_energy_tracker_spark.functions.metrics import observe_value_quality
from etl_energy_tracker_spark.operators.bucketing import bucketed_join, write_bucketed
from etl_energy_tracker_spark.operators.skew import salted_join


def test_observe_value_quality(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (0.0,), (-3.0,), (None,)], "v double"
    )
    observed, obs = observe_value_quality(df, "v")
    assert observed.count() == 5  # action triggers metric collection
    m = obs.get
    assert m["n_rows"] == 5 and m["n_null"] == 1
    assert m["n_negative"] == 1 and m["n_zero"] == 1
    assert m["min"] == -3.0 and m["max"] == 2.0


def test_salted_join_matches_plain_join(spark):
    # heavy skew: 90% of fact rows on one key
    fact = spark.createDataFrame(
        [(1, i) for i in range(900)] + [(k, 0) for k in range(2, 102)],
        "key int, payload int",
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(1, 102)], "key int, name string")
    plain = fact.join(dim, "key").groupBy("key", "name").count()
    salted = salted_join(fact, dim, "key").groupBy("key", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_has_no_exchange(spark):
    # warehouse.dir is a static conf; managed tables land in the default
    # warehouse and are dropped (data included) at the end. The catalog
    # is in-memory, so also clear any orphaned directory from a previous
    # aborted run.
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("t_left", "t_right"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed(left, "t_left", ["k"], n_buckets=4)
    write_bucketed(right, "t_right", ["k"], n_buckets=4)
    # force the non-broadcast path: tiny test tables would otherwise be
    # auto-broadcast and never exercise bucket co-location
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "t_left", "t_right", ["k"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: sort-merge join with no shuffle on either side
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_left")
        spark.sql("DROP TABLE IF EXISTS t_right")
