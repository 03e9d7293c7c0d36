"""Round-10 operator tests: ADVICE r9 regression fixes (best-of-n
small-group NULLIF guard, post-stratification broadcast quartiles)
plus the round's new operators. Each mirrors the operator in plain
Python over collected rows or proves the crash-class fix on a
synthetic degenerate table (the catalog contract tests cover the
DuckDB oracle at the driver gate)."""

from __future__ import annotations

import math

import duckdb
import pytest

from conftest import SF_DIR


def _duck_rows(sql: str):
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.sql(sql).fetchall()


# ------------------------------------------ best-of-n small groups


def test_best_of_n_small_groups(spark, tmp_path):
    # ADVICE r9: the per-rank weight product (i-j)/(n_s-j) is evaluated
    # per row inside SUM(), so the CASE WHEN MAX(n_s) >= n guard did
    # not prevent evaluation — a group with n_s < n hit n_s - j = 0 and
    # ANSI Spark threw DIVIDE_BY_ZERO while DuckDB returned NULL. Now
    # the denominator is NULLIF(n_s - j, 0): NULL weight -> NULL sum ->
    # the guard's NULL, identical on both engines. Groups of size
    # 1 / 3 / 5 exercise all three curve points' guard paths.
    from etl_energy_tracker_spark.queries.catalog import oracle_sql
    from etl_energy_tracker_spark.queries.evalops import best_of_n_curve

    import datetime as dt

    ts = dt.datetime(2024, 1, 1)
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, ts, 1, "lonely", 7.25, "{}"),
        (2, ts, 1, "trio", 1.00, "{}"),
        (3, ts, 1, "trio", 2.00, "{}"),
        (4, ts, 1, "trio", 4.00, "{}"),
        (5, ts, 1, "five", 1.00, "{}"),
        (6, ts, 1, "five", 2.00, "{}"),
        (7, ts, 1, "five", 3.00, "{}"),
        (8, ts, 1, "five", 4.00, "{}"),
        (9, ts, 1, "five", 5.00, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r.event_type: (r.eb2_decimilli, r.eb4_decimilli, r.eb8_decimilli)
        for r in best_of_n_curve(spark, str(tmp_path)).collect()
    }
    # n_s=1: all NULL; n_s=3: only eb2; n_s=5: eb2+eb4; never a crash.
    assert got["lonely"] == (None, None, None)
    assert got["trio"][0] is not None
    assert got["trio"][1] is None and got["trio"][2] is None
    assert got["five"][0] is not None and got["five"][1] is not None
    assert got["five"][2] is None
    # exact value check on the trio: E[max of 2 of {100,200,400}] via
    # the estimator's own flooring: w_i = floor(1e6*2*(i-1)/(n_s-1)
    # / n_s) -> (0, 333333, 666666); floor(sum(c*w)/100) = 3333330
    # (the unfloored (200+400+400)/3 cents is 3333333.3 deci-milli).
    assert got["trio"][0] == 3333330
    # oracle side agrees row-for-row on the same degenerate table
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    orows = {
        r[0]: (r[3], r[4], r[5])
        for r in con.sql(oracle_sql()["best_of_n_curve"]).fetchall()
    }
    assert orows == got
