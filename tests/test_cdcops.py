"""Invariant tests for cdcops.py."""

from __future__ import annotations

from collections import defaultdict

from etl_energy_tracker_spark.queries.cdcops import (
    cdc_apply_changes,
    scd2_point_in_time_join,
    table_profile_stats,
)

from conftest import SF_DIR


def _op(t):
    return "I" if t == "signup" else ("D" if t == "error" else "U")


def test_cdc_final_state_matches_python(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    last = {}
    for e in sorted(events, key=lambda e: e.event_id):
        last[e.user_id] = e
    expect = {
        u: (e.event_id, e.value, _op(e.event_type))
        for u, e in last.items()
        if _op(e.event_type) != "D"
    }
    rows = cdc_apply_changes(spark, SF_DIR).collect()
    got = {r.user_id: (r.last_seq, r.last_value, r.last_op) for r in rows}
    assert got == expect


def test_scd2_exactly_one_version_per_purchase(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    purchases = [e for e in events if e.event_type == "purchase"]
    rows = scd2_point_in_time_join(spark, SF_DIR).collect()
    # a purchase is itself an Update change, so it always has a valid
    # version; SCD2 intervals are disjoint, so exactly one matches
    assert len(rows) == len(purchases)
    assert len({r.event_id for r in rows}) == len(rows)
    # the matched version must not start after the fact's timestamp
    ts_of = {e.event_id: e.ts for e in events}
    changes = defaultdict(list)
    for e in events:
        if _op(e.event_type) in ("I", "U"):
            changes[e.user_id].append(e)
    for r in rows:
        fact_ts = ts_of[r.event_id]
        vers = sorted(changes[r.user_id], key=lambda e: (e.ts, e.event_id))
        valid = None
        for i, v in enumerate(vers):
            nxt = vers[i + 1].ts if i + 1 < len(vers) else None
            if fact_ts >= v.ts and (nxt is None or fact_ts < nxt):
                valid = v
                break
        assert valid is not None
        assert (r.version_seq, r.version_value) == (valid.event_id, valid.value)


def test_profile_stats_consistency(spark):
    rows = {r.col: r for r in table_profile_stats(spark, SF_DIR).collect()}
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n = li.count()
    flags = {x.l_returnflag for x in li.select("l_returnflag").distinct().collect()}
    assert len(rows) == 6
    for r in rows.values():
        assert r.n_rows == n
        assert 0 <= r.n_nulls <= n
        assert r.n_distinct <= n - r.n_nulls
    assert rows["l_returnflag"].n_distinct == len(flags)
    assert rows["l_returnflag"].min_str == min(flags)
    assert rows["l_returnflag"].max_str == max(flags)
    assert rows["l_quantity"].min_num <= rows["l_quantity"].max_num


def test_dq_expectations_single_scan_and_values(spark):
    """All five constraints come from ONE aggregate (single scan of
    orders in the plan) and metrics match a Python recompute."""
    from etl_energy_tracker_spark.queries.cdcops import dq_expectations_report

    df = dq_expectations_report(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("orders.parquet") <= 1 or plan.count("Scan parquet") <= 1

    rows = {r["constraint_name"]: r for r in df.collect()}
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    n = len(orders)
    assert rows["row_count_min_100"]["metric"] == n
    assert rows["row_count_min_100"]["passed"] == (n >= 100)
    n_ck = sum(1 for r in orders if r["o_custkey"] is not None)
    assert rows["custkey_complete"]["metric"] == n_ck * 1000000 // n
    n_uk = len({r["o_orderkey"] for r in orders})
    assert rows["orderkey_unique"]["metric"] == n_uk * 1000000 // n
    assert rows["orderkey_unique"]["passed"] == (n_uk == n)
    n_pos = sum(1 for r in orders if r["o_totalprice"] > 0)
    assert rows["totalprice_positive"]["passed"] == (n_pos == n)
    n_dom = sum(1 for r in orders if r["o_orderstatus"] in ("O", "F", "P"))
    assert rows["status_in_domain"]["metric"] == n_dom * 1000000 // n
