"""Physical-plan inspection utilities.

The engine's performance contract is plan-shaped: filters reach the
parquet scan, dims broadcast, co-located joins don't shuffle, scans
read only referenced columns. These helpers turn those expectations
into assertions usable from tests and audits (tests/test_scale_ops.py,
BASELINE.md plan-audit notes) instead of eyeballing .explain output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def plan_summary(df: DataFrame) -> dict[str, int]:
    """Operator census of the physical plan."""
    p = plan_string(df)
    return {
        "broadcast_hash_join": p.count("BroadcastHashJoin"),
        "sort_merge_join": p.count("SortMergeJoin"),
        "shuffled_hash_join": p.count("ShuffledHashJoin"),
        "shuffle_exchange": p.count("Exchange hashpartitioning"),
        "broadcast_exchange": p.count("BroadcastExchange"),
        "file_scans": p.count("FileScan"),
        "filters": p.count("+- Filter"),
    }


def count_joins(df: DataFrame) -> int:
    s = plan_summary(df)
    return s["broadcast_hash_join"] + s["sort_merge_join"] + s["shuffled_hash_join"]


def assert_pushed_filters(df: DataFrame, *columns: str) -> None:
    """Assert the scan carries pushed filters on the given columns."""
    p = plan_string(df)
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", p))
    missing = [c for c in columns if c not in pushed]
    if missing:
        raise AssertionError(
            f"filters on {missing} not pushed to scan; PushedFilters={pushed!r}"
        )


def assert_no_shuffle(df: DataFrame) -> None:
    p = plan_string(df)
    if "Exchange hashpartitioning" in p:
        raise AssertionError(f"plan contains a shuffle exchange:\n{p}")
