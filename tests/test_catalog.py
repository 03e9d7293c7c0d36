"""Catalog contract tests: every declared query runs at sf0.001,
returns a schema-stable DataFrame, and a sampled subset hash-matches
its DuckDB oracle (the full matrix runs in tools/check_correctness.py
and the driver's t2 gate).
"""

from __future__ import annotations

import duckdb
import pytest

from etl_energy_tracker_spark.queries import catalog
from etl_energy_tracker_spark.sources.registry import TABLES

from conftest import SF_DIR

QUERIES = catalog.queries()
ORACLES = catalog.oracle_sql()

# fast-but-representative subset for the per-test oracle comparison
ORACLE_SAMPLE = [
    "q1_pricing_summary",
    "filter_latest_day",
    "keep_last_dedup",
    "session_differencing",
    "linking_profile_hash",
    "text_fingerprint",
    "ann_cosine_topk",
    "expand_hourly_to_15min",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_catalog_is_populated():
    assert len(QUERIES) >= 40
    # every oracle key matches a query key
    assert set(ORACLES) <= set(QUERIES)


def test_priority_queue_names_resolve():
    # a typo in the re-verification bookkeeping would silently reorder
    # the driver's capped run — every queue name must be a real query
    names = set(QUERIES)
    assert set(catalog._PRIORITY) <= names
    assert (
        catalog._R1_VERIFIED
        | catalog._R3_VERIFIED
        | catalog._R4_VERIFIED
        | catalog._R5_VERIFIED
    ) <= names
    # and the ordering is a permutation of the catalog (no dupes/drops)
    ordered = catalog._ordered()
    assert sorted(ordered) == sorted(names)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns, name
    assert df.count() >= 0


@pytest.mark.parametrize("name", ORACLE_SAMPLE)
def test_query_matches_oracle(spark, name):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import frame_digest

    sdf = QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    con = _duck()  # keep the connection alive while the relation is read
    rel = con.sql(ORACLES[name])
    orows = rel.fetchall()
    assert len(srows) == len(orows), name
    assert frame_digest(sdf.columns, srows) == frame_digest(rel.columns, orows), name
