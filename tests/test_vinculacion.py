"""Vinculación monitoring loop (operators/vinculacion.py) — the
93-day eligibility queue, change diff/classification, change log,
link-table update, and the retry-outcome loop (reference:
vinculacion/_vinculacion_monitoring.py, vinculacion_main.py)."""

from __future__ import annotations

import pytest

import datetime as dt

from pyspark.sql import functions as F

from etl_energy_tracker_spark.operators import vinculacion as V

AS_OF = "2026-08-13"


def _day(days_ago: int) -> dt.date:
    return dt.date(2026, 8, 13) - dt.timedelta(days=days_ago)


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "UP string, field_changed string, date_updated date"
    )


def _links(spark, rows):
    return spark.createDataFrame(rows, "UP string, UOF string, date_updated date")


def test_eligibility_window_and_states(spark):
    log = _log(
        spark,
        [
            ("UP_OLD", "habilitada", _day(100)),   # eligible
            ("UP_EDGE", "habilitada", _day(93)),   # exactly 93 -> eligible
            ("UP_YOUNG", "habilitada", _day(92)),  # too recent
            ("UP_GONE", "habilitada", _day(150)),  # obsoleted later
            ("UP_GONE", "obsoleta", _day(120)),
            ("UP_BACK", "obsoleta", _day(200)),    # re-enabled later wins
            ("UP_BACK", "habilitada", _day(110)),
            ("UP_TIE", "habilitada", _day(95)),    # same-day tie:
            ("UP_TIE", "obsoleta", _day(95)),      #   obsoleta wins
            ("UP_LINKED", "habilitada", _day(400)),  # already linked
        ],
    )
    links = _links(spark, [("UP_LINKED", "UOF_L", _day(10))])
    out = {
        r["UP"]: (r["enabled_date"], r["days_enabled"])
        for r in V.eligible_ups(log, links, AS_OF).collect()
    }
    assert set(out) == {"UP_OLD", "UP_EDGE", "UP_BACK"}
    assert out["UP_OLD"] == (_day(100), 100)
    assert out["UP_EDGE"] == (_day(93), 93)
    assert out["UP_BACK"] == (_day(110), 110)


def test_find_changes_classification(spark):
    cur = _links(
        spark,
        [
            ("UP_SAME", "UOF_A", _day(30)),
            ("UP_MOVED", "UOF_B", _day(30)),
            ("UP_LOST", "UOF_C", _day(30)),
        ],
    )
    new = spark.createDataFrame(
        [("UP_SAME", "UOF_A"), ("UP_MOVED", "UOF_Z"), ("UP_FRESH", "UOF_N")],
        "UP string, UOF string",
    )
    changes, new_links = V.find_link_changes(cur, new)
    ch = {r["UP"]: (r["uof_old"], r["uof_new"]) for r in changes.collect()}
    assert ch == {
        "UP_MOVED": ("UOF_B", "UOF_Z"),
        "UP_LOST": ("UOF_C", "unknown"),
    }
    assert [tuple(r) for r in new_links.collect()] == [("UP_FRESH", "UOF_N")]


def test_classify_and_change_log(spark):
    changes = spark.createDataFrame(
        [
            ("UP_MOVED", "UOF_B", "UOF_Z"),
            ("UP_DEAD", "UOF_C", "unknown"),   # obsolete in listado
            ("UP_ALIVE", "UOF_D", "unknown"),  # active but unmatched
        ],
        "UP string, uof_old string, uof_new string",
    )
    listado = spark.createDataFrame(
        [("UP_MOVED", 0), ("UP_DEAD", 1), ("UP_ALIVE", 0)],
        "UP string, obsoleta int",
    )
    classified = V.classify_unlinked(changes, listado)
    kinds = {r["UP"]: (r["kind"], r["uof_new"]) for r in classified.collect()}
    assert kinds == {
        "UP_MOVED": ("uof_change", "UOF_Z"),
        "UP_DEAD": ("obsolete", None),
        "UP_ALIVE": ("unknown", "unknown"),
    }
    # reference logs UOF moves and obsoletions; 'unknown' is debug-only
    log = {
        r["UP"]: (r["field_changed"], r["old_value"], r["new_value"])
        for r in V.vinculacion_change_log(classified, AS_OF).collect()
    }
    assert log == {
        "UP_MOVED": ("UOF", "UOF_B", "UOF_Z"),
        "UP_DEAD": ("obsoleta", "UOF_C", None),
    }


def test_apply_link_updates(spark):
    cur = _links(
        spark,
        [
            ("UP_SAME", "UOF_A", _day(30)),
            ("UP_MOVED", "UOF_B", _day(30)),
            ("UP_DEAD", "UOF_C", _day(30)),
            ("UP_ALIVE", "UOF_D", _day(30)),
        ],
    )
    classified = spark.createDataFrame(
        [
            ("UP_MOVED", "UOF_B", "UOF_Z", "uof_change"),
            ("UP_DEAD", "UOF_C", None, "obsolete"),
            ("UP_ALIVE", "UOF_D", "unknown", "unknown"),
        ],
        "UP string, uof_old string, uof_new string, kind string",
    )
    new_links = spark.createDataFrame(
        [("UP_FRESH", "UOF_N")], "UP string, uof_new string"
    )
    out = {
        r["UP"]: (r["UOF"], str(r["date_updated"]))
        for r in V.apply_link_updates(cur, classified, new_links, AS_OF).collect()
    }
    assert out == {
        "UP_SAME": ("UOF_A", str(_day(30))),    # untouched
        "UP_ALIVE": ("UOF_D", str(_day(30))),   # unknown -> untouched
        "UP_MOVED": ("UOF_Z", AS_OF),           # updated
        "UP_DEAD": (None, AS_OF),               # retired
        "UP_FRESH": ("UOF_N", AS_OF),           # appended
    }


@pytest.mark.slow
def test_outcome_log_retry_loop(spark):
    """The close-the-loop semantics: an eligible-but-unmatched UP is
    recorded 'retry' and comes back the next round; once a round
    matches it, the outcome flips to 'linked' and the updated links
    table removes it from the eligibility queue."""
    log = _log(
        spark,
        [
            ("UP_A", "habilitada", _day(120)),
            ("UP_B", "habilitada", _day(130)),
            ("UP_C", "habilitada", _day(140)),
        ],
    )
    listado = spark.createDataFrame(
        [("UP_A", 0), ("UP_B", 0), ("UP_C", 1)], "UP string, obsoleta int"
    )
    links0 = _links(spark, []).limit(0)

    # round 1: the linking algorithm only matches UP_A
    matches1 = spark.createDataFrame([("UP_A", "UOF_A")], "UP string, UOF string")
    r1 = V.monitor_links(log, links0, matches1, listado, AS_OF)
    out1 = {r["UP"]: r["outcome"] for r in r1["outcomes"].collect()}
    assert out1 == {"UP_A": "linked", "UP_B": "retry", "UP_C": "obsolete"}
    links1 = r1["updated_links"]
    assert {r["UP"] for r in links1.collect()} == {"UP_A"}

    # round 2 consumes round 1's links: UP_A no longer eligible,
    # UP_B retries and now matches
    next_day = "2026-08-14"
    matches2 = spark.createDataFrame(
        [("UP_A", "UOF_A"), ("UP_B", "UOF_B")], "UP string, UOF string"
    )
    r2 = V.monitor_links(log, links1, matches2, listado, next_day)
    elig2 = {r["UP"] for r in r2["eligible"].collect()}
    assert "UP_A" not in elig2 and "UP_B" in elig2
    out2 = {r["UP"]: r["outcome"] for r in r2["outcomes"].collect()}
    assert out2 == {"UP_B": "linked", "UP_C": "obsolete"}
    # UP_B's first-time link lands in the table
    links2 = {r["UP"]: r["UOF"] for r in r2["updated_links"].collect()}
    assert links2 == {"UP_A": "UOF_A", "UP_B": "UOF_B"}


@pytest.mark.slow
def test_retired_link_round_after_retirement(spark):
    """Regression: a retired link is stored as a UOF = NULL row; the
    next monitoring round must NOT re-classify it as a first-time
    link or re-emit a daily 'obsoleta' change, and the links table
    must keep exactly one row per retired UP."""
    log = _log(
        spark,
        [
            ("UP_DEAD", "habilitada", _day(200)),
            ("UP_LIVE", "habilitada", _day(200)),
        ],
    )
    listado = spark.createDataFrame(
        [("UP_DEAD", 1), ("UP_LIVE", 0)], "UP string, obsoleta int"
    )
    links0 = _links(
        spark,
        [("UP_DEAD", "UOF_D", _day(30)), ("UP_LIVE", "UOF_L", _day(30))],
    )

    # round 1: the matcher loses UP_DEAD (listado says obsoleta) -> retire
    matches1 = spark.createDataFrame([("UP_LIVE", "UOF_L")], "UP string, UOF string")
    r1 = V.monitor_links(log, links0, matches1, listado, AS_OF)
    assert {r["UP"]: r["field_changed"] for r in r1["change_log"].collect()} == {
        "UP_DEAD": "obsoleta"
    }
    links1 = r1["updated_links"]
    rows1 = {r["UP"]: r["UOF"] for r in links1.collect()}
    assert rows1 == {"UP_DEAD": None, "UP_LIVE": "UOF_L"}
    assert links1.count() == 2  # no duplicate rows

    # round 2 consumes round 1's output: the retired UP is steady state
    r2 = V.monitor_links(log, links1, matches1, listado, "2026-08-14")
    assert r2["change_log"].count() == 0            # no daily re-obsoletion
    assert r2["changes"].count() == 0               # no phantom unlinked row
    links2 = r2["updated_links"]
    rows2 = {r["UP"]: r["UOF"] for r in links2.collect()}
    assert rows2 == {"UP_DEAD": None, "UP_LIVE": "UOF_L"}
    assert links2.count() == 2                      # still one row per UP

    # the retired UP does not sneak back into the eligibility queue
    # while obsolete, but a NULL-UOF row alone doesn't block a
    # re-habilitated UP from re-entering
    log_back = _log(
        spark,
        [
            ("UP_DEAD", "habilitada", _day(200)),
            ("UP_DEAD", "obsoleta", _day(150)),
            ("UP_DEAD", "habilitada", _day(100)),  # re-enabled
            ("UP_LIVE", "habilitada", _day(200)),
        ],
    )
    elig = {r["UP"] for r in V.eligible_ups(log_back, links1, AS_OF).collect()}
    assert elig == {"UP_DEAD"}

    # a retired UP the matcher re-finds becomes a NULL -> new uof_change
    matches3 = spark.createDataFrame(
        [("UP_LIVE", "UOF_L"), ("UP_DEAD", "UOF_D2")], "UP string, UOF string"
    )
    changes3, new3 = V.find_link_changes(links1, matches3)
    assert new3.count() == 0
    assert [tuple(r) for r in changes3.collect()] == [("UP_DEAD", None, "UOF_D2")]


def test_eligibility_plan_broadcasts_links(spark):
    """The links anti-join must broadcast (dim-sized side); the change
    log aggregates in one shuffle."""
    log = _log(spark, [("UP_A", "habilitada", _day(120))])
    links = _links(spark, [("UP_X", "UOF_X", _day(10))])
    plan = (
        V.eligible_ups(log, links, AS_OF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
