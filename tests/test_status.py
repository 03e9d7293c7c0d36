"""Pipeline status tracking + failure routing (status.py) — reference
dags/helpers/pipeline_status.py + email_triggers.py semantics."""

from __future__ import annotations

import pytest

from etl_energy_tracker_spark import status as st


def test_overall_requires_all_stages():
    ps = st.PipelineStatus()
    assert not ps.overall_success
    ps.set_extraction_status(True, {"rows": 10})
    ps.set_transform_status(True)
    assert not ps.overall_success  # loading still failed
    ps.set_load_status(True)
    assert ps.overall_success
    ps.set_transform_status(False, {"error": "boom"})
    assert not ps.overall_success
    with pytest.raises(KeyError, match="unknown stage"):
        ps.set_stage("compaction", True)


def test_failed_markets_message_names_markets():
    ok = {"success": True, "details": {}}
    assert st.failed_markets_message(ok) is None
    per_market = {
        "success": False,
        "details": {"markets_failed": {"intra": "bad sheet", "diario": "timeout"}},
    }
    msg = st.failed_markets_message(per_market)
    assert "diario: timeout" in msg and "intra: bad sheet" in msg
    generic = {"success": False, "details": {"error": "disk full"}}
    assert st.failed_markets_message(generic) == "load failed — disk full"


def test_routing_failure_always_success_optional():
    sent = []
    summary = st.collect_status(
        {"success": True, "details": {}},
        {"success": True, "details": {}},
        {"success": False, "details": {"markets_failed": {"mic": "parse"}}},
    ).get_summary()

    out = st.route_notification(summary, sent.append, "omie_volumenes", "2026-08-13")
    assert out is not None and sent[0]["severity"] == "failure"
    assert "Failure: omie_volumenes - 2026-08-13" == sent[0]["subject"]
    assert any("mic: parse" in ln for ln in sent[0]["lines"])

    ok_summary = st.collect_status(
        {"success": True, "details": {}},
        {"success": True, "details": {}},
        {"success": True, "details": {}},
    ).get_summary()
    sent.clear()
    assert st.route_notification(ok_summary, sent.append, "p", "2026-08-13") is None
    assert sent == []  # success stays quiet by default
    out = st.route_notification(
        ok_summary, sent.append, "p", "2026-08-13", notify_on_success=True
    )
    assert out["severity"] == "success" and sent


def test_jobs_status_shape_feeds_collect(spark, tmp_path):
    """The jobs.py surfaces return the stage-dict shape collect_status
    consumes — wire a real (failing) job result through routing."""
    from etl_energy_tracker_spark.jobs import run_esios_precios_etl
    from etl_energy_tracker_spark.lake import Lake

    lake = Lake(spark, str(tmp_path / "lake"))
    raw = spark.createDataFrame(
        [("2024-01-01T00:00:00Z", 10.0)], "datetime_utc string, value double"
    )
    # an invalid date mode fails inside the job; the status shape
    # carries the typed error instead of raising
    job = run_esios_precios_etl(spark, lake, raw, mode="no-such-mode")
    assert job["success"] is False
    summary = st.collect_status(
        job, {"success": False, "details": {}}, {"success": False, "details": {}}
    ).get_summary()
    sent = []
    st.route_notification(summary, sent.append, "esios_precios", "2024-01-01")
    assert sent and "ValueError" in " ".join(sent[0]["lines"])
