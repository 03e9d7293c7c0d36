"""Invariant tests for behaviorops.py and searchops.py."""

from __future__ import annotations

import pytest

from collections import Counter, defaultdict

from etl_energy_tracker_spark.queries.behaviorops import (
    funnel_conversion,
    retention_cohorts,
)
from etl_energy_tracker_spark.queries.searchops import (
    _TOP_DF,
    inverted_index_postings,
)

from conftest import SF_DIR


@pytest.mark.slow
def test_funnel_stage_ordering(spark):
    rows = funnel_conversion(spark, SF_DIR).collect()
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_user = defaultdict(list)
    for e in events:
        by_user[e.user_id].append((e.ts, e.event_type))
    viewers = {u for u, evs in by_user.items() if any(t == "view" for _, t in evs)}
    assert {r.user_id for r in rows} == viewers
    for r in rows:
        evs = sorted(by_user[r.user_id])
        first_view = min(ts for ts, t in evs if t == "view")
        assert r.ts_view == first_view
        if r.stage == "view":
            assert r.ts_click is None and r.ts_purchase is None
            assert not any(t == "click" and ts > first_view for ts, t in evs)
        else:
            assert r.ts_click is not None and r.ts_click > r.ts_view
            assert r.ts_click == min(
                ts for ts, t in evs if t == "click" and ts > first_view
            )
        if r.stage == "purchase":
            assert r.ts_purchase is not None and r.ts_purchase > r.ts_click
        elif r.stage == "click":
            assert r.ts_purchase is None


def test_retention_age0_equals_cohort_size(spark):
    rows = retention_cohorts(spark, SF_DIR).collect()
    age0 = {r.cohort_day: r.active_users for r in rows if r.age_days == 0}
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    first_day = {}
    for e in events:
        d = (e.ts.date() - __import__("datetime").date(2024, 1, 1)).days
        if e.user_id not in first_day or d < first_day[e.user_id]:
            first_day[e.user_id] = d
    cohort_size = Counter(first_day.values())
    # every user is active on their own first day, so age-0 == cohort size
    assert age0 == dict(cohort_size)
    for r in rows:
        assert 0 <= r.age_days <= 7
        assert r.active_users <= cohort_size[r.cohort_day]


def test_inverted_index_postings_shape(spark):
    rows = inverted_index_postings(spark, SF_DIR).collect()
    assert len(rows) == _TOP_DF
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    tf = defaultdict(Counter)
    for d in docs:
        for t in d.text.strip().split():
            tf[t][d.doc_id] += 1
    for r in rows:
        assert r.df == len(tf[r.tok])
        postings = [int(p) for p in r.postings.split(",")]
        assert len(postings) == r.df
        assert postings == sorted(postings)
        for p in postings:
            did, cnt = p // 1000000, p % 1000000
            assert tf[r.tok][did] == cnt


def test_fuzzy_name_match_blocking_and_threshold(spark):
    from etl_energy_tracker_spark.queries.relational import fuzzy_name_match_pairs

    rows = fuzzy_name_match_pairs(spark, SF_DIR).collect()

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    assert rows, "expected at least one fuzzy pair"
    for r in rows:
        assert r.name_a < r.name_b
        assert r.name_a.split()[-1] == r.name_b.split()[-1] == r.block
        assert r.lev == lev(r.name_a, r.name_b)
        assert r.lev <= 4


@pytest.mark.slow
def test_value_outlier_mad_matches_python(spark):
    """Flags must equal an independent Python median/MAD recompute and
    be invariant to the outliers themselves (robustness property)."""
    import statistics

    from etl_energy_tracker_spark.queries.behaviorops import (
        _MAD_K,
        _ROBUST_Z_CUT,
        value_outlier_mad,
    )

    rows = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "event_type", "value"
    ).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append((r["event_id"], r["value"]))
    expected = set()
    for et, vs in by_type.items():
        med = statistics.median(v for _, v in vs)
        mad = statistics.median(abs(v - med) for _, v in vs)
        for eid, v in vs:
            z = round(abs(v - med) / (_MAD_K * mad), 6)
            if z > _ROBUST_Z_CUT:
                expected.add(eid)
    got = {r["event_id"] for r in value_outlier_mad(spark, SF_DIR).collect()}
    assert got == expected
    assert got  # the screen fires on the fixture corpus


@pytest.mark.slow
def test_hybrid_rrf_fusion_consistent_with_component_rankings(spark):
    """Fused rows must carry ranks consistent with independently
    recomputed lexical and semantic rankings, and rrf_micro must be
    exactly the integer RRF of those ranks."""
    import math

    from etl_energy_tracker_spark.queries.searchops import (
        _RRF_K,
        _RRF_OUT,
        _RRF_TOPN,
        hybrid_rrf_fusion,
    )
    from etl_energy_tracker_spark.queries.textops import bm25_topk_docs

    # independent lexical ranking from the (separately oracle-checked)
    # BM25 table
    bm = bm25_topk_docs(spark, SF_DIR).collect()
    lex_tot = {}
    for r in bm:
        lex_tot[r["doc_id"]] = lex_tot.get(r["doc_id"], 0) + r["score_scaled"]
    lex_rank = {
        d: i + 1
        for i, (d, _) in enumerate(
            sorted(lex_tot.items(), key=lambda kv: (-kv[1], kv[0]))[:_RRF_TOPN]
        )
    }
    # independent semantic ranking
    emb = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    qv = emb[0]
    qn = math.sqrt(sum(x * x for x in qv))

    def cosine(v):
        return round(
            sum(float(a) * float(b) for a, b in zip(v, qv))
            / (math.sqrt(sum(float(x) * float(x) for x in v)) * qn),
            6,
        )

    sem_sorted = sorted(
        ((cosine(v), vid) for vid, v in emb.items() if vid != 0),
        key=lambda t: (-t[0], t[1]),
    )[:_RRF_TOPN]
    sem_rank = {vid: i + 1 for i, (_, vid) in enumerate(sem_sorted)}

    out = hybrid_rrf_fusion(spark, SF_DIR).collect()
    assert len(out) == _RRF_OUT
    scores = [r["rrf_micro"] for r in out]
    assert scores == sorted(scores, reverse=True)
    for r in out:
        assert r["r_lex"] == lex_rank.get(r["doc_id"])
        assert r["r_sem"] == sem_rank.get(r["doc_id"])
        expect = (1000000 // (_RRF_K + r["r_lex"]) if r["r_lex"] else 0) + (
            1000000 // (_RRF_K + r["r_sem"]) if r["r_sem"] else 0
        )
        assert r["rrf_micro"] == expect
    # fusion is genuinely hybrid on this corpus: the result draws from
    # both systems
    assert any(r["r_lex"] is not None for r in out)
    assert any(r["r_sem"] is not None for r in out)


def test_event_pattern_match_matches_python_regex(spark):
    import re as _re

    from etl_energy_tracker_spark.queries.behaviorops import (
        _CEP_PATTERN,
        event_pattern_match,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    seqs = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        seqs[r["user_id"]] = seqs.get(r["user_id"], "") + r["event_type"][0]
    expected = {
        u: (len(s), len(_re.findall(_CEP_PATTERN, s)))
        for u, s in seqs.items()
        if _re.search(_CEP_PATTERN, s)
    }
    got = {
        r["user_id"]: (r["seq_len"], r["n_matches"])
        for r in event_pattern_match(spark, SF_DIR).collect()
    }
    assert got == expected and got


@pytest.mark.slow
def test_value_outlier_mad_zero_mad_group_excluded_not_crash(spark):
    """A majority-constant group (MAD = 0) must be excluded, not raise
    ANSI divide-by-zero: exercised via the operator's own building
    blocks on a crafted frame."""
    from pyspark.sql import functions as F

    from etl_energy_tracker_spark.queries.behaviorops import _MAD_K

    ev = spark.createDataFrame(
        [(i, "const", 5.0) for i in range(10)]
        + [(100 + i, "varied", float(i)) for i in range(10)],
        "event_id long, event_type string, value double",
    )
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    )
    stats = med.join(mad.where(F.col("mad") > 0), "event_type")
    z = F.round(F.abs(F.col("value") - F.col("med")) / (_MAD_K * F.col("mad")), 6)
    out = (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("robust_z", z)
        .collect()  # must not raise
    )
    assert {r["event_type"] for r in out} == {"varied"}
