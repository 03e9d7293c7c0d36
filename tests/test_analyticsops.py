"""Invariant tests for the round-4 continuation analytics operators:
EWMA anomaly scoring, snapshot diff, chat assembly, triangle count.

Each is recomputed in plain Python over the sf0.001 parquet and
compared exactly (oracle value parity runs in
tools/check_correctness.py; these pin the SEMANTICS independently of
both engines)."""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal
from itertools import combinations

from etl_energy_tracker_spark.queries.cdcops import dataset_snapshot_diff
from etl_energy_tracker_spark.queries.graphops import triangle_count
from etl_energy_tracker_spark.queries.llmprep import chat_turns_assemble
from etl_energy_tracker_spark.queries.timeops import (
    _EWMA_BETA,
    _EWMA_DEPTH,
    _EWMA_MIN_PRIOR,
    _EWMA_THRESH,
    ewma_anomaly,
)

from conftest import SF_DIR


def test_ewma_anomaly_matches_python(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    series = defaultdict(list)
    for e in sorted(events, key=lambda e: (e.ts, e.event_id)):
        series[e.user_id].append(e)
    expect = {}
    for uid, evs in series.items():
        for t, e in enumerate(evs):
            prior = evs[max(0, t - _EWMA_DEPTH) : t][::-1]  # most recent first
            if len(prior) < _EWMA_MIN_PRIOR:
                continue
            num = sum(
                p.value * _EWMA_BETA**k for k, p in enumerate(prior)
            )
            den = sum(_EWMA_BETA**k for k in range(len(prior)))
            ewma = num / den
            if abs(e.value - ewma) > _EWMA_THRESH:
                expect[e.event_id] = (uid, round(ewma, 6))
    rows = ewma_anomaly(spark, SF_DIR).collect()
    got = {r.event_id: (r.user_id, r.ewma_prev) for r in rows}
    assert set(got) == set(expect)
    for eid, (uid, ewma) in expect.items():
        assert got[eid][0] == uid
        assert abs(got[eid][1] - ewma) < 1e-6


def test_snapshot_diff_classes_are_exact(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    expect = {}
    for d in docs:
        if d.doc_id % 13 == 1:
            expect[d.doc_id] = "removed"
        elif d.doc_id % 10 == 0 and d.text != d.text.upper():
            expect[d.doc_id] = "changed"
        if d.doc_id % 17 == 2:
            expect[d.doc_id + 1_000_000_000] = "added"
    rows = dataset_snapshot_diff(spark, SF_DIR).collect()
    got = {r.doc_id: r.change_type for r in rows}
    assert got == expect


def test_chat_assembly_alternation_and_text(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    role_of = {
        "signup": "system",
        "purchase": "assistant",
        "error": "assistant",
    }
    series = defaultdict(list)
    for e in sorted(events, key=lambda e: e.event_id):
        series[e.user_id].append(e)
    rows = {r.user_id: r for r in chat_turns_assemble(spark, SF_DIR).collect()}
    assert set(rows) == set(series)
    for uid, evs in series.items():
        blocks = []
        for e in evs:
            role = role_of.get(e.event_type, "user")
            # Spark round() = BigDecimal.valueOf(double) + HALF_UP on
            # the shortest decimal repr; Decimal(repr(x)) is the same
            # construction. Then repr of the double matches both
            # engines' double->string (no exponent in this range).
            v = float(
                Decimal(repr(e.value)).quantize(
                    Decimal("0.01"), rounding=ROUND_HALF_UP
                )
            )
            content = f"{e.event_type}:{v!r}"
            if blocks and blocks[-1][0] == role:
                blocks[-1][1].append(content)
            else:
                blocks.append([role, [content]])
        text = "".join(f"<|{r}|>{' '.join(c)}" for r, c in blocks)
        initials = "".join(r[0] for r, _ in blocks)
        valid = 1 if _is_valid_chat(initials) else 0
        assert rows[uid].n_turns == len(blocks), uid
        assert rows[uid].chat_text == text, uid
        assert rows[uid].valid_format == valid, uid


def _is_valid_chat(initials: str) -> bool:
    body = initials[1:] if initials.startswith("s") else initials
    if len(body) < 2 or len(body) % 2 != 0:
        return False
    return all(
        c == ("u" if i % 2 == 0 else "a") for i, c in enumerate(body)
    )


def test_triangle_count_matches_bruteforce(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        for a, b in combinations(sorted(parts), 2):
            edges.add((a, b))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = sum(
        1
        for a, b in edges
        for c in adj[a] & adj[b]
        if c > b  # a < b < c: count each triangle once
    )
    row = triangle_count(spark, SF_DIR).collect()[0]
    assert row.n_edges == len(edges)
    assert row.n_triangles == tri
    assert row.n_wedges >= tri
