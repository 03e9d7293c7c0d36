"""Hypothesis property tests for the round-6 statistics kernels.

Generated corpora hit the edge cases the fixed testdata may not:
all-tied values (every rank a mid-rank), single-row groups, values
landing exactly on cumulative-weight boundaries, absorbing Markov
states. Each operator is compared against a direct Python
recomputation on a temporary parquet lake."""

from __future__ import annotations

import pytest

import math
import tempfile
from collections import Counter, defaultdict
from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

from etl_energy_tracker_spark.queries.insightops import (
    markov_steady_state,
    weighted_percentile_exact,
)
from etl_energy_tracker_spark.queries.statops import (
    ks_drift_stat,
    spearman_rank_corr,
)

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _events_lake(spark, d, rows):
    spark.createDataFrame(rows, _EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/events.parquet")


def _mid_ranks_x2(vals):
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    r2 = [0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and vals[order[j]] == vals[order[i]]:
            j += 1
        for k in range(i, j):
            r2[order[k]] = (i + 1) + j
        i = j
    return r2


# two event types; values drawn from a tiny domain so ties are the
# norm, not the exception; hours from a 3-value domain
@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.sampled_from([1.0, 2.0, 2.5]),
            st.integers(0, 2),
        ),
        min_size=2,
        max_size=40,
    )
)
@pytest.mark.slow
def test_spearman_generated(spark, triples):
    rows = [
        (i, datetime(2024, 1, 1, h), i % 3, t, v, "{}")
        for i, (t, v, h) in enumerate(triples)
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_lake(spark, d, rows)
        got = {
            r.event_type: r for r in spearman_rank_corr(spark, d).collect()
        }
    by_type = defaultdict(list)
    for t, v, h in triples:
        by_type[t].append((v, h))
    assert set(got) == set(by_type)
    for t, pairs in by_type.items():
        xs = _mid_ranks_x2([p[0] for p in pairs])
        ys = _mid_ranks_x2([p[1] for p in pairs])
        n = len(pairs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(v * v for v in xs)
        syy = sum(v * v for v in ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        dx = float(n) * float(sxx) - float(sx) * float(sx)
        dy = float(n) * float(syy) - float(sy) * float(sy)
        den = math.sqrt(dx * dy)
        r = got[t]
        assert r.n_events == n
        if den == 0.0:
            assert r.spearman_ppm is None
        else:
            num = float(n) * float(sxy) - float(sx) * float(sy)
            assert r.spearman_ppm == math.floor(1000000.0 * num / den)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.sampled_from([1.0, 2.0, 3.0, 4.0]),
        ),
        min_size=2,
        max_size=40,
    ).filter(lambda xs: len({t for t, _ in xs}) >= 2)
)
@pytest.mark.slow
def test_ks_generated(spark, pairs):
    rows = [
        (i, datetime(2024, 1, 1) + timedelta(minutes=i), i % 3, t, v, "{}")
        for i, (t, v) in enumerate(pairs)
    ]
    with tempfile.TemporaryDirectory() as d:
        _events_lake(spark, d, rows)
        got = {r.event_type: r for r in ks_drift_stat(spark, d).collect()}
    n = len(pairs)
    by_type = defaultdict(Counter)
    for t, v in pairs:
        by_type[t][v] += 1
    total = Counter(v for _, v in pairs)
    vals = sorted(total)
    for t, cnts in by_type.items():
        n_t = sum(cnts.values())
        cum_t = cum_all = 0
        best, best_v = -1, None
        for v in vals:
            cum_t += cnts.get(v, 0)
            cum_all += total[v]
            d_ppm = abs(
                1000000 * cum_t // n_t
                - 1000000 * (cum_all - cum_t) // (n - n_t)
            )
            if d_ppm > best:
                best, best_v = d_ppm, v
        r = got[t]
        assert (r.n_type, r.n_rest) == (n_t, n - n_t)
        assert (r.ks_ppm, r.ks_at_value) == (best, best_v)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "R"]),
            st.integers(1, 40),   # cents
            st.integers(1, 5),    # weight (quantity)
        ),
        min_size=1,
        max_size=40,
    )
)
@pytest.mark.slow
def test_weighted_percentile_generated(spark, rows_in):
    rows = [
        (f, c / 100.0, float(w)) for f, c, w in rows_in
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "l_returnflag string, l_extendedprice double, l_quantity double",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{d}/lineitem.parquet"
        )
        got = {
            (r.flag, r.pct): r
            for r in weighted_percentile_exact(spark, d).collect()
        }
    hist = defaultdict(Counter)
    for f, c, w in rows_in:
        hist[f][c] += w
    for flag, tf in hist.items():
        total = sum(tf.values())
        for q in (50, 90, 99):
            cum = 0
            pick = None
            for cents in sorted(tf):
                cum += tf[cents]
                if pick is None and cum * 100 >= q * total:
                    pick = cents
            r = got[(flag, q)]
            assert r.total_weight == total
            assert r.value_cents == pick


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["x", "y", "z"]), min_size=2, max_size=8),
        min_size=1,
        max_size=8,
    )
)
@pytest.mark.slow
def test_markov_generated(spark, sequences):
    rows = []
    eid = 0
    for u, seq in enumerate(sequences):
        for i, t in enumerate(seq):
            rows.append(
                (
                    eid,
                    datetime(2024, 1, 1) + timedelta(minutes=i),
                    u,
                    t,
                    1.0,
                    "{}",
                )
            )
            eid += 1
    with tempfile.TemporaryDirectory() as d:
        _events_lake(spark, d, rows)
        got = {
            r.state: r for r in markov_steady_state(spark, d).collect()
        }
    trans = Counter()
    for seq in sequences:
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    row_tot = Counter()
    for (a, _), c in trans.items():
        row_tot[a] += c
    p = {k: 1000000 * c // row_tot[k[0]] for k, c in trans.items()}
    states = sorted(row_tot)
    if not states:
        assert got == {}
        return
    v = {s: 1000000 // len(states) for s in states}

    def step(v):
        out = defaultdict(int)
        for (a, b), ppm in p.items():
            if a in v:
                out[b] += v[a] * ppm
        return {s: x // 1000000 for s, x in out.items()}

    v1, v2 = step(v), None
    v2 = step(v1)
    # the op emits only states present at every iterate (inner joins,
    # same on both engines)
    emitted = set(states) & set(v1) & set(v2)
    assert set(got) == emitted
    for s in emitted:
        r = got[s]
        assert (r.v0_ppm, r.v1_ppm, r.v2_ppm) == (v[s], v1[s], v2[s])
