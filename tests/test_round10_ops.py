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


@pytest.mark.slow
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


# ------------------------------------------ GRPO advantage


def test_grpo_advantage_python_replay(spark):
    from etl_energy_tracker_spark.queries.mlops import grpo_advantage

    rows = _duck_rows(
        "SELECT event_id, event_type,"
        " CAST(FLOOR(value * 100) AS BIGINT) FROM events"
    )
    by_type: dict[str, list[tuple[int, int]]] = {}
    for eid, et, c in rows:
        by_type.setdefault(et, []).append((int(eid), int(c)))
    want = {}
    for et, evs in by_type.items():
        n = len(evs)
        s = sum(c for _, c in evs)
        q = sum(c * c for _, c in evs)
        sd = math.sqrt(max(float(n) * float(q) - float(s) * float(s), 0.0))
        for eid, c in evs:
            adv = (
                None
                if sd == 0.0
                else math.floor(
                    1000.0 * (float(n) * float(c) - float(s)) / sd
                )
            )
            want[eid] = (et, c, adv, n)
    got = {
        r.event_id: (
            r.event_type, r.reward_cents, r.advantage_milli, r.group_n
        )
        for r in grpo_advantage(spark, SF_DIR).collect()
    }
    assert got == want
    # advantages sum to ~0 within each group (floor drift < n millis)
    for et, evs in by_type.items():
        tot = sum(
            got[eid][2] for eid, _ in evs if got[eid][2] is not None
        )
        assert abs(tot) <= 1000 * len(evs)


# ------------------------------------------ edge triangle support


def test_edge_triangle_support_reconciles_triangle_count(spark):
    """sum(support) = 3 * n_triangles and both ops agree on the
    global triangle count and edge count (the docstring invariant)."""
    from etl_energy_tracker_spark.queries.graphops import (
        edge_triangle_support,
        triangle_count,
    )

    ets = edge_triangle_support(spark, SF_DIR).collect()[0]
    tc = triangle_count(spark, SF_DIR).collect()[0]
    assert ets.n_edges == tc.n_edges
    assert ets.n_triangles == tc.n_triangles
    # truss edge counts are a partition-free cumulative: monotone
    assert ets.truss3_edges >= ets.truss4_edges >= ets.truss5_edges
    assert ets.truss3_edges <= ets.n_edges
    assert ets.max_support >= 3 or ets.truss5_edges == 0


# ------------------------------------------ chunk overlap stitch


def test_chunk_overlap_stitch_full_coverage(spark):
    """Every doc re-chunked at W=30/S=20 stitches back: exactly
    n_chunks - 1 internal next-chunk edges per doc."""
    from etl_energy_tracker_spark.queries.llmprep import (
        chunk_overlap_stitch,
    )

    rows = chunk_overlap_stitch(spark, SF_DIR).collect()
    assert rows
    assert all(r.stitched_ok for r in rows)
    assert all(r.internal_edges == r.n_chunks - 1 for r in rows)
    # chunk counts match the independent token-count derivation
    toks = _duck_rows(
        "SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+'))"
        " FROM documents"
    )
    want = {
        d: ((n - 30) // 20 + 1 if n >= 30 else 1) for d, n in toks
    }
    got = {r.doc_id: r.n_chunks for r in rows}
    assert got == want


# ------------------------------------------ nucleus top-p cutoff


def test_nucleus_topp_cutoff_python_replay(spark):
    from etl_energy_tracker_spark.queries.textops import (
        nucleus_topp_cutoff,
    )

    rows = _duck_rows(
        "SELECT source, unnest(regexp_split_to_array(trim(text),"
        " '\\s+')) FROM documents"
    )
    from collections import Counter

    per_src: dict[str, Counter] = {}
    for src, tok in rows:
        per_src.setdefault(src, Counter())[tok] += 1
    want = {}
    for src, cnt in per_src.items():
        tot = sum(cnt.values())
        vocab = len(cnt)
        cum = 0
        for rk, (tok, c) in enumerate(
            sorted(cnt.items(), key=lambda t: (-t[1], t[0])), start=1
        ):
            cum += c
            if 10 * cum >= 9 * tot:
                want[src] = (tot, vocab, rk, cum, 1000000 * rk // vocab)
                break
    got = {
        r.source: (
            r.n_tokens, r.vocab_size, r.nucleus_size, r.nucleus_mass,
            r.nucleus_vocab_ppm,
        )
        for r in nucleus_topp_cutoff(spark, SF_DIR).collect()
    }
    assert got == want


# ------------------------------------------ greedy acceptance


def test_greedy_unigram_acceptance_python_replay(spark):
    from etl_energy_tracker_spark.queries.textops import (
        greedy_unigram_acceptance,
    )

    docs = _duck_rows("SELECT doc_id, source, trim(text) FROM documents")
    from collections import Counter, defaultdict

    bigrams: Counter = Counter()
    steps = []
    for _, src, text in docs:
        toks = text.split()
        for aa, bb in zip(toks, toks[1:]):
            bigrams[(aa, bb)] += 1
            steps.append((src, aa, bb))
    best: dict[str, str] = {}
    for (aa, bb), c in sorted(
        bigrams.items(), key=lambda t: (t[0][0], -t[1], t[0][1])
    ):
        best.setdefault(aa, bb)
    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for src, aa, bb in steps:
        agg[src][0] += 1
        agg[src][1] += int(best[aa] == bb)
    want = {
        src: (n, acc, 1000000 * acc // n)
        for src, (n, acc) in agg.items()
    }
    got = {
        r.source: (r.n_steps, r.n_accepted, r.acceptance_ppm)
        for r in greedy_unigram_acceptance(spark, SF_DIR).collect()
    }
    assert got == want
    # acceptance is a real signal, not ~0 and not saturated
    rates = [v[2] for v in got.values()]
    assert 0 < max(rates) < 1000000


# ------------------------------------------ Krippendorff alpha


def test_krippendorff_alpha_python_replay(spark):
    from etl_energy_tracker_spark.queries.statops import (
        krippendorff_alpha,
    )
    from etl_energy_tracker_spark.queries.evalops import (
        _AUC_HI,
        _AUC_LO,
    )
    from etl_energy_tracker_spark.queries.prepops import _HLC_W_DUCK

    rows = _duck_rows(
        "WITH toks AS (SELECT doc_id,"
        " unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok"
        " FROM documents)"
        " SELECT doc_id,"
        " 1000000 * SUM(CASE WHEN tok IN ('a', 'the') THEN 1 ELSE 0"
        " END) // COUNT(*),"
        f" CAST(SUM({_HLC_W_DUCK}) AS BIGINT)"
        " FROM toks GROUP BY doc_id"
    )
    n_units = len(rows)
    n1 = du = 0
    for _, ratio, hlc in rows:
        r1 = _AUC_LO <= ratio <= _AUC_HI
        r2 = _AUC_LO + 20_000 <= ratio <= _AUC_HI + 20_000
        r3 = hlc > 0
        u1 = int(r1) + int(r2) + int(r3)
        n1 += u1
        du += u1 * (3 - u1)
    n0 = 3 * n_units - n1
    do = du / (n_units * 6.0)
    de = (n1 * n0) / ((n1 + n0) * (n1 + n0 - 1.0))
    want = math.floor(1000.0 * (1.0 - do / de))
    row = krippendorff_alpha(spark, SF_DIR).collect()[0]
    assert row.n_units == n_units
    assert row.n_pos_ratings == n1 and row.n_neg_ratings == n0
    assert row.alpha_milli == want
    # three raters with two correlated bands: alpha must be positive
    # but far from perfect on this corpus
    assert 0 < row.alpha_milli < 1000


# ------------------------------------------ Hilbert curve key


def _py_xy2d(x: int, y: int, bits: int = 8) -> int:
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_unrolled_matches_reference_walk(spark):
    """The unrolled SQL xy2d is the textbook algorithm: bijective on
    the full 256x256 grid and equal to the python reference at every
    point; consecutive d values are spatially adjacent (the locality
    property Z-order lacks)."""
    from etl_energy_tracker_spark.queries.hygieneops import (
        _hilbert_steps,
    )

    grid = spark.sql(
        "SELECT CAST(0 AS BIGINT) AS d, CAST(x.id AS BIGINT) AS x,"
        " CAST(y.id AS BIGINT) AS y, CAST(x.id AS BIGINT) AS x0,"
        " CAST(y.id AS BIGINT) AS y0"
        " FROM range(256) x CROSS JOIN range(256) y"
    )
    for d, x, y in _hilbert_steps():
        grid = grid.selectExpr(
            f"CAST({d} AS BIGINT) AS d",
            f"CAST({x} AS BIGINT) AS x",
            f"CAST({y} AS BIGINT) AS y",
            "x0",
            "y0",
        )
    rows = grid.select("x0", "y0", "d").collect()
    assert len(rows) == 65536
    seen = {}
    for r in rows:
        assert r.d == _py_xy2d(r.x0, r.y0), (r.x0, r.y0)
        seen[r.d] = (r.x0, r.y0)
    assert len(seen) == 65536 and min(seen) == 0 and max(seen) == 65535
    # locality: curve-consecutive cells are grid-adjacent
    for d in range(0, 65535, 997):
        (x1, y1), (x2, y2) = seen[d], seen[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


# ------------------------------------------ PSI drift


def _py_ln_micro(num: int, den: int) -> int:
    """Python replay of portable_math.ln_micro_rational — same IEEE
    double sequence, so exactly equal, not approximately."""
    k = num.bit_length() - den.bit_length()
    if k < 0:
        num_s, den_s = num * (1 << -k), den
    else:
        num_s, den_s = num, den * (1 << k)
    m = float(num_s) / float(den_s)
    z = (m - 1.0) / (m + 1.0)
    z2 = z * z
    horner = 1.0 + z2 * (
        (1.0 / 3.0) + z2 * ((1.0 / 5.0) + z2 * ((1.0 / 7.0) + z2 * (
            (1.0 / 9.0) + z2 * ((1.0 / 11.0) + z2 * (
                (1.0 / 13.0) + z2 * (1.0 / 15.0)))))))
    ln = float(k) * 0.6931471805599453 + 2.0 * z * horner
    return math.floor(ln * 1000000.0 + 0.5)


def test_psi_drift_python_replay(spark):
    from etl_energy_tracker_spark.queries.statops import (
        psi_drift_report,
    )

    rows = _duck_rows(
        "SELECT event_type, epoch_us(ts),"
        " CAST(FLOOR(value * 100) AS BIGINT) FROM events"
    )
    by_type: dict[str, list[tuple[int, int]]] = {}
    for et, us, c in rows:
        by_type.setdefault(et, []).append((int(us), int(c)))
    want = {}
    for et, evs in by_type.items():
        uss = [u for u, _ in evs]
        cs = [c for _, c in evs]
        split = min(uss) + (max(uss) - min(uss)) // 2
        cmin, cmax = min(cs), max(cs)
        cells: dict[int, list[int]] = {}
        for u, c in evs:
            b = min((c - cmin) * 10 // max(cmax - cmin + 1, 1), 9)
            cell = cells.setdefault(b, [1, 1])  # Laplace +1
            cell[0 if u < split else 1] += 1
        pt = sum(p for p, _ in cells.values())
        qt = sum(q for _, q in cells.values())
        psi = 0
        for p, q in cells.values():
            share = 1000000 * p // pt - 1000000 * q // qt
            psi += share * _py_ln_micro(p * qt, q * pt)
        want[et] = (len(cells), psi, psi >= 100000000000)
    got = {
        r.event_type: (r.n_bins, r.psi_pico, r.drift_alarm)
        for r in psi_drift_report(spark, SF_DIR).collect()
    }
    assert got == want


# ------------------------------------------ preference cycles


def test_preference_cycle_python_replay(spark):
    from etl_energy_tracker_spark.queries.evalops import (
        preference_cycle_audit,
    )
    from etl_energy_tracker_spark.queries.prepops import _HLC_W_DUCK

    rows = _duck_rows(
        "WITH toks AS (SELECT doc_id, lang, source,"
        " unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok"
        " FROM documents)"
        f" SELECT doc_id, lang, source, CAST(SUM({_HLC_W_DUCK}) AS"
        " BIGINT) FROM toks GROUP BY doc_id, lang, source"
    )
    from collections import defaultdict

    ranked: dict[tuple[str, str], list[tuple[int, int]]] = defaultdict(
        list
    )
    for did, lang, src, score in rows:
        ranked[(lang, src)].append((int(did), int(score)))
    for v in ranked.values():
        v.sort()
    duel: dict[tuple[str, str], list[int]] = defaultdict(
        lambda: [0, 0]
    )
    langs = {lang for lang, _ in ranked}
    srcs = sorted({src for _, src in ranked})
    for lang in langs:
        for i, s1 in enumerate(srcs):
            for s2 in srcs[i + 1:]:
                a = ranked.get((lang, s1), [])
                b = ranked.get((lang, s2), [])
                for (_, sa), (_, sb) in zip(a, b):
                    d = duel[(s1, s2)]
                    d[0] += 2
                    d[1] += 2 if sa > sb else (1 if sa == sb else 0)
    edges = set()
    for (s1, s2), (tot2, win2) in duel.items():
        if 2 * win2 >= tot2:
            edges.add((s1, s2))
        else:
            edges.add((s2, s1))
    n_cyc = 0
    for a, b, c in (
        (a, b, c)
        for a in srcs
        for b in srcs
        for c in srcs
        if a < b and a < c and b != c
    ):
        if (a, b) in edges and (b, c) in edges and (c, a) in edges:
            n_cyc += 1
    row = preference_cycle_audit(spark, SF_DIR).collect()[0]
    n = len(srcs)
    assert row.n_sources == n
    assert row.n_pairs == n * (n - 1) // 2
    assert row.n_triples == n * (n - 1) * (n - 2) // 6
    assert row.n_cyclic == n_cyc
    assert (
        row.transitivity_ppm
        == 1000000 * (row.n_triples - n_cyc) // row.n_triples
    )


# ------------------------------------------ weighted Jaccard


def test_weighted_jaccard_python_replay(spark):
    from etl_energy_tracker_spark.queries.textops import (
        _WJ_DF_CAP,
        weighted_jaccard_pairs,
    )

    rows = _duck_rows(
        "SELECT doc_id, source, trim(text) FROM documents"
    )
    from collections import Counter, defaultdict

    tf: dict[int, Counter] = {}
    for did, _, text in rows:
        toks = text.split()
        tf[int(did)] = Counter(
            f"{a} {b} {c}"
            for a, b, c in zip(toks, toks[1:], toks[2:])
        )
    df: Counter = Counter()
    for cnt in tf.values():
        for tok in cnt:
            df[tok] += 1
    keep = {t for t, d in df.items() if d <= _WJ_DF_CAP}
    totals = {d: sum(c.values()) for d, c in tf.items()}
    by_tok: dict[str, list[int]] = defaultdict(list)
    for d, cnt in tf.items():
        for t in cnt:
            if t in keep:
                by_tok[t].append(d)
    inter: dict[tuple[int, int], int] = defaultdict(int)
    for t, docs_with in by_tok.items():
        docs_with.sort()
        for i, a in enumerate(docs_with):
            for b in docs_with[i + 1:]:
                inter[(a, b)] += min(tf[a][t], tf[b][t])
    want = {}
    for (a, b), im in inter.items():
        wj = im / (totals[a] + totals[b] - im)
        if wj >= 0.5:
            want[(a, b)] = round(wj, 6)
    got = {
        (r.doc_a, r.doc_b): r.wjaccard
        for r in weighted_jaccard_pairs(spark, SF_DIR).collect()
    }
    assert got == want
    assert got, "corpus has designed near-dups; pairs must exist"
    # weighted <= plain set-Jaccard never holds in general, but both
    # are in (0, 1]
    assert all(0 < v <= 1 for v in got.values())
