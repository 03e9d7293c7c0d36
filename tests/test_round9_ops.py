"""Round-9 operator tests: selection (facility location, MMR),
training (logistic GD, k-means refine, contrastive negatives,
Bradley-Terry), uncertainty (Poisson bootstrap, permutation+BH,
CUPED, delta method, DiD, post-stratification), eval (isotonic PAV,
best-of-n, matryoshka recall, fairness, learning curve, Brier
decomposition), survival (Nelson-Aalen), attribution (exact
Shapley), data valuation (LOO source influence), and the native
session-window stream. Each mirrors the operator in plain Python
over collected rows (the catalog contract tests cover the DuckDB
oracle; these pin the semantics against an independent
reimplementation), plus behavioral proofs on synthetic corpora
(separable-corpus GD learning, poisoned-source detection)."""

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


def _emb_rows():
    return _duck_rows("SELECT vec_id, embedding FROM embeddings")


def _cos_micro(a, b) -> int:
    num = sum(float(x) * float(y) for x, y in zip(a, b))
    na = math.sqrt(sum(float(x) ** 2 for x in a))
    nb = math.sqrt(sum(float(y) ** 2 for y in b))
    if na == 0.0 or nb == 0.0:
        return -1000000
    return int(round(round(num / (na * nb), 6) * 1000000))


# ------------------------------------------ facility location


@pytest.mark.slow
def test_facility_location_python_replay(spark):
    from etl_energy_tracker_spark.queries.vectorops import (
        _FL_CANDS,
        _FL_PICKS,
        facility_location_select,
    )

    rows = _emb_rows()
    cents = sorted(
        [(vid, ev) for vid, ev in rows if vid >= 100], key=lambda t: t[0]
    )[:_FL_CANDS]
    sims = {
        vid: [_cos_micro(ev, cv) for _, cv in cents] for vid, ev in rows
    }
    cur = {vid: 0 for vid, _ in rows}
    picked, chosen = [], set()
    for r in range(1, _FL_PICKS + 1):
        gains = [
            sum(max(s[i] - cur[vid], 0) for vid, s in sims.items())
            if i not in chosen
            else None
            for i in range(len(cents))
        ]
        best = min(
            (i for i in range(len(cents)) if i not in chosen),
            key=lambda i: (-gains[i], cents[i][0]),
        )
        picked.append((r, cents[best][0], gains[best]))
        chosen.add(best)
        for vid in cur:
            cur[vid] = max(cur[vid], sims[vid][best])
    got = [
        (r.pick_order, r.centroid_id, r.gain_micro, r.objective_micro)
        for r in facility_location_select(spark, SF_DIR).collect()
    ]
    want = [
        (po, cid, g, sum(p[2] for p in picked[:po]))
        for po, cid, g in picked
    ]
    assert sorted(got) == want
    # objective is non-decreasing and gains are non-increasing
    gains = [g for _, _, g in picked]
    assert gains == sorted(gains, reverse=True)  # submodularity


# --------------------------------------------------- MMR


def test_mmr_python_replay(spark):
    from etl_energy_tracker_spark.queries.vectorops import (
        _MMR_CANDS,
        _MMR_LAMBDA10,
        _MMR_PICKS,
        mmr_diverse_rank,
    )

    rows = _emb_rows()
    qv = min(rows, key=lambda t: t[0])[1]
    scored = sorted(
        [(vid, ev, _cos_micro(ev, qv)) for vid, ev in rows],
        key=lambda t: (-t[2], t[0]),
    )[:_MMR_CANDS]
    lam, com = _MMR_LAMBDA10, 10 - _MMR_LAMBDA10
    pool = {vid: (rel, ev) for vid, ev, rel in scored}
    sel = []
    while pool and len(sel) < _MMR_PICKS:
        best = None
        for vid, (rel, ev) in pool.items():
            ms = (
                max(_cos_micro(ev, sev) for *_, sev in sel)
                if sel
                else -1000000
            )
            key = (-(lam * rel - com * ms), vid)
            if best is None or key < best[0]:
                best = (key, vid, rel, ms)
        _, vid, rel, ms = best
        sel.append((len(sel) + 1, vid, rel, ms, pool.pop(vid)[1]))
    got = [
        (r.pick_order, r.vec_id, r.rel_micro, r.maxsim_micro, r.score_dmicro)
        for r in mmr_diverse_rank(spark, SF_DIR).collect()
    ]
    want = [
        (o, vid, rel, ms, lam * rel - com * ms) for o, vid, rel, ms, _ in sel
    ]
    assert sorted(got) == want
    # first pick is the pure-relevance argmax
    assert got and sorted(got)[0][2] == max(r for _, _, r in
                                            [(v, e, rl) for v, e, rl in scored])


# -------------------------------------------- Mann-Whitney U


def test_mann_whitney_python_replay(spark):
    from etl_energy_tracker_spark.queries.statops import mann_whitney_u_test

    rows = _duck_rows(
        "SELECT event_type, user_id % 2 AS arm, value FROM events"
    )
    by_type: dict[str, list[tuple[int, float]]] = {}
    for et, arm, x in rows:
        by_type.setdefault(et, []).append((int(arm), float(x)))
    want = {}
    for et, pairs in by_type.items():
        xs = sorted(x for _, x in pairs)
        # doubled mid-rank per value
        first = {}
        cnt = {}
        for i, x in enumerate(xs, 1):
            first.setdefault(x, i)
            cnt[x] = cnt.get(x, 0) + 1
        r2 = {x: 2 * first[x] + cnt[x] - 1 for x in first}
        na = sum(1 for a, _ in pairs if a == 0)
        nb = len(pairs) - na
        ra2 = sum(r2[x] for a, x in pairs if a == 0)
        u2 = ra2 - na * (na + 1)
        tie_t = sum(t**3 - t for t in cnt.values())
        n = len(pairs)
        sigma = math.sqrt(na * nb / 12.0 * (n + 1.0 - tie_t / (n * (n - 1.0))))
        z_ppm = math.floor(1000000.0 * (u2 - na * nb) / (2.0 * sigma))
        rb = 1000000 * u2 // (na * nb) - 1000000
        want[et] = (na, nb, u2, tie_t, rb, z_ppm)
    got = {
        r.event_type: (
            r.n_a, r.n_b, r.u2_a, r.tie_term, r.rank_biserial_ppm, r.z_ppm
        )
        for r in mann_whitney_u_test(spark, SF_DIR).collect()
    }
    assert got == want
    # |rank-biserial| <= 1 in ppm
    for _, _, _, _, rb, _ in got.values():
        assert -1000000 <= rb <= 1000000


# ---------------------------------------- logistic regression GD


@pytest.mark.slow
def test_logistic_gd_learns_separable_corpus(spark, tmp_path):
    """The driver-facing run on the signal-free synthetic corpus
    converges to the class prior (documented); this builds a corpus
    WITH lexical signal and asserts the same operator actually
    learns it — the training loop moves the weights, not just the
    bookkeeping."""
    from etl_energy_tracker_spark.queries.mlops import logistic_regression_gd

    rows = []
    for i in range(400):
        if i % 2 == 0:
            text = "the of and is was to in that it for " * 5  # stopword-dense
            lang = "en"
        else:
            text = "tabla valor consulta linea datos columna " * 8
            lang = "es"
        rows.append((i, text.strip(), lang, f"src{i % 4}", len(text)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    row = logistic_regression_gd(spark, str(tmp_path)).collect()[0]
    assert row.n_docs == 400
    assert row.pos_rate_ppm == 500000
    assert row.train_acc_ppm >= 900000  # actually learned, not the prior
    assert row.w3_micro > 0  # stopword ratio predicts English


def test_logistic_gd_weights_bounded_and_deterministic(spark):
    from etl_energy_tracker_spark.queries.mlops import (
        _LRGD_CLAMP,
        logistic_regression_gd,
    )

    a = logistic_regression_gd(spark, SF_DIR).collect()[0]
    b = logistic_regression_gd(spark, SF_DIR).collect()[0]
    assert a == b  # same trajectory on every run / partitioning
    for w in (a.w0_micro, a.w1_micro, a.w2_micro, a.w3_micro):
        assert -_LRGD_CLAMP <= w <= _LRGD_CLAMP


# ------------------------------------ contrastive hard negatives


@pytest.mark.slow
def test_hard_negatives_python_replay(spark):
    from etl_energy_tracker_spark.queries.vectorops import (
        _CHN_CELLS,
        contrastive_hard_negatives,
    )

    rows = _duck_rows("SELECT vec_id, embedding, label FROM embeddings")
    cents = sorted(
        [(vid, ev) for vid, ev, _ in rows if vid >= 100], key=lambda t: t[0]
    )[:_CHN_CELLS]

    def cell_of(ev):
        best = None
        for cid, cv in cents:
            s = _cos_micro(ev, cv) / 1e6
            if best is None or s > best[0]:
                best = (s, cid)
        return best[1]

    assigned = [(vid, ev, lb, cell_of(ev)) for vid, ev, lb in rows]
    want = {}
    for vid, ev, lb, cl in assigned:
        cands = [
            (b_vid, _cos_micro(ev, b_ev))
            for b_vid, b_ev, b_lb, b_cl in assigned
            if b_cl == cl and b_lb != lb
        ]
        if cands:
            neg, s = min(cands, key=lambda t: (-t[1], t[0]))
            want[vid] = (neg, s, cl)
    got = {
        r.anchor_id: (r.negative_id, r.sim_micro, r.cell)
        for r in contrastive_hard_negatives(spark, SF_DIR).collect()
    }
    assert got == want
    # every anchor's hard negative really is a different-label vector
    labels = {vid: lb for vid, _, lb in rows}
    for a, (n, _, _) in got.items():
        assert labels[a] != labels[n]


# ------------------------------------------- k-means Lloyd


@pytest.mark.slow
def test_kmeans_lloyd_python_replay(spark):
    from etl_energy_tracker_spark.queries.vectorops import (
        _KM_CELLS,
        _KM_ROUNDS,
        kmeans_lloyd_refine,
    )

    rows = _duck_rows("SELECT vec_id, embedding FROM embeddings")
    q = {vid: [int(round(float(x) * 1e6)) for x in ev] for vid, ev in rows}
    cents = {
        vid: list(q[vid])
        for vid in sorted(v for v, _ in rows if v >= 100)[:_KM_CELLS]
    }

    def cos6(a, b):
        num = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(y) ** 2 for y in b))
        return round(num / (na * nb), 6) if na and nb else None

    want = []
    for rnd in range(1, _KM_ROUNDS + 1):
        buckets: dict[int, list[int]] = {cid: [] for cid in cents}
        for vid, qv in q.items():
            best = None
            for cid in sorted(cents):
                s = cos6(qv, cents[cid])
                if s is not None and (best is None or s > best[0]):
                    best = (s, cid)
            buckets[best[1]].append(vid)
        for cid in sorted(cents):
            vids = buckets[cid]
            if not vids:
                want.append((rnd, cid, 0, 0))
                continue
            n = len(vids)
            old = cents[cid]
            new = [
                (sum(q[v][i] for v in vids) + n * 1000000) // n - 1000000
                for i in range(len(old))
            ]
            want.append(
                (rnd, cid, n, sum(abs(a - b) for a, b in zip(new, old)))
            )
            cents[cid] = new
    got = sorted(
        (r.round, r.cell, r.n_assigned, r.shift_l1)
        for r in kmeans_lloyd_refine(spark, SF_DIR).collect()
    )
    assert got == sorted(want)
    # round-2 shifts are smaller in aggregate than round-1 (converging)
    s1 = sum(s for rnd, _, _, s in want if rnd == 1)
    s2 = sum(s for rnd, _, _, s in want if rnd == 2)
    assert s2 < s1


# ------------------------------------------ Poisson bootstrap


def test_poisson_bootstrap_python_replay(spark):
    from etl_energy_tracker_spark.queries.statops import (
        _PB_MOD,
        _PB_REPS,
        poisson_bootstrap_ci,
    )

    rows = _duck_rows(
        "SELECT event_id, event_type, CAST(FLOOR(value * 100) AS BIGINT)"
        " FROM events"
    )
    thresholds = (
        (367879, 0), (735759, 1), (919699, 2), (981012, 3),
        (996340, 4), (999406, 5), (999917, 6),
    )

    def w_of(eid: int, b: int) -> int:
        u = (
            ((eid % _PB_MOD) * 2654435761 % _PB_MOD + (b + 1) * 97)
            * 2654435761 % _PB_MOD % 1000000
        )
        for t, w in thresholds:
            if u < t:
                return w
        return 7

    by_type: dict[str, list[tuple[int, int]]] = {}
    for eid, et, c in rows:
        by_type.setdefault(et, []).append((int(eid), int(c)))
    want = {}
    for et, evs in by_type.items():
        means = []
        for b in range(_PB_REPS):
            sw = swx = 0
            for eid, c in evs:
                w = w_of(eid, b)
                sw += w
                swx += w * c
            means.append((swx // max(sw, 1), b))
        means.sort()
        point = sum(c for _, c in evs) // len(evs)
        want[et] = (
            len(evs), point, means[1][0], means[_PB_REPS - 2][0]
        )
    got = {
        r.event_type: (r.n_events, r.mean_cents, r.ci_lo_cents, r.ci_hi_cents)
        for r in poisson_bootstrap_ci(spark, SF_DIR).collect()
    }
    assert got == want
    # the interval is non-degenerate and brackets the point estimate
    for n, m, lo, hi in got.values():
        assert lo < hi
        assert lo <= m <= hi


# ------------------------------------------ isotonic calibration


def test_isotonic_calibration_monotone_and_pav(spark):
    from etl_energy_tracker_spark.queries.evalops import (
        isotonic_calibration_pav,
    )

    rows = sorted(
        (r.bin, r.n_docs, r.raw_acc_ppm, r.cal_ppm)
        for r in isotonic_calibration_pav(spark, SF_DIR).collect()
    )
    cals = [c for *_, c in rows]
    assert cals == sorted(cals)  # isotonic by construction
    # PAV preserves the weighted mean level within floor-div error
    tot = sum(n for _, n, _, _ in rows)
    raw_mean = sum(n * a for _, n, a, _ in rows) // tot
    cal_mean = sum(n * c for _, n, _, c in rows) // tot
    assert abs(raw_mean - cal_mean) <= len(rows)  # quantization slack
    # where raw accuracies are already monotone, PAV leaves them alone
    raw = [a for _, _, a, _ in rows]
    if raw == sorted(raw):
        assert raw == cals


# ------------------------------------------ permutation test + BH


def test_permutation_fdr_python_replay(spark):
    from etl_energy_tracker_spark.queries.statops import (
        _PT_MOD,
        _PT_REPS,
        permutation_test_fdr,
    )

    rows = _duck_rows(
        "SELECT event_type, user_id, CAST(FLOOR(value * 100) AS BIGINT)"
        " FROM events"
    )

    def arm_of(uid: int, b: int) -> int:
        if b == 0:
            return uid % 2
        return (
            ((uid % _PT_MOD) * 2654435761 % _PT_MOD + b * 97 + 13)
            * 2654435761 % _PT_MOD
        ) % 2

    by_type: dict[str, list[tuple[int, int]]] = {}
    for et, uid, c in rows:
        by_type.setdefault(et, []).append((int(uid), int(c)))
    stats = {}
    for et, evs in by_type.items():
        ts = []
        for b in range(_PT_REPS):
            na = nb = sa = sb = 0
            for uid, c in evs:
                if arm_of(uid, b) == 0:
                    na += 1
                    sa += c
                else:
                    nb += 1
                    sb += c
            if na == 0 or nb == 0:
                ts.append(None)
            else:
                ts.append(math.floor(1000.0 * (sa / na - sb / nb)))
        t_obs = ts[0]
        if t_obs is None:
            continue
        p = 1 + sum(
            1 for t in ts[1:] if t is not None and abs(t) >= abs(t_obs)
        )
        stats[et] = (t_obs, p)
    ranked = sorted(stats.items(), key=lambda kv: (kv[1][1], kv[0]))
    m = len(ranked)
    k = max(
        (i + 1 for i, (_, (_, p)) in enumerate(ranked)
         if 20 * p * m <= (i + 1) * _PT_REPS),
        default=None,
    )
    want = {}
    for i, (et, (t_obs, p)) in enumerate(ranked):
        rk = i + 1
        want[et] = (
            t_obs, p, 1000 * p // _PT_REPS, rk,
            1 if k is not None and rk <= k else 0,
        )
    got = {
        r.event_type: (
            r.t_obs_milli, r.p_count, r.p_milli, r.bh_rank, r.discovered
        )
        for r in permutation_test_fdr(spark, SF_DIR).collect()
    }
    assert got == want
    # the parity split is a null split: nothing should be discovered
    # at alpha=5% with high probability, and p-values must be valid
    for t_obs, p, p_milli, rk, disc in got.values():
        assert 1 <= p <= _PT_REPS
        assert 0 <= p_milli <= 1000


# ------------------------------------------ CUPED


def test_cuped_python_replay(spark):
    from etl_energy_tracker_spark.queries.statops import (
        cuped_variance_reduction,
    )

    rows = _duck_rows(
        "SELECT event_type, user_id, epoch_us(ts),"
        " CAST(FLOOR(value * 100) AS BIGINT) FROM events"
    )
    us = [r[2] for r in rows]
    split = min(us) + (max(us) - min(us)) // 2
    per = {}
    for et, uid, t, c in rows:
        key = (et, int(uid))
        x, y = per.get(key, (0, 0))
        if t < split:
            x += int(c)
        else:
            y += int(c)
        per[key] = (x, y)
    by_type: dict[str, list] = {}
    for (et, uid), (x, y) in per.items():
        by_type.setdefault(et, []).append((uid, uid % 2, x, y))
    want = {}
    for et, users in by_type.items():
        n = len(users)
        sx = sum(x for _, _, x, _ in users)
        sy = sum(y for _, _, _, y in users)
        sxx = sum(x * x for _, _, x, _ in users)
        sxy = sum(x * y for _, _, x, y in users)
        syy = sum(y * y for _, _, _, y in users)
        na = sum(1 for _, a, _, _ in users if a == 0)
        nb = n - na
        sxa = sum(x for _, a, x, _ in users if a == 0)
        sxb = sx - sxa
        sya = sum(y for _, a, _, y in users if a == 0)
        syb = sy - sya
        cov = float(n) * float(sxy) - float(sx) * float(sy)
        varx = float(n) * float(sxx) - float(sx) * float(sx)
        vary = float(n) * float(syy) - float(sy) * float(sy)
        theta = (
            math.floor(1000.0 * cov / varx) if varx > 0.0 else None
        )
        raw = (
            math.floor(1000.0 * (sya / na - syb / nb))
            if na and nb
            else None
        )
        adj = (
            math.floor(
                1000.0
                * ((sya / na - syb / nb) - cov / varx * (sxa / na - sxb / nb))
            )
            if na and nb and varx > 0.0
            else None
        )
        vr = (
            math.floor(1000000.0 * cov * cov / (varx * vary))
            if varx > 0.0 and vary > 0.0
            else None
        )
        want[et] = (n, na, nb, theta, raw, adj, vr)
    got = {
        r.event_type: (
            r.n_users, r.n_a, r.n_b, r.theta_milli, r.diff_raw_milli,
            r.diff_cuped_milli, r.var_reduction_ppm,
        )
        for r in cuped_variance_reduction(spark, SF_DIR).collect()
    }
    assert got == want
    # r^2 is a fraction of variance: inside [0, 1e6] up to floor
    for *_, vr in got.values():
        if vr is not None:
            assert 0 <= vr <= 1000000


# ------------------------------------------ Bradley-Terry MM


def test_bradley_terry_python_replay(spark):
    from etl_energy_tracker_spark.queries.mlops import (
        _BT_SCALE,
        bradley_terry_mm,
    )
    from etl_energy_tracker_spark.queries.prepops import _HLC_W_DUCK

    rows = _duck_rows(
        "WITH toks AS (SELECT doc_id, source,"
        " unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok"
        " FROM documents)"
        f" SELECT source, CAST(SUM({_HLC_W_DUCK}) AS BIGINT)"
        " FROM toks GROUP BY doc_id, source"
    )
    by_src: dict[str, list[int]] = {}
    for src, s in rows:
        by_src.setdefault(src, []).append(int(s))
    srcs = sorted(by_src)
    n = {k: len(v) for k, v in by_src.items()}
    # doubled dominance counts by direct enumeration (test-size only)
    w2 = {}
    for i in srcs:
        for j in srcs:
            if i == j:
                continue
            w2[(i, j)] = sum(
                2 if a > b else (1 if a == b else 0)
                for a in by_src[i]
                for b in by_src[j]
            )
    for i in srcs:
        for j in srcs:
            if i < j:
                assert w2[(i, j)] + w2[(j, i)] == 2 * n[i] * n[j]
    r2 = {
        (i, j): _BT_SCALE * w for (i, j), w in w2.items()
    }
    r2 = {k: v // (n[k[0]] * n[k[1]]) for k, v in r2.items()}
    wsum = {i: sum(r2[(i, j)] for j in srcs if j != i) for i in srcs}

    def mm(strength):
        raw = {}
        for i in srcs:
            d = sum(
                (r2[(i, j)] + r2[(j, i)]) * _BT_SCALE
                // (strength[i] + strength[j])
                for j in srcs
                if j != i
            )
            raw[i] = wsum[i] * _BT_SCALE // d
        tot = sum(raw.values())
        return {i: raw[i] * (_BT_SCALE * len(srcs)) // tot for i in srcs}

    s0 = {i: _BT_SCALE for i in srcs}
    s1 = mm(s0)
    s2 = mm(s1)
    want = {
        i: (n[i], wsum[i] // (2 * (len(srcs) - 1)), s1[i], s2[i])
        for i in srcs
    }
    got = {
        r.source: (
            r.n_docs, r.win_rate_ppm, r.strength1_ppm, r.strength2_ppm
        )
        for r in bradley_terry_mm(spark, SF_DIR).collect()
    }
    assert got == want
    # normalization holds: strengths average to ~1e6
    tot2 = sum(v[3] for v in got.values())
    assert abs(tot2 - _BT_SCALE * len(got)) <= len(got)


# ------------------------------------------ best-of-n curve


def test_best_of_n_identity_exact():
    # the order-statistic identity E[max of n] = sum_i s_(i) *
    # C(i-1, n-1)/C(N, n) against brute-force subset enumeration
    from fractions import Fraction
    from itertools import combinations
    from math import comb

    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    for nn in (2, 4, 8):
        brute = Fraction(
            sum(max(c) for c in combinations(vals, nn)),
            comb(len(vals), nn),
        )
        s = sorted(vals)
        ident = sum(
            Fraction(s[i - 1] * comb(i - 1, nn - 1), comb(len(s), nn))
            for i in range(1, len(s) + 1)
        )
        assert brute == ident


def test_best_of_n_python_replay(spark):
    from etl_energy_tracker_spark.queries.evalops import best_of_n_curve

    rows = _duck_rows(
        "SELECT event_id, event_type, CAST(FLOOR(value * 100) AS BIGINT)"
        " FROM events"
    )
    by_type: dict[str, list[tuple[int, int]]] = {}
    for eid, et, c in rows:
        by_type.setdefault(et, []).append((int(c), int(eid)))
    want = {}
    for et, evs in by_type.items():
        evs.sort()
        ns = len(evs)
        out = [ns, max(c for c, _ in evs)]
        for nn in (2, 4, 8):
            if ns < nn:
                out.append(None)
                continue
            total = 0
            for idx, (c, _) in enumerate(evs):
                i = idx + 1
                w = 1000000.0 * float(nn)
                for j in range(1, nn):
                    w = w * (float(i - j) / float(ns - j))
                w = math.floor(w / float(ns))
                total += c * w
            out.append(math.floor(float(total) / 100.0))
        want[et] = tuple(out)
    got = {
        r.event_type: (
            r.n_samples, r.max_cents,
            r.eb2_decimilli, r.eb4_decimilli, r.eb8_decimilli,
        )
        for r in best_of_n_curve(spark, SF_DIR).collect()
    }
    assert got == want
    # the curve is monotone in n and bounded by the observed max
    for ns, mx, e2, e4, e8 in got.values():
        if e8 is not None:
            assert e2 <= e4 <= e8 <= mx * 10000


# ------------------------------------------ matryoshka recall


def test_matryoshka_python_replay(spark):
    from etl_energy_tracker_spark.queries.vectorops import (
        _MDR_DIMS,
        _N_QUERIES,
        _TOP_K,
        matryoshka_dim_recall,
    )

    rows = _emb_rows()
    qs = [(vid, ev) for vid, ev in rows if vid < _N_QUERIES]
    cs = [(vid, ev) for vid, ev in rows if vid >= _N_QUERIES]

    def cos(a, b, d):
        num = sum(float(x) * float(y) for x, y in zip(a[:d], b[:d]))
        na = math.sqrt(sum(float(x) ** 2 for x in a[:d]))
        nb = math.sqrt(sum(float(y) ** 2 for y in b[:d]))
        return round(num / (na * nb), 6)

    truth = {}
    for qid, qv in qs:
        ranked = sorted(
            ((cos(qv, cv, 64), vid) for vid, cv in cs),
            key=lambda t: (-t[0], t[1]),
        )[:_TOP_K]
        truth[qid] = [vid for _, vid in ranked]
    want = {}
    for qid, qv in qs:
        for d in _MDR_DIMS:
            ranked = sorted(
                ((cos(qv, cv, d), vid) for vid, cv in cs),
                key=lambda t: (-t[0], t[1]),
            )[:_TOP_K]
            ids = [vid for _, vid in ranked]
            hits = len(set(ids) & set(truth[qid]))
            nn = truth[qid][0]
            nn_rank = ids.index(nn) + 1 if nn in ids else 0
            want[(qid, d)] = (hits, 1000000 * hits // _TOP_K, nn_rank)
    got = {
        (r.query_id, r.dims): (r.n_hits, r.recall_ppm, r.nn_rank)
        for r in matryoshka_dim_recall(spark, SF_DIR).collect()
    }
    assert got == want
    # recall should not degrade (weakly) as dims grow, per query,
    # and 32 of 64 dims should recover most of the list on average
    for qid, _ in qs:
        r8 = got[(qid, 8)][1]
        r32 = got[(qid, 32)][1]
        assert r32 >= r8 - 200000  # allow mild non-monotonicity


# ------------------------------------------ exact Shapley


def test_shapley_python_replay(spark):
    from math import factorial

    from etl_energy_tracker_spark.queries.insightops import (
        shapley_channel_attribution,
    )

    rows = _duck_rows(
        "SELECT user_id, event_type, epoch_us(ts), event_id FROM events"
    )
    by_user: dict[int, list] = {}
    for uid, et, us, eid in rows:
        by_user.setdefault(int(uid), []).append((us, int(eid), et))
    touch: dict[int, set] = {}
    conv: dict[int, int] = {}
    for uid, evs in by_user.items():
        evs.sort()
        seen = set()
        purchased = False
        for _, _, et in evs:
            if et == "purchase":
                purchased = True
                break
            seen.add(et)
        conv[uid] = 1 if any(et == "purchase" for _, _, et in evs) else 0
        touch[uid] = seen if purchased else {
            et for _, _, et in evs if et != "purchase"
        }
    channels = sorted({c for s in touch.values() for c in s})
    cidx = {c: i for i, c in enumerate(channels)}
    cc = len(channels)
    mstats: dict[int, int] = {}
    for uid in conv:
        mask = sum(1 << cidx[c] for c in touch[uid])
        mstats[mask] = mstats.get(mask, 0) + conv[uid]

    def v(s):
        return sum(cv for m, cv in mstats.items() if (m & s) == m)

    vt = [v(s) for s in range(1 << cc)]
    want = {}
    v_full, v_empty = vt[(1 << cc) - 1], vt[0]
    fact_c = factorial(cc)
    tot_phi = 0
    for c in channels:
        bit = 1 << cidx[c]
        phi = sum(
            factorial(bin(s).count("1"))
            * factorial(cc - bin(s).count("1") - 1)
            * (vt[s + bit] - vt[s])
            for s in range(1 << cc)
            if not s & bit
        )
        tot_phi += phi
        touched = sum(1 for u, s in touch.items() if c in s)
        want[c] = (
            touched,
            1000 * phi // fact_c,
            1000000 * phi // (fact_c * (v_full - v_empty)),
        )
    # efficiency axiom, exactly
    assert tot_phi == fact_c * (v_full - v_empty)
    got = {
        r.channel: (
            r.n_users_touched, r.conv_attributed_milli, r.share_ppm
        )
        for r in shapley_channel_attribution(spark, SF_DIR).collect()
    }
    assert got == want


# ------------------------------------------ fairness audit


def test_fairness_audit_python_replay(spark):
    from etl_energy_tracker_spark.queries.evalops import (
        _AUC_HI,
        _AUC_LO,
        classifier_fairness_audit,
    )
    from etl_energy_tracker_spark.queries.prepops import _HLC_W_DUCK

    rows = _duck_rows(
        "WITH toks AS (SELECT doc_id, lang,"
        " unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok"
        " FROM documents)"
        f" SELECT lang, CAST(SUM({_HLC_W_DUCK}) AS BIGINT) > 0,"
        " 1000000 * SUM(CASE WHEN tok IN ('a', 'the') THEN 1 ELSE 0 END)"
        f" // COUNT(*) BETWEEN {_AUC_LO} AND {_AUC_HI}"
        " FROM toks GROUP BY doc_id, lang"
    )
    st: dict[str, list[int]] = {}
    for lang, pred, good in rows:
        n, np_, ng, tp, fp = st.setdefault(lang, [0, 0, 0, 0, 0])
        st[lang] = [
            n + 1,
            np_ + (1 if pred else 0),
            ng + (1 if good else 0),
            tp + (1 if pred and good else 0),
            fp + (1 if pred and not good else 0),
        ]
    tn = sum(v[0] for v in st.values())
    tnp = sum(v[1] for v in st.values())
    tng = sum(v[2] for v in st.values())
    ttp = sum(v[3] for v in st.values())
    tfp = sum(v[4] for v in st.values())
    g_sel = 1000000 * tnp // tn
    g_tpr = 1000000 * ttp // tng if tng else None
    g_fpr = 1000000 * tfp // (tn - tng) if tn - tng else None
    want = {}
    for lang, (n, np_, ng, tp, fp) in st.items():
        sel = 1000000 * np_ // n
        tpr = 1000000 * tp // ng if ng else None
        fpr = 1000000 * fp // (n - ng) if n - ng else None
        eo = (
            max(abs(tpr - g_tpr), abs(fpr - g_fpr))
            if tpr is not None and fpr is not None
            else None
        )
        want[lang] = (n, sel, tpr, fpr, abs(sel - g_sel), eo)
    got = {
        r.lang: (
            r.n_docs, r.sel_ppm, r.tpr_ppm, r.fpr_ppm,
            r.dp_gap_ppm, r.eo_gap_ppm,
        )
        for r in classifier_fairness_audit(spark, SF_DIR).collect()
    }
    assert got == want


# ------------------------------------------ Nelson-Aalen


def test_nelson_aalen_python_replay(spark):
    from etl_energy_tracker_spark.queries.behaviorops import (
        nelson_aalen_hazard,
    )

    rows = _duck_rows(
        "SELECT user_id, event_type, epoch_us(ts) FROM events"
    )
    per: dict[int, list] = {}
    for uid, et, us in rows:
        per.setdefault(int(uid), []).append((us, et))
    durs = []
    for uid, evs in per.items():
        first = min(us for us, _ in evs)
        last = max(us for us, _ in evs)
        convs = [us for us, et in evs if et == "purchase"]
        if convs:
            durs.append(((min(convs) - first) // 3600000000, 1))
        else:
            durs.append(((last - first) // 3600000000, 0))
    hist: dict[int, list[int]] = {}
    for t, ev in durs:
        d, n = hist.setdefault(t, [0, 0])
        hist[t] = [d + ev, n + 1]
    total = len(durs)
    want = []
    cum_leave = 0
    cum_h = 0
    for t in sorted(hist):
        d, leave = hist[t]
        n_risk = total - cum_leave
        cum_leave += leave
        if d > 0:
            h = 1000000 * d // n_risk
            cum_h += h
            want.append((t, n_risk, d, h, cum_h))
    got = sorted(
        (r.t_hours, r.n_risk, r.d_events, r.hazard_ppm, r.cum_hazard_ppm)
        for r in nelson_aalen_hazard(spark, SF_DIR).collect()
    )
    assert got == want
    # risk set is non-increasing and the cumulative hazard increases
    risks = [n for _, n, *_ in got]
    assert risks == sorted(risks, reverse=True)


# ------------------------------------------ delta method


def test_delta_method_python_replay(spark):
    from etl_energy_tracker_spark.queries.statops import (
        delta_method_ratio_ci,
    )

    rows = _duck_rows(
        "SELECT event_type, user_id, CAST(FLOOR(value * 100) AS BIGINT)"
        " FROM events"
    )
    per: dict[tuple, list[int]] = {}
    for et, uid, c in rows:
        x, y = per.get((et, uid), (0, 0))
        per[(et, uid)] = (x + 1, y + int(c))
    by_type: dict[str, list] = {}
    for (et, _), (x, y) in per.items():
        by_type.setdefault(et, []).append((x, y))
    want = {}
    for et, us in by_type.items():
        n = len(us)
        sx = sum(x for x, _ in us)
        sy = sum(y for _, y in us)
        sxx = sum(x * x for x, _ in us)
        sxy = sum(x * y for x, y in us)
        syy = sum(y * y for _, y in us)
        r = sy / sx
        vy = (n * syy - sy * sy) / (n * n)
        vx = (n * sxx - sx * sx) / (n * n)
        cxy = (n * sxy - sx * sy) / (n * n)
        xbar = sx / n
        se = math.sqrt(
            max((vy - 2.0 * r * cxy + r * r * vx) / (n * xbar * xbar),
                0.0)
        )
        want[et] = (
            n,
            math.floor(1000.0 * r),
            math.floor(1000.0 * se),
            math.floor(1000.0 * (r - 1.96 * se)),
            math.floor(1000.0 * (r + 1.96 * se)),
        )
    got = {
        r.event_type: (
            r.n_users, r.ratio_milli, r.se_milli,
            r.ci_lo_milli, r.ci_hi_milli,
        )
        for r in delta_method_ratio_ci(spark, SF_DIR).collect()
    }
    assert got == want
    for n, rr, se, lo, hi in got.values():
        assert lo <= rr <= hi
        assert se >= 0


# ------------------------------------------ diff-in-diff


def test_did_python_replay(spark):
    from etl_energy_tracker_spark.queries.statops import (
        difference_in_differences,
    )

    rows = _duck_rows(
        "SELECT event_type, user_id % 2, epoch_us(ts),"
        " CAST(FLOOR(value * 100) AS BIGINT) FROM events"
    )
    us_all = [r[2] for r in rows]
    split = min(us_all) + (max(us_all) - min(us_all)) // 2
    cells: dict[str, dict[str, list[int]]] = {}
    for et, arm, t, cts in rows:
        tag = ("t" if arm == 1 else "c") + ("p" if t >= split else "0")
        n, s, q = cells.setdefault(et, {}).setdefault(tag, [0, 0, 0])
        cells[et][tag] = [n + 1, s + int(cts), q + int(cts) * int(cts)]
    want = {}
    for et, cc in cells.items():

        def stat(tag):
            return cc.get(tag, [0, 0, 0])

        ntp, stp, qtp = stat("tp")
        nt0, st0, qt0 = stat("t0")
        ncp, scp, qcp = stat("cp")
        nc0, sc0, qc0 = stat("c0")
        if 0 in (ntp, nt0, ncp, nc0):
            want[et] = (ntp + nt0, ncp + nc0, None, None, None)
            continue

        def m(s, n):
            return s / n

        def vn(n, q, s):
            return (n * q - s * s) / (n * n * n)

        est = (m(stp, ntp) - m(st0, nt0)) - (m(scp, ncp) - m(sc0, nc0))
        se = math.sqrt(
            max(vn(ntp, qtp, stp) + vn(nt0, qt0, st0)
                + vn(ncp, qcp, scp) + vn(nc0, qc0, sc0), 0.0)
        )
        want[et] = (
            ntp + nt0,
            ncp + nc0,
            math.floor(1000.0 * est),
            math.floor(1000.0 * se),
            math.floor(1000.0 * est / se) if se != 0.0 else None,
        )
    got = {
        r.event_type: (
            r.n_treat, r.n_control, r.did_milli, r.se_milli, r.z_milli
        )
        for r in difference_in_differences(spark, SF_DIR).collect()
    }
    assert got == want


# ------------------------------------------ streaming session window


def test_stream_session_window_python_replay(spark):
    from etl_energy_tracker_spark.queries.streamops import (
        stream_session_window,
    )

    rows = _duck_rows(
        "SELECT user_id, epoch_us(ts), event_id, value FROM events"
    )
    per: dict[int, list] = {}
    for uid, us, eid, val in rows:
        per.setdefault(int(uid), []).append((us, int(eid), float(val)))
    gap = 1_800_000_000
    want = set()
    for uid, evs in per.items():
        evs.sort(key=lambda t: (t[0], t[1]))
        cur = []
        for us, eid, val in evs:
            if cur and us - cur[-1][0] >= gap:
                want.add(
                    (uid, cur[0][0], cur[-1][0] + gap, len(cur),
                     round(sum(v for _, _, v in cur), 6))
                )
                cur = []
            cur.append((us, eid, val))
        if cur:
            want.add(
                (uid, cur[0][0], cur[-1][0] + gap, len(cur),
                 round(sum(v for _, _, v in cur), 6))
            )
    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events,
         round(r.sum_value, 6))
        for r in stream_session_window(spark, SF_DIR).collect()
    }
    assert got == want


# ------------------------------------------ LOO source influence


def test_loo_source_influence_invariants(spark):
    from etl_energy_tracker_spark.queries.evalops import (
        loo_source_influence,
    )

    rows = {
        r.source: (
            r.n_train_docs, r.n_eval, r.full_acc_ppm, r.loo_acc_ppm,
            r.influence_ppm,
        )
        for r in loo_source_influence(spark, SF_DIR).collect()
    }
    n_docs = _duck_rows("SELECT source, COUNT(*) FROM documents GROUP BY source")
    assert {s for s, _ in n_docs} == set(rows)
    n_eval = _duck_rows(
        "SELECT COUNT(DISTINCT doc_id) FROM documents WHERE doc_id % 17 = 0"
    )[0][0]
    for s, cnt in n_docs:
        nt, ne, full, loo, infl = rows[s]
        assert nt == cnt
        assert ne == n_eval
        assert infl == full - loo
        assert 0 <= full <= 1000000 and 0 <= loo <= 1000000
    # all rows share the same full-model accuracy
    assert len({v[2] for v in rows.values()}) == 1


def test_loo_source_influence_detects_harmful_source(spark):
    # a synthetic corpus where one source's labels are flipped:
    # removing it must IMPROVE accuracy (negative influence for the
    # clean sources' sakes — i.e. positive loo gain <=> influence < 0)
    import duckdb

    from etl_energy_tracker_spark.queries import catalog

    con = duckdb.connect()
    rows = []
    # eval pool = doc_id % 17 == 0. The six en "foo bar baz qux" docs
    # take exactly those ids, so the eval set is all-en-foo. The en
    # class is DILUTED by 20 other-text docs, so the 40 poisoned fr
    # copies of the foo text dominate P(foo|fr) and flip the full
    # model's prediction on every eval doc; removing the poison
    # source restores en. (A pure single-text class can never be
    # out-conditioned — dilution is what makes poisoning effective.)
    eval_ids = [0, 17, 34, 51, 68, 85]
    for i in eval_ids:
        rows.append((i, "foo bar baz qux", "en", "clean_a", 15))
    nxt = (x for x in range(1, 10000) if x % 17 != 0)
    for _ in range(20):
        rows.append(
            (next(nxt), "one two three four five six seven eight",
             "en", "clean_a", 39)
        )
    for _ in range(10):
        rows.append(
            (next(nxt), "alpha beta gamma delta", "fr", "clean_b", 22)
        )
    for _ in range(40):
        rows.append((next(nxt), "foo bar baz qux", "fr", "poison", 15))
    import os
    import tempfile

    tmp = tempfile.mkdtemp()
    con.sql(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR,"
        " lang VARCHAR, source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO documents VALUES (?,?,?,?,?)", rows)
    con.sql(
        f"COPY documents TO '{tmp}/documents.parquet' (FORMAT PARQUET)"
    )
    catalog._load_all()
    out = {
        r.source: r.influence_ppm
        for r in catalog.CATALOG["loo_source_influence"]
        .fn(spark, tmp)
        .collect()
    }
    # removing the poisoned source improves eval accuracy
    assert out["poison"] < 0
    for f in os.listdir(tmp):
        os.remove(os.path.join(tmp, f))
    os.rmdir(tmp)


# ------------------------------------------ post-stratification


def test_post_stratified_python_replay(spark):
    from etl_energy_tracker_spark.queries.statops import (
        post_stratified_effect,
    )

    rows = _duck_rows(
        "SELECT user_id, epoch_us(ts), CAST(FLOOR(value * 100) AS BIGINT)"
        " FROM events"
    )
    us_all = [r[1] for r in rows]
    split = min(us_all) + (max(us_all) - min(us_all)) // 2
    per: dict[int, list[int]] = {}
    for uid, t, cts in rows:
        pre, post = per.get(int(uid), (0, 0))
        if t < split:
            pre += 1
        else:
            post += int(cts)
        per[int(uid)] = (pre, post)
    users = sorted(
        ((pre, uid, post) for uid, (pre, post) in per.items())
    )
    n = len(users)
    # r10 re-plan: exact rank-select cut points over the pre_cnt
    # histogram; c_k = smallest pre_cnt whose cumulative user count
    # reaches ceil(k*n/4); boundary ties lump into the lower stratum.
    from collections import Counter

    hist = sorted(Counter(pre for pre, _, _ in users).items())
    cuts = []
    for k in (1, 2, 3):
        thr = (k * n + 3) // 4
        cum = 0
        for v, cnt in hist:
            cum += cnt
            if cum >= thr:
                cuts.append(v)
                break
    strata = {}
    for pre, uid, post in users:
        t = 1 + sum(1 for c in cuts if pre > c)
        strata.setdefault(t, []).append((uid, post))
    want = {}
    contribs = []
    tot_n = 0
    for t, us in strata.items():
        nn = len(us)
        nt = sum(1 for uid, _ in us if uid % 2 == 1)
        nc = nn - nt
        st = sum(p for uid, p in us if uid % 2 == 1)
        sc = sum(p for uid, p in us if uid % 2 == 0)
        eff = (
            math.floor(1000.0 * (st / nt - sc / nc))
            if nt and nc
            else None
        )
        contribs.append(
            math.floor(1000.0 * float(nn) * (st / nt - sc / nc))
            if nt and nc
            else None
        )
        tot_n += nn
        want[t] = (nn, nt, nc, eff)
    overall = (
        math.floor(sum(contribs) / float(tot_n))
        if all(c is not None for c in contribs)
        else None
    )
    got = {
        r.stratum: (r.n_users, r.n_treat, r.n_control, r.effect_milli)
        for r in post_stratified_effect(spark, SF_DIR).collect()
    }
    assert got == want
    ovs = {
        r.overall_milli
        for r in post_stratified_effect(spark, SF_DIR).collect()
    }
    assert ovs == {overall}


# ------------------------------------------ learning curve


def test_nb_learning_curve_invariants(spark):
    from etl_energy_tracker_spark.queries.evalops import (
        nb_learning_curve,
    )

    rows = sorted(
        (r.quarters, r.n_train_docs, r.n_eval, r.accuracy_ppm)
        for r in nb_learning_curve(spark, SF_DIR).collect()
    )
    assert [q for q, *_ in rows] == [1, 2, 3, 4]
    # training size strictly grows with k; eval pool is fixed
    sizes = [n for _, n, _, _ in rows]
    assert sizes == sorted(sizes) and sizes[0] < sizes[-1]
    assert len({ne for _, _, ne, _ in rows}) == 1
    total_train = _duck_rows(
        "SELECT COUNT(*) FROM documents WHERE doc_id % 17 <> 0"
    )[0][0]
    assert sizes[-1] == total_train
    for *_, acc in rows:
        assert 0 <= acc <= 1000000


# ------------------------------------------ Brier decomposition


def test_brier_decomposition_identity(spark):
    from etl_energy_tracker_spark.queries.evalops import (
        brier_decomposition,
    )

    (row,) = brier_decomposition(spark, SF_DIR).collect()
    # generalized Murphy identity, up to the documented per-component
    # floor quantization (<= 10 bins + 3 final floors, in micro)
    recomposed = (
        row.rel_micro - row.res_micro + row.unc_micro
        + row.wbv_micro - 2 * row.wbc_micro
    )
    assert abs(row.brier_micro - recomposed) <= 20
    assert 0 <= row.unc_micro <= 250000
    assert row.rel_micro >= 0 and row.res_micro >= 0
    assert row.wbv_micro >= 0


# ------------------------------------------ power analysis


def test_power_analysis_python_replay(spark):
    from etl_energy_tracker_spark.queries.statops import (
        power_analysis_sample_size,
    )

    rows = _duck_rows(
        "SELECT event_type, user_id % 2, CAST(FLOOR(value * 100)"
        " AS BIGINT) FROM events"
    )
    st: dict[str, list[int]] = {}
    for et, arm, c in rows:
        n, s, q, na, nb, sa, sb = st.setdefault(et, [0] * 7)
        st[et] = [
            n + 1, s + int(c), q + int(c) * int(c),
            na + (arm == 0), nb + (arm == 1),
            sa + (int(c) if arm == 0 else 0),
            sb + (int(c) if arm == 1 else 0),
        ]
    want = {}
    for et, (n, s, q, na, nb, sa, sb) in st.items():
        var = max((n * q - s * s) / (n * n), 0.0)
        delta = (
            abs(sa / na - sb / nb) if na and nb else None
        )
        od = math.floor(1000.0 * delta) if delta is not None else None
        nreq = (
            math.floor(2.0 * 7.849 * var / (delta * delta)) + 1
            if delta not in (None, 0.0) and var != 0.0
            else None
        )
        mde = (
            math.floor(1000.0 * math.sqrt(2.0 * 7.849 * var / min(na, nb)))
            if na and nb and var != 0.0
            else None
        )
        want[et] = (n, od, nreq, mde)
    got = {
        r.event_type: (
            r.n_events, r.observed_delta_milli, r.n_req_per_arm,
            r.mde_milli,
        )
        for r in power_analysis_sample_size(spark, SF_DIR).collect()
    }
    assert got == want
    # sizing sanity: a smaller observed delta demands a larger n
    rows2 = sorted(
        (od, nr) for _, od, nr, _ in got.values()
        if od is not None and nr is not None and od > 0
    )
    for (od1, nr1), (od2, nr2) in zip(rows2, rows2[1:]):
        if od1 < od2:
            assert nr1 >= nr2


# ------------------------------------------ SRM check


def test_srm_python_replay(spark):
    from etl_energy_tracker_spark.queries.statops import srm_check

    rows = _duck_rows(
        "SELECT DISTINCT event_type, user_id FROM events"
    )
    st: dict[str, list[int]] = {}
    for et, uid in rows:
        na, nb = st.setdefault(et, [0, 0])
        st[et] = [na + (uid % 2 == 0), nb + (uid % 2 == 1)]
    want = {}
    for et, (na, nb) in st.items():
        chi2 = 1000 * (na - nb) * (na - nb) // (na + nb)
        want[et] = (na, nb, chi2, 1 if chi2 > 3841 else 0)
    got = {
        r.event_type: (r.n_arm_a, r.n_arm_b, r.chi2_milli, r.srm_flag)
        for r in srm_check(spark, SF_DIR).collect()
    }
    assert got == want
    # the parity split is balanced by construction: no SRM expected
    assert all(f == 0 for *_, f in got.values())
