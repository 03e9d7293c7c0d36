"""Independent Python replays for the statops.py operators.

The driver's DuckDB-oracle hash compare is the primary gate; each
test here is a THIRD implementation (plain Python over the same
parquet, no SQL) so a shared Spark/DuckDB misconception can't pass
silently.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from datetime import datetime

import pyarrow.parquet as pq

from etl_energy_tracker_spark.functions.hashing import MOD
from etl_energy_tracker_spark.queries.evalops import _AUC_HI, _AUC_LO
from etl_energy_tracker_spark.queries.statops import (
    _BENFORD_PPM,
    _LD_THRESHOLDS,
    _ZM_ZONE_ROWS,
    benford_first_digit,
    cohens_kappa_agreement,
    gini_token_concentration,
    ks_drift_stat,
    l_diversity_report,
    lexical_diversity_report,
    spearman_rank_corr,
    zipf_octave_profile,
    zonemap_prune_audit,
)

from conftest import SF_DIR


def _rows(table: str) -> list[dict]:
    return pq.read_table(f"{SF_DIR}/{table}.parquet").to_pylist()


def _toks(text: str) -> list[str]:
    return re.split(r"\s+", text.strip(), flags=re.ASCII)


def _charhash(s: str, seed: int = 7) -> int:
    h = seed
    for ch in s:
        h = (h * 31 + ord(ch)) % MOD
    return h


def _hlc_w(tok: str) -> int:
    return ((_charhash(tok) % 64) * 2654435761) % 1000003 % 2001 - 1000


# ------------------------------------------------------------ KS drift


def test_ks_drift_python_replay(spark):
    got = {r.event_type: r for r in ks_drift_stat(spark, SF_DIR).collect()}
    ev = _rows("events")
    n = len(ev)
    by_type = defaultdict(Counter)
    for e in ev:
        by_type[e["event_type"]][e["value"]] += 1
    all_vals = sorted({e["value"] for e in ev})
    total_c = Counter(e["value"] for e in ev)
    for t, cnts in by_type.items():
        n_t = sum(cnts.values())
        cum_t = cum_all = 0
        best, best_v = -1, None
        for v in all_vals:
            cum_t += cnts.get(v, 0)
            cum_all += total_c[v]
            d = abs(
                1000000 * cum_t // n_t
                - 1000000 * (cum_all - cum_t) // (n - n_t)
            )
            if d > best:
                best, best_v = d, v
        r = got[t]
        assert (r.n_type, r.n_rest) == (n_t, n - n_t)
        assert r.ks_ppm == best
        assert r.ks_at_value == best_v


# ------------------------------------------------- lexical diversity


def test_lexical_diversity_python_replay(spark):
    got = {
        r.source: r
        for r in lexical_diversity_report(spark, SF_DIR).collect()
    }
    per_src = defaultdict(Counter)
    for d in _rows("documents"):
        per_src[d["source"]].update(_toks(d["text"]))
    assert set(got) == set(per_src)
    for src, tf in per_src.items():
        n_tok = sum(tf.values())
        n_typ = len(tf)
        hapax = sum(1 for m in tf.values() if m == 1)
        s2 = sum(m * m for m in tf.values())
        r = got[src]
        assert (r.n_tokens, r.n_types, r.hapax) == (n_tok, n_typ, hapax)
        assert r.dis_legomena == sum(1 for m in tf.values() if m == 2)
        assert r.ttr_ppm == 1000000 * n_typ // n_tok
        assert r.hapax_ppm == 1000000 * hapax // n_typ
        assert r.yule_k_ppm == 1000000 * (
            (10000 * (s2 - n_tok)) // n_tok
        ) // n_tok


# ----------------------------------------------------- Cohen's kappa


def test_cohens_kappa_python_replay(spark):
    r = cohens_kappa_agreement(spark, SF_DIR).collect()[0]
    n11 = n10 = n01 = n00 = 0
    for d in _rows("documents"):
        toks = _toks(d["text"])
        a = sum(_hlc_w(t) for t in toks) > 0
        stop = sum(1 for t in toks if t in ("a", "the"))
        b = _AUC_LO <= 1000000 * stop // len(toks) <= _AUC_HI
        if a and b:
            n11 += 1
        elif a:
            n10 += 1
        elif b:
            n01 += 1
        else:
            n00 += 1
    n = n11 + n10 + n01 + n00
    assert (r.n, r.n11, r.n10, r.n01, r.n00) == (n, n11, n10, n01, n00)
    assert r.agree_ppm == 1000000 * (n11 + n00) // n
    pe_num = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    num = 1000000 * (n * (n11 + n00) - pe_num)
    den = n * n - pe_num
    # truncation toward zero (both engines' integer division)
    expect = -((-num) // den) if (num < 0) != (den < 0) else num // den
    assert r.kappa_ppm == expect


# --------------------------------------------------------------- Gini


def test_gini_python_replay(spark):
    got = {
        r.source: r
        for r in gini_token_concentration(spark, SF_DIR).collect()
    }
    per_src = defaultdict(Counter)
    for d in _rows("documents"):
        per_src[d["source"]].update(_toks(d["text"]))
    for src, tf in per_src.items():
        xs = [m for _, m in sorted(tf.items(), key=lambda kv: (kv[1], kv[0]))]
        nt = len(xs)
        tot = sum(xs)
        siw = sum(i * x for i, x in enumerate(xs, start=1))
        gini = 1000000 * (2 * siw - (nt + 1) * tot) // (nt * tot)
        r = got[src]
        assert (r.n_types, r.n_tokens, r.gini_ppm) == (nt, tot, gini)
        assert 0 <= r.gini_ppm < 1000000


# ------------------------------------------------------------ Benford


def test_benford_python_replay(spark):
    got = {r.digit: r for r in benford_first_digit(spark, SF_DIR).collect()}
    digs = Counter()
    for e in _rows("events"):
        if e["value"] is None:
            continue
        v = math.floor(abs(e["value"]) * 1000000)
        if v > 0:
            digs[int(str(v)[0])] += 1
    n = sum(digs.values())
    assert set(got) == set(digs)
    for d, c in digs.items():
        r = got[d]
        assert r.n_values == c
        assert r.observed_ppm == 1000000 * c // n
        assert r.expected_ppm == _BENFORD_PPM[d]
        assert r.abs_dev_ppm == abs(1000000 * c // n - _BENFORD_PPM[d])
    # expectations are a proper distribution (ppm truncation loses <9)
    assert 999990 <= sum(_BENFORD_PPM.values()) <= 1000000


# ----------------------------------------------------------- Spearman


def _mid_ranks_x2(vals: list) -> list[int]:
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    r2 = [0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and vals[order[j]] == vals[order[i]]:
            j += 1
        # doubled average rank of the tie block [i, j)
        for k in range(i, j):
            r2[order[k]] = (i + 1) + j
        i = j
    return r2


def test_spearman_python_replay(spark):
    got = {
        r.event_type: r for r in spearman_rank_corr(spark, SF_DIR).collect()
    }
    by_type = defaultdict(list)
    for e in _rows("events"):
        by_type[e["event_type"]].append((e["value"], e["ts"].hour))
    for t, pairs in by_type.items():
        xs = _mid_ranks_x2([p[0] for p in pairs])
        ys = _mid_ranks_x2([p[1] for p in pairs])
        n = len(pairs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(v * v for v in xs)
        syy = sum(v * v for v in ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        num = float(n) * float(sxy) - float(sx) * float(sy)
        den = math.sqrt(
            (float(n) * float(sxx) - float(sx) * float(sx))
            * (float(n) * float(syy) - float(sy) * float(sy))
        )
        expect = math.floor(1000000.0 * num / den)
        r = got[t]
        assert r.n_events == n
        assert r.spearman_ppm == expect
        assert -1000000 <= r.spearman_ppm <= 1000000


# ------------------------------------------------------------ zonemap


def test_zonemap_python_replay(spark):
    got = {r.layout: r for r in zonemap_prune_audit(spark, SF_DIR).collect()}
    lo = datetime(1996, 1, 1)
    hi = datetime(1996, 12, 31, 23, 59, 59)
    rows = _rows("lineitem")
    for layout, keyfn in (
        ("orderkey_zones", lambda r: r["l_orderkey"] // _ZM_ZONE_ROWS),
        (
            "shipdate_months",
            lambda r: r["l_shipdate"].year * 12 + r["l_shipdate"].month,
        ),
    ):
        zones = defaultdict(list)
        for r in rows:
            zones[keyfn(r)].append(r["l_shipdate"])
        skipped = {
            z for z, sds in zones.items() if max(sds) < lo or min(sds) > hi
        }
        rows_skipped = sum(len(zones[z]) for z in skipped)
        g = got[layout]
        assert g.n_zones == len(zones)
        assert g.n_rows == len(rows)
        assert g.zones_skipped == len(skipped)
        assert g.rows_skipped == rows_skipped
        assert g.skip_ppm == 1000000 * rows_skipped // len(rows)
    # the audit's whole point: date layout skips, insertion order doesn't
    assert (
        got["shipdate_months"].skip_ppm > got["orderkey_zones"].skip_ppm
    )


# -------------------------------------------------------- l-diversity


def test_l_diversity_python_replay(spark):
    got = {
        r.l_threshold: r for r in l_diversity_report(spark, SF_DIR).collect()
    }
    groups = defaultdict(lambda: (set(), [0]))
    for e in _rows("events"):
        key = (
            e["event_type"],
            e["ts"].hour,
            math.floor(e["value"] / 50),
        )
        users, cnt = groups[key]
        users.add(e["user_id"])
        cnt[0] += 1
    n_rows = sum(c[0] for _, c in groups.values())
    assert set(got) == set(_LD_THRESHOLDS)
    for t in _LD_THRESHOLDS:
        fail = [
            (len(u), c[0]) for u, c in groups.values() if len(u) < t
        ]
        r = got[t]
        assert r.n_groups == len(groups)
        assert r.failing_groups == len(fail)
        assert r.rows_at_risk == sum(c for _, c in fail)
        assert r.risk_ppm == 1000000 * sum(c for _, c in fail) // n_rows
    # monotone in the threshold
    ts = sorted(_LD_THRESHOLDS)
    for a, b in zip(ts, ts[1:]):
        assert got[a].failing_groups <= got[b].failing_groups


# ---------------------------------------------------------------- Zipf


def test_zipf_octave_python_replay(spark):
    got = {r.octave: r for r in zipf_octave_profile(spark, SF_DIR).collect()}
    tf = Counter()
    for d in _rows("documents"):
        tf.update(_toks(d["text"]))
    octs = defaultdict(lambda: [0, 0])
    for m in tf.values():
        o = m.bit_length() - 1
        octs[o][0] += 1
        octs[o][1] += m
    assert set(got) == set(octs)
    prev = None
    for o in sorted(octs):
        r = got[o]
        assert (r.n_types, r.n_tokens) == tuple(octs[o])
        if prev is None:
            assert r.type_ratio_ppm is None
        else:
            assert r.type_ratio_ppm == 1000000 * octs[o][0] // octs[prev][0]
        prev = o


# ------------------------------------- conformal interval / streaks


def test_conformal_python_replay(spark):
    from etl_energy_tracker_spark.queries.statops import (
        conformal_prediction_interval,
    )

    got = {
        r.event_type: r
        for r in conformal_prediction_interval(spark, SF_DIR).collect()
    }
    by_type = defaultdict(list)
    for e in _rows("events"):
        by_type[e["event_type"]].append(math.floor(e["value"] * 100))
    assert set(got) == set(by_type)
    for t, cents in by_type.items():
        s = sorted(cents)
        n = len(s)
        med = s[(n + 1) // 2 - 1]
        scores = sorted(abs(c - med) for c in cents)
        k = (9 * (n + 1) + 9) // 10
        qhat = scores[min(k, n) - 1]
        cover = sum(1 for c in cents if abs(c - med) <= qhat)
        r = got[t]
        assert r.n_events == n
        assert r.median_cents == med
        assert r.qhat_cents == qhat
        assert r.coverage_ppm == 1000000 * cover // n
        # the split-conformal guarantee, observed on-sample
        assert r.coverage_ppm >= 900000


def test_activity_streaks_python_replay(spark):
    from etl_energy_tracker_spark.queries.statops import activity_streaks

    got = {
        r.streak_len: r for r in activity_streaks(spark, SF_DIR).collect()
    }
    days = defaultdict(set)
    for e in _rows("events"):
        days[e["user_id"]].add(e["ts"].date().toordinal())
    streaks = []
    for u, ds in days.items():
        sd = sorted(ds)
        run = 1
        for a, b in zip(sd, sd[1:]):
            if b == a + 1:
                run += 1
            else:
                streaks.append((u, run))
                run = 1
        streaks.append((u, run))
    per_len = defaultdict(lambda: [0, set()])
    for u, ln in streaks:
        per_len[ln][0] += 1
        per_len[ln][1].add(u)
    assert set(got) == set(per_len)
    for ln, (cnt, users) in per_len.items():
        r = got[ln]
        assert r.n_streaks == cnt
        assert r.n_users == len(users)
    # conservation: total streak-days == total distinct active days
    assert sum(ln * r.n_streaks for ln, r in got.items()) == sum(
        len(d) for d in days.values()
    )


def test_stream_conformal_matches_batch_band(spark):
    """Batch/stream parity: the stream's alarms over the bounded
    source equal the batch band + filter + per-type sequence."""
    from etl_energy_tracker_spark.queries.statops import (
        conformal_prediction_interval,
    )
    from etl_energy_tracker_spark.queries.streamops import (
        stream_conformal_alarm,
    )

    band = {
        r.event_type: (r.median_cents, r.qhat_cents)
        for r in conformal_prediction_interval(spark, SF_DIR).collect()
    }
    got = sorted(
        (r.event_type, r.event_id, r.deviation_cents, r.alarm_seq)
        for r in stream_conformal_alarm(spark, SF_DIR).collect()
    )
    flagged = defaultdict(list)
    for e in _rows("events"):
        cents = math.floor(e["value"] * 100)
        med, qhat = band[e["event_type"]]
        dev = abs(cents - med)
        if dev > qhat:
            flagged[e["event_type"]].append(
                (e["ts"], e["event_id"], dev)
            )
    expect = []
    for t, rows in flagged.items():
        rows.sort()
        for seq, (_, eid, dev) in enumerate(rows, start=1):
            expect.append((t, eid, dev, seq))
    assert got == sorted(expect)
    # conformal promise: alarms are ~the 10% tail of each type
    for t, rows in flagged.items():
        n_t = sum(1 for e in _rows("events") if e["event_type"] == t)
        assert len(rows) <= n_t // 10 + 1
