"""Independent Python replays for the round-7 operators.

Same protocol as test_statops.py: the driver's DuckDB-oracle hash
compare is the primary gate; each test here is a THIRD implementation
(plain Python over the same parquet, no SQL) so a shared Spark/DuckDB
misconception can't pass silently.
"""

from __future__ import annotations

import pytest

import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from etl_energy_tracker_spark.functions.hashing import MOD
from etl_energy_tracker_spark.queries.corpusops import (
    _IMS_SHARDS,
    interleave_mixture_shards,
)
from etl_energy_tracker_spark.queries.evalops import (
    _AUC_HI,
    _AUC_LO,
    calibration_ece_report,
)
from etl_energy_tracker_spark.queries.statops import (
    _TC_THRESHOLDS,
    t_closeness_report,
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


# ---------------------------------------------------------- t-closeness


def test_t_closeness_python_replay(spark):
    got = {
        r.t_threshold_ppm: r
        for r in t_closeness_report(spark, SF_DIR).collect()
    }
    assert set(got) == set(_TC_THRESHOLDS)

    ev = _rows("events")

    def bucket(value: float) -> int:
        return int(value * 100).bit_length() - 1

    per_group = defaultdict(Counter)
    glob = Counter()
    for e in ev:
        qi = (e["event_type"], e["ts"].hour)
        b = bucket(e["value"])
        per_group[qi][b] += 1
        glob[b] += 1
    n_total = sum(glob.values())
    buckets = sorted(glob)
    m = len(buckets)

    t_by_group = {}
    for qi, cnts in per_group.items():
        g_n = sum(cnts.values())
        cum = 0
        s = 0
        for b in buckets:
            p = 1000000 * cnts.get(b, 0) // g_n
            q = 1000000 * glob[b] // n_total
            cum += p - q
            s += abs(cum)
        t_by_group[qi] = (s // (m - 1), g_n)

    all_rows = sum(g_n for _, g_n in t_by_group.values())
    for thr in _TC_THRESHOLDS:
        failing = [
            (t, g_n) for t, g_n in t_by_group.values() if t > thr
        ]
        r = got[thr]
        assert r.n_groups == len(t_by_group)
        assert r.failing_groups == len(failing)
        at_risk = sum(g_n for _, g_n in failing)
        assert r.rows_at_risk == at_risk
        assert r.risk_ppm == 1000000 * at_risk // all_rows


# -------------------------------------------------------- calibration


def test_calibration_ece_python_replay(spark):
    rows = calibration_ece_report(spark, SF_DIR).collect()
    got = {r.bin: r for r in rows}

    docs = _rows("documents")
    scored = []
    for d in docs:
        toks = _toks(d["text"])
        n = len(toks)
        w_sum = sum(_hlc_w(t) for t in toks)
        prob = (w_sum + 1000 * n) * 500 // n
        stop = sum(1 for t in toks if t in ("a", "the"))
        good = _AUC_LO <= 1000000 * stop // n <= _AUC_HI
        scored.append((prob, 1 if good else 0))

    bins = defaultdict(list)
    for prob, y in scored:
        bins[min(prob // 100000, 9)].append((prob, y))
    assert set(got) == set(bins)

    n_total = len(scored)
    ece_num = 0
    for b, members in bins.items():
        n = len(members)
        conf = sum(p for p, _ in members) // n
        acc = 1000000 * sum(y for _, y in members) // n
        r = got[b]
        assert (r.n_docs, r.conf_ppm, r.acc_ppm) == (n, conf, acc)
        assert r.gap_ppm == abs(conf - acc)
        ece_num += n * abs(conf - acc)
    brier = (
        sum((p - y * 1000000) ** 2 // 1000000 for p, y in scored)
        // n_total
    )
    any_row = rows[0]
    assert any_row.ece_ppm == ece_num // n_total
    assert any_row.n_total == n_total
    assert any_row.brier_micro == brier


# -------------------------------------------------- interleaved shards


def test_interleave_mixture_shards_python_replay(spark):
    rows = interleave_mixture_shards(spark, SF_DIR).collect()
    got = {(r.shard, r.source): r for r in rows}

    docs = _rows("documents")
    by_source = defaultdict(list)
    for d in docs:
        hk = _charhash(f"shard:{d['doc_id']}")
        by_source[d["source"]].append((hk, d["doc_id"]))

    cell_n = Counter()
    cell_sum = Counter()
    for src, members in by_source.items():
        members.sort()
        for i, (_, doc_id) in enumerate(members):
            shard = i % _IMS_SHARDS
            cell_n[(shard, src)] += 1
            cell_sum[(shard, src)] += doc_id

    assert set(got) == set(cell_n)
    shard_tot = Counter()
    for (shard, _src), n in cell_n.items():
        shard_tot[shard] += n
    for key, r in got.items():
        shard, src = key
        assert r.n_docs == cell_n[key]
        assert r.id_checksum == cell_sum[key]
        assert r.shard_total == shard_tot[shard]
        assert r.share_ppm == 1000000 * cell_n[key] // shard_tot[shard]
        per_shard = [
            cell_n.get((s, src), 0) for s in range(_IMS_SHARDS)
        ]
        assert r.source_spread == max(per_shard) - min(per_shard)
        # round-robin balance guarantee
        assert r.source_spread <= 1


# ------------------------------------- Markov removal-effect attribution


def test_markov_attribution_python_replay(spark):
    from etl_energy_tracker_spark.queries.insightops import (
        _MAR_ITERS,
        markov_attribution_removal,
    )

    got = {
        r.channel: r
        for r in markov_attribution_removal(spark, SF_DIR).collect()
    }

    ev = sorted(
        _rows("events"), key=lambda e: (e["user_id"], e["ts"], e["event_id"])
    )
    by_user = defaultdict(list)
    for e in ev:
        by_user[e["user_id"]].append(e["event_type"])

    # truncate at first purchase; build edges
    edges = Counter()
    touches = Counter()
    for types in by_user.values():
        path = []
        for t in types:
            path.append(t)
            if t == "purchase":
                break
        first = "__conv__" if path[0] == "purchase" else path[0]
        edges[("__start__", first)] += 1
        for i, t in enumerate(path):
            if t == "purchase":
                continue
            touches[t] += 1
            if i + 1 < len(path):
                nxt = path[i + 1]
                edges[(t, "__conv__" if nxt == "purchase" else nxt)] += 1
            else:
                edges[(t, "__null__")] += 1

    src_tot = Counter()
    for (s, _d), c in edges.items():
        src_tot[s] += c
    p = {k: 1000000 * c // src_tot[k[0]] for k, c in edges.items()}
    channels = sorted({s for s, _ in p if s != "__start__"})

    def absorption(removed: str | None) -> int:
        m = defaultdict(int)
        for (s, d), pp in p.items():
            if s == removed:
                continue
            m[(s, "__null__" if d == removed else d)] += pp
        states = {s for s, _ in m}
        u = {s: 0 for s in states}
        for _ in range(_MAR_ITERS):
            nu = {}
            for s in states:
                acc = 0
                for (src, d), pp in m.items():
                    if src != s:
                        continue
                    if d == "__conv__":
                        acc += pp * 1000000
                    elif d == "__null__":
                        pass
                    else:
                        acc += pp * u.get(d, 0)
                nu[s] = acc // 1000000
            u = nu
        return u["__start__"]

    base = absorption(None)
    effects = {
        ch: max(base - absorption(ch), 0) for ch in channels
    }
    tot_eff = sum(effects.values())
    assert set(got) == set(channels)
    for ch in channels:
        r = got[ch]
        assert r.n_touches == touches[ch]
        assert r.base_conv_ppm == base
        assert r.removal_effect_ppm == effects[ch]
        assert r.removed_conv_ppm == base - effects[ch] or (
            effects[ch] == 0 and r.removed_conv_ppm >= base
        )
        if tot_eff:
            assert r.attribution_ppm == 1000000 * effects[ch] // tot_eff


# --------------------------------------------- incremental IVF assign


def _round_half_away(x: float, dp: int) -> float:
    import math

    scaled = x * 10**dp
    return math.trunc(scaled + math.copysign(0.5, scaled)) / 10**dp


def test_ivf_incremental_assign_python_replay(spark):
    import math

    from etl_energy_tracker_spark.queries.vectorops import (
        ivf_incremental_assign,
    )

    got = {
        r.cell: r for r in ivf_incremental_assign(spark, SF_DIR).collect()
    }

    emb = {e["vec_id"]: [float(x) for x in e["embedding"]]
           for e in _rows("embeddings")}
    old_ids = [i for i in emb if i % 10 != 9]

    def centroids_from(assign: dict) -> dict:
        cells = defaultdict(list)
        for vid, cell in assign.items():
            cells[cell].append(emb[vid])
        return {
            cell: [
                _round_half_away(sum(v[d] for v in vs) / len(vs), 4)
                for d in range(64)
            ]
            for cell, vs in cells.items()
        }

    def cos6(a, b) -> float | None:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        if na * nb == 0:
            return None
        return _round_half_away(dot / (na * nb), 6)

    def assign(ids, cents) -> dict:
        out = {}
        for vid in ids:
            best, best_cell = None, None
            for cell in sorted(cents):
                s = cos6(emb[vid], cents[cell])
                if s is not None and (best is None or s > best):
                    best, best_cell = s, cell
            out[vid] = (best_cell, best)
        return out

    a0 = {vid: vid % 16 for vid in old_ids}
    c0 = centroids_from(a0)
    a1 = {vid: ca[0] for vid, ca in assign(old_ids, c0).items()}
    c1 = centroids_from(a1)
    final = assign(list(emb), c1)

    stats = defaultdict(lambda: [0, 0, 0, 0])  # n_old n_new sum_old sum_new
    for vid, (cell, s) in final.items():
        micro = math.trunc(
            s * 1000000 + math.copysign(0.5, s * 1000000)
        )
        if vid % 10 == 9:
            stats[cell][1] += 1
            stats[cell][3] += micro
        else:
            stats[cell][0] += 1
            stats[cell][2] += micro

    assert set(got) == set(stats)
    for cell, (n_old, n_new, s_old, s_new) in stats.items():
        r = got[cell]
        assert (r.n_old, r.n_new) == (n_old, n_new)
        exp_growth = None if n_old == 0 else 1000000 * n_new // n_old
        assert r.growth_ppm == exp_growth
        exp_old = None if n_old == 0 else (
            s_old // n_old if s_old >= 0 else -((-s_old) // n_old)
        )
        exp_new = None if n_new == 0 else (
            s_new // n_new if s_new >= 0 else -((-s_new) // n_new)
        )
        assert r.old_sim_micro == exp_old
        assert r.new_sim_micro == exp_new
        if exp_old is not None and exp_new is not None:
            assert r.drift_micro == exp_new - exp_old


# --------------------------------------------- source lexical distance


def test_source_lexical_distance_python_replay(spark):
    from etl_energy_tracker_spark.queries.statops import (
        source_lexical_distance,
    )

    got = {
        (r.source_a, r.source_b): r
        for r in source_lexical_distance(spark, SF_DIR).collect()
    }

    docs = _rows("documents")
    per_src = defaultdict(Counter)
    for d in docs:
        per_src[d["source"]].update(_toks(d["text"]))
    dist = {}
    for src, tf in per_src.items():
        n = sum(tf.values())
        dist[src] = {t: 1000000 * c // n for t, c in tf.items()}

    sources = sorted(per_src)
    expected_pairs = {
        (a, b) for i, a in enumerate(sources) for b in sources[i + 1:]
    }
    assert set(got) == expected_pairs
    for a, b in expected_pairs:
        da, db = dist[a], dist[b]
        vocab = set(da) | set(db)
        l1 = sum(abs(da.get(t, 0) - db.get(t, 0)) for t in vocab)
        shared = set(da) & set(db)
        r = got[(a, b)]
        assert r.l1_ppm == l1
        assert r.shared_vocab == len(shared)
        assert r.vocab_jaccard_ppm == 1000000 * len(shared) // len(vocab)


# ------------------------------------------------- k-center coreset


@pytest.mark.slow
def test_kcenter_coreset_python_replay(spark):
    import math

    from etl_energy_tracker_spark.queries.vectorops import (
        _KC_PICKS,
        kcenter_coreset_sample,
    )

    rows = kcenter_coreset_sample(spark, SF_DIR).collect()
    got = {r.pick_order: r for r in rows}
    assert len(got) == _KC_PICKS

    emb = {
        e["vec_id"]: [float(x) for x in e["embedding"]]
        for e in _rows("embeddings")
    }

    def dist_micro(a, b) -> int:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        s = dot / (na * nb)
        scaled6 = s * 10**6
        s6 = math.trunc(scaled6 + math.copysign(0.5, scaled6)) / 10**6
        sm = s6 * 1000000
        return 1000000 - math.trunc(sm + math.copysign(0.5, sm))

    chosen = [min(emb)]
    mds = {1: 0}
    for order in range(2, _KC_PICKS + 1):
        best_md, best_id = None, None
        for vid in emb:
            if vid in chosen:
                continue
            md = min(dist_micro(emb[vid], emb[c]) for c in chosen)
            if best_md is None or (md, -vid) > (best_md, -best_id):
                best_md, best_id = md, vid
        chosen.append(best_id)
        mds[order] = best_md

    radius = max(
        min(dist_micro(emb[vid], emb[c]) for c in chosen) for vid in emb
    )
    for order, vid in enumerate(chosen, start=1):
        r = got[order]
        assert r.vec_id == vid
        assert r.min_dist_micro == mds[order]
        assert r.coverage_radius_micro == radius


# --------------------------------------------- blocking strategy eval


def test_blocking_strategy_eval_python_replay(spark):
    from etl_energy_tracker_spark.queries.relational import (
        _BSE_LEV,
        _BSE_SAMPLE_K,
        blocking_strategy_eval,
    )

    got = {
        r.strategy: r
        for r in blocking_strategy_eval(spark, SF_DIR).collect()
    }
    assert set(got) == {
        "last_token", "first_token", "length_band", "hash_mod64"
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(
                    prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)
                ))
            prev = cur
        return prev[-1]

    names = {}
    for p in _rows("part"):
        nm = p["p_name"]
        names[nm] = min(names.get(nm, 1 << 60), p["p_partkey"])
    # r8: fixed-K smallest-by-(hash, name) rank sample (absolute
    # bound on the all-pairs truth stage at any NDV)
    sample = sorted(
        sorted(names, key=lambda nm: (_charhash(nm), nm))[:_BSE_SAMPLE_K]
    )

    def keys(nm: str):
        toks = nm.split()
        return {
            "last_token": toks[-1],
            "first_token": toks[0],
            "length_band": len(nm) // 4,
            "hash_mod64": _charhash(nm) % 64,
        }

    k = {nm: keys(nm) for nm in sample}
    counters = {
        s: Counter() for s in
        ("last_token", "first_token", "length_band", "hash_mod64")
    }
    true_pairs = 0
    n_pairs = 0
    for i, a in enumerate(sample):
        for b in sample[i + 1:]:
            n_pairs += 1
            is_match = lev(a, b) <= _BSE_LEV
            true_pairs += is_match
            for s, c in counters.items():
                if k[a][s] == k[b][s]:
                    c["cand"] += 1
                    if is_match:
                        c["cap"] += 1

    for s, c in counters.items():
        r = got[s]
        assert r.true_pairs == true_pairs
        assert r.candidate_pairs == c["cand"]
        assert r.captured_pairs == c["cap"]
        if true_pairs:
            assert r.recall_ppm == 1000000 * c["cap"] // true_pairs
        assert r.candidate_ppm == 1000000 * c["cand"] // n_pairs
    # the designed key should beat the random baseline on recall
    assert (
        got["last_token"].recall_ppm >= got["hash_mod64"].recall_ppm
    )


# ----------------------------------------------- token budget waterfill


def test_token_budget_waterfill_python_replay(spark):
    from etl_energy_tracker_spark.queries.corpusops import (
        _WF_BUDGET_EPOCHS,
        _WF_MAX_EPOCHS,
        token_budget_waterfill,
    )

    rows = token_budget_waterfill(spark, SF_DIR).collect()
    got = {r.source: r for r in rows}

    per_src = Counter()
    for d in _rows("documents"):
        per_src[d["source"]] += len(_toks(d["text"]))
    doms = {s: (a, _WF_MAX_EPOCHS * a) for s, a in per_src.items()}
    budget = _WF_BUDGET_EPOCHS * sum(a for a, _ in doms.values())
    n = len(doms)

    ranked = sorted(doms.items(), key=lambda kv: (kv[1][1], kv[0]))
    cum = 0
    level = None
    for rn, (src, (a, cap)) in enumerate(ranked, start=1):
        cum += cap
        lvl = (budget - (cum - cap)) // (n - rn + 1)
        if lvl < cap:
            level = lvl
            break
    if level is None:
        level = max(cap for _, cap in doms.values())

    allocs = {s: min(cap, level) for s, (a, cap) in doms.items()}
    total_alloc = sum(allocs.values())
    # feasibility: the chosen level must keep the total inside budget
    assert total_alloc <= budget
    # maximality: raising the level by 1 must overshoot (when uncapped
    # domains exist)
    if any(cap > level for _, cap in doms.values()):
        over = sum(min(cap, level + 1) for _, cap in doms.values())
        assert over > budget

    assert set(got) == set(doms)
    for src, (a, cap) in doms.items():
        r = got[src]
        assert (r.avail_tokens, r.cap_tokens) == (a, cap)
        assert r.alloc_tokens == allocs[src]
        assert r.epochs_milli == 1000 * allocs[src] // a
        assert r.level_tokens == level
        assert r.budget_tokens == budget
        assert r.leftover_tokens == budget - total_alloc


# ------------------------------------------------ join cardinality audit


@pytest.mark.slow
def test_join_cardinality_audit_python_replay(spark):
    from etl_energy_tracker_spark.queries.mlops import (
        _JCA_JOINS,
        join_cardinality_audit,
    )

    got = {
        r.join_name: r
        for r in join_cardinality_audit(spark, SF_DIR).collect()
    }
    assert set(got) == {j[0] for j in _JCA_JOINS}

    tables = {}
    for name, lt, lk, rt, rk in _JCA_JOINS:
        for t in (lt, rt):
            if t not in tables:
                tables[t] = _rows(t)

    for name, lt, lk, rt, rk in _JCA_JOINS:
        lrows, rrows = tables[lt], tables[rt]
        n_left, n_right = len(lrows), len(rrows)
        ndv_l = len({r[lk] for r in lrows})
        ndv_r = len({r[rk] for r in rrows})
        rcount = Counter(r[rk] for r in rrows)
        actual = sum(rcount.get(r[lk], 0) for r in lrows)
        est = n_left * n_right // max(ndv_l, ndv_r)
        r = got[name]
        assert (r.n_left, r.n_right) == (n_left, n_right)
        assert (r.ndv_left, r.ndv_right) == (ndv_l, ndv_r)
        assert r.est_rows == est
        assert r.actual_rows == actual
        if min(est, actual):
            assert r.q_error_milli == (
                1000 * max(est, actual) // min(est, actual)
            )
