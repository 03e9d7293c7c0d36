"""Independent Python replays for the round-7 operators.

Same protocol as test_statops.py: the driver's DuckDB-oracle hash
compare is the primary gate; each test here is a THIRD implementation
(plain Python over the same parquet, no SQL) so a shared Spark/DuckDB
misconception can't pass silently.
"""

from __future__ import annotations

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
