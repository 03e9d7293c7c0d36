"""Independent Python replays for the mlops.py operators."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from etl_energy_tracker_spark.functions.hashing import MOD
from etl_energy_tracker_spark.queries.mlops import (
    _ACS_BUCKETS,
    _ACS_COLS,
    _PCA_D,
    _SG_NEGS,
    _SG_OFFSETS,
    analyze_column_stats,
    pca_power_iteration,
    preference_pairs_assemble,
    skipgram_negative_samples,
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


# ------------------------------------------------- ANALYZE stats


def test_analyze_column_stats_python_replay(spark):
    got = defaultdict(dict)
    for r in analyze_column_stats(spark, SF_DIR).collect():
        got[r.col_name][r.bucket] = r
    li = _rows("lineitem")
    for col in _ACS_COLS:
        cents = sorted(
            Counter(math.floor(r[col] * 100) for r in li).items()
        )
        n = len(li)
        ndv = len(cents)
        cum = 0
        bounds = {}
        for v, c in cents:
            cum += c
            for i in range(1, _ACS_BUCKETS):
                if i not in bounds and cum * _ACS_BUCKETS >= i * n:
                    bounds[i] = v
        assert set(got[col]) == set(bounds)
        for i, v in bounds.items():
            r = got[col][i]
            assert r.ub_cents == v
            assert r.ndv == ndv
            assert r.n_rows == n
            assert r.min_cents == cents[0][0]
            assert r.max_cents == cents[-1][0]
        # equi-depth bounds are monotone and end at the max
        bs = [bounds[i] for i in sorted(bounds)]
        assert bs == sorted(bs)
        assert bs[-1] <= cents[-1][0]


# ------------------------------------------- preference assembly


def test_preference_pairs_python_replay(spark):
    got = {
        (r.lang, r.source): r
        for r in preference_pairs_assemble(spark, SF_DIR).collect()
    }
    groups = defaultdict(list)
    for d in _rows("documents"):
        score = sum(_hlc_w(t) for t in _toks(d["text"]))
        groups[(d["lang"], d["source"])].append((score, d["doc_id"]))
    expected = {}
    for key, docs in groups.items():
        if len(docs) < 2:
            continue
        best = max(docs, key=lambda sd: (sd[0], -sd[1]))
        worst = min(docs, key=lambda sd: (sd[0], sd[1]))
        expected[key] = (best, worst, len(docs))
    assert set(got) == set(expected)
    for key, (best, worst, n) in expected.items():
        r = got[key]
        assert (r.chosen_doc, r.chosen_score) == (best[1], best[0])
        assert (r.rejected_doc, r.rejected_score) == (worst[1], worst[0])
        assert r.n_docs == n
        assert r.margin == best[0] - worst[0]
        assert r.margin >= 0


# --------------------------------------------- skip-gram sampling


def test_skipgram_python_replay(spark):
    got = {
        (r.center, r.other, r.kind): r.cnt
        for r in skipgram_negative_samples(spark, SF_DIR).collect()
    }
    docs = [d for d in _rows("documents") if d["text"].strip()]
    tf = Counter()
    for d in docs:
        tf.update(t for t in _toks(d["text"]) if t)
    vocab = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
    vid = {w: i for i, (w, _) in enumerate(vocab)}
    by_vid = {i: w for w, i in vid.items()}
    v = len(vocab)
    expected = Counter()
    for d in docs:
        toks = [t for t in _toks(d["text"]) if t]
        for p0, center in enumerate(toks):
            pos = p0 + 1
            for o in _SG_OFFSETS:
                if p0 + o < len(toks):
                    expected[(center, toks[p0 + o], "pos")] += 1
            for k in range(_SG_NEGS * len(_SG_OFFSETS)):
                draw = (
                    _charhash(center)
                    + d["doc_id"] * 1000003
                    + pos * 31
                    + k
                ) % 1000000007 % v
                expected[(center, by_vid[draw], "neg")] += 1
    assert got == dict(expected)
    # negative volume is exactly negs-per-position
    n_pos_tokens = sum(len([t for t in _toks(d["text"]) if t]) for d in docs)
    n_negs = sum(c for (_, _, k), c in expected.items() if k == "neg")
    assert n_negs == n_pos_tokens * _SG_NEGS * len(_SG_OFFSETS)


# ------------------------------------------- PCA power iteration


def test_pca_power_iteration_python_replay(spark):
    got = {r.dim: r for r in pca_power_iteration(spark, SF_DIR).collect()}
    emb = _rows("embeddings")
    ev = {
        r["vec_id"]: [
            math.floor(float(x) * 1000) for x in r["embedding"]
        ]
        for r in emb
    }

    def step(v_milli):
        dots = {}
        for i, e in ev.items():
            s = sum(a * b for a, b in zip(e, v_milli))
            # truncation toward zero, as Spark DIV / DuckDB //
            dots[i] = -((-s) // 1000) if s < 0 else s // 1000
        w = [0] * _PCA_D
        for i, e in ev.items():
            for d in range(_PCA_D):
                w[d] += e[d] * dots[i]
        m = max(abs(x) for x in w)
        out = []
        for x in w:
            num = x * 1000
            q = abs(num) // m
            out.append(q if num >= 0 else -q)
        return out

    v1 = step([1000] * _PCA_D)
    v2 = step(v1)
    assert len(got) == _PCA_D
    for d in range(_PCA_D):
        r = got[d + 1]
        assert r.v1_milli == v1[d]
        assert r.v2_milli == v2[d]
    # renormalization invariant: some component sits at +/-1000
    assert max(abs(r.v2_milli) for r in got.values()) == 1000
