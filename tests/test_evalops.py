"""Python-replay tests for the evaluation-layer operators (evalops).

The driver's DuckDB-oracle hash compare is the primary gate; these
recompute each operator end-to-end in plain Python from the same
parquet inputs, pinning the integer-exact specs (truncating division,
mid-rank U, integer log2, IEEE cosine chain) independently of both
engines.
"""

from __future__ import annotations

import pytest

import math
import re
from collections import Counter, defaultdict

from etl_energy_tracker_spark.functions.hashing import MOD
from etl_energy_tracker_spark.queries.evalops import (
    _AUC_HI,
    _AUC_LO,
    _BAD_TOKENS,
    autocorrelation_lags,
    badword_filter_report,
    classifier_auc_eval,
    label_centroid_similarity,
    nb_lang_confusion,
)
from etl_energy_tracker_spark.queries.prepops import _HLC_BUCKETS

from conftest import SF_DIR


def _charhash(s: str, seed: int = 7) -> int:
    h = seed
    for ch in s:
        h = (h * 31 + ord(ch)) % MOD
    return h


def _toks(text: str) -> list[str]:
    return re.split(r"\s+", text.strip(), flags=re.ASCII)


def _trunc_div(a: int, b: int) -> int:
    # Spark DIV / DuckDB // truncate toward zero; Python // floors
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _hlc_weight(tok: str) -> int:
    return ((_charhash(tok) % _HLC_BUCKETS) * 2654435761) % 1000003 % 2001 - 1000


def test_badword_report_recompute(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    per_src = defaultdict(lambda: [0, 0, 0, 0])  # docs, flagged, hits, toks
    for d in docs:
        t = _toks(d.text)
        hits = sum(1 for x in t if x in _BAD_TOKENS)
        s = per_src[d.source]
        s[0] += 1
        s[1] += hits > 0
        s[2] += hits
        s[3] += len(t)
    got = {r.source: r for r in badword_filter_report(spark, SF_DIR).collect()}
    assert set(got) == set(per_src)
    for src, (n, fl, hits, ntok) in per_src.items():
        r = got[src]
        assert (r.n_docs, r.flagged_docs, r.bad_hits) == (n, fl, hits)
        assert r.flagged_ppm == 1_000_000 * fl // n
        assert r.bad_token_ppm == 1_000_000 * hits // ntok


def test_auc_midrank_recompute(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    scored = []
    for d in docs:
        t = _toks(d.text)
        score = sum(_hlc_weight(x) for x in t)
        stop = sum(1 for x in t if x in ("a", "the"))
        good = _AUC_LO <= 1_000_000 * stop // len(t) <= _AUC_HI
        scored.append((score, d.doc_id, good))
    n_pos = sum(1 for s in scored if s[2])
    n_neg = len(scored) - n_pos
    # mid-rank U over grouped scores
    by_score = defaultdict(lambda: [0, 0])
    for score, _, good in scored:
        by_score[score][0 if good else 1] += 1
    neg_below, two_u = 0, 0
    for s in sorted(by_score):
        cp, cn = by_score[s]
        two_u += cp * (2 * neg_below + cn)
        neg_below += cn
    auc_ppm = 1_000_000 * two_u // (2 * n_pos * n_neg)
    # ntile(10) deciles over (score, doc_id)
    ordered = sorted(scored, key=lambda x: (x[0], x[1]))
    n = len(ordered)
    base, extra = divmod(n, 10)
    deciles, i = {}, 0
    for dec in range(1, 11):
        size = base + (1 if dec <= extra else 0)
        chunk = ordered[i : i + size]
        i += size
        npos = sum(1 for c in chunk if c[2])
        deciles[dec] = (len(chunk), npos, 1_000_000 * npos // len(chunk))
    rows = classifier_auc_eval(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert (r.auc_ppm, r.pos_total, r.neg_total) == (auc_ppm, n_pos, n_neg)
        assert (r.n_docs, r.n_pos, r.pos_ppm) == deciles[r.decile]


def test_acf_replay(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    hourly = defaultdict(lambda: [0, 0])  # (type, hour) -> [sum_cents, n]
    for e in events:
        h = e.ts.replace(minute=0, second=0, microsecond=0)
        cents = int(math.floor(abs(e.value) * 100 + 0.5)) * (
            1 if e.value >= 0 else -1
        )
        s = hourly[(e.event_type, h)]
        s[0] += cents
        s[1] += 1
    means = {k: _trunc_div(v[0], v[1]) for k, v in hourly.items()}
    by_type = defaultdict(dict)
    for (et, h), m in means.items():
        by_type[et][h] = m
    expect = {}
    for et, series in by_type.items():
        s_sum, n = sum(series.values()), len(series)
        mean = _trunc_div(s_sum, n)
        d = {h: m - mean for h, m in series.items()}
        c0 = sum(x * x for x in d.values())
        for lag in range(1, 25):
            num, pairs = 0, 0
            for h, da in d.items():
                from datetime import timedelta

                h2 = h + timedelta(hours=lag)
                if h2 in d:
                    num += da * d[h2]
                    pairs += 1
            if pairs:
                expect[(et, lag)] = (pairs, _trunc_div(1_000_000 * num, c0))
    got = {
        (r.event_type, r.lag): (r.n_pairs, r.acf_ppm)
        for r in autocorrelation_lags(spark, SF_DIR).collect()
    }
    assert got == expect


def test_nb_confusion_replay(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ilog2 = lambda x: x.bit_length() - 1  # noqa: E731
    cnt, tot, vocab = defaultdict(Counter), Counter(), set()
    for d in docs:
        if d.doc_id % 10 < 8:
            for t in _toks(d.text):
                cnt[d.lang][t] += 1
                tot[d.lang] += 1
                vocab.add(t)
    v = len(vocab)
    confusion = Counter()
    for d in docs:
        if d.doc_id % 10 >= 8:
            t = _toks(d.text)
            best = None
            for c in sorted(cnt):
                score = sum(ilog2(cnt[c][x] + 1) for x in t) - len(t) * ilog2(
                    tot[c] + v
                )
                if best is None or score > best[0]:
                    best = (score, c)
            confusion[(d.lang, best[1])] += 1
    got = {
        (r.actual, r.predicted): r.n_docs
        for r in nb_lang_confusion(spark, SF_DIR).collect()
    }
    assert got == dict(confusion)


def test_label_centroid_cosine_replay(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    sums = defaultdict(lambda: [0] * 65)  # label -> [n, q1..q64]
    for r in emb:
        s = sums[r.label]
        s[0] += 1
        for i, x in enumerate(r.embedding):
            q = int(math.floor(abs(float(x)) * 1_000_000 + 0.5))
            s[i + 1] += q if x >= 0 else -q
    cent = {
        lb: [_trunc_div(s[i], s[0]) for i in range(1, 65)]
        for lb, s in sums.items()
    }
    rows = label_centroid_similarity(spark, SF_DIR).collect()
    labels = sorted(cent)
    assert len(rows) == len(labels) * (len(labels) - 1) // 2
    for r in rows:
        ca, cb = cent[r.label_a], cent[r.label_b]
        dot = sum(x * y for x, y in zip(ca, cb))
        na2 = sum(x * x for x in ca)
        nb2 = sum(x * x for x in cb)
        assert r.dot == dot
        assert r.cos_ppm == math.floor(
            dot / math.sqrt(float(na2) * float(nb2)) * 1_000_000.0
        )


def test_nb_crossval_replay(spark):
    from etl_energy_tracker_spark.queries.evalops import (
        _NBCV_FOLDS,
        nb_crossval_accuracy,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ilog2 = lambda x: x.bit_length() - 1  # noqa: E731
    classes = sorted({d.lang for d in docs})
    cnt = defaultdict(Counter)  # (fold) -> Counter[(lang, tok)]
    tot = defaultdict(Counter)  # fold -> Counter[lang]
    tokc = defaultdict(Counter)  # fold -> Counter[tok]
    for d in docs:
        f = d.doc_id % _NBCV_FOLDS
        for t in _toks(d.text):
            cnt[f][(d.lang, t)] += 1
            tot[f][d.lang] += 1
            tokc[f][t] += 1
    all_cnt = Counter()
    all_tot = Counter()
    all_tok = Counter()
    for f in cnt:
        all_cnt.update(cnt[f])
        all_tot.update(tot[f])
        all_tok.update(tokc[f])
    expect = defaultdict(lambda: [0, 0])
    for d in docs:
        f = d.doc_id % _NBCV_FOLDS
        v = sum(1 for t in all_tok if all_tok[t] - tokc[f][t] > 0)
        t = _toks(d.text)
        best = None
        for c in classes:
            tt = all_tot[c] - tot[f][c]
            score = sum(
                ilog2(all_cnt[(c, x)] - cnt[f][(c, x)] + 1) for x in t
            ) - len(t) * ilog2(tt + v)
            if best is None or score > best[0]:
                best = (score, c)
        e = expect[f]
        e[0] += 1
        e[1] += best[1] == d.lang
    got = {
        r.fold: (r.n_docs, r.n_correct, r.accuracy_ppm)
        for r in nb_crossval_accuracy(spark, SF_DIR).collect()
    }
    assert got == {
        f: (n, c, 1_000_000 * c // n) for f, (n, c) in expect.items()
    }


def test_chi2_replay(spark):
    from etl_energy_tracker_spark.queries.evalops import (
        _CHI2_TOPK,
        chi2_feature_terms,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    lt, tokt, langt = Counter(), Counter(), Counter()
    for d in docs:
        for t in _toks(d.text):
            lt[(d.lang, t)] += 1
            tokt[t] += 1
            langt[d.lang] += 1
    n = sum(lt.values())
    scored = defaultdict(list)
    for (lang, tok), a in lt.items():
        ad_bc = a * (n - tokt[tok] - langt[lang] + a) - (
            tokt[tok] - a
        ) * (langt[lang] - a)
        chi2 = (
            float(n)
            * float(ad_bc)
            * float(ad_bc)
            / (
                float(tokt[tok])
                * float(n - tokt[tok])
                * float(langt[lang])
                * float(n - langt[lang])
            )
        )
        scored[lang].append((math.floor(chi2 * 1000.0), tok))
    expect = {}
    for lang, items in scored.items():
        items.sort(key=lambda x: (-x[0], x[1]))
        for rank, (milli, tok) in enumerate(items[:_CHI2_TOPK], 1):
            expect[(lang, rank)] = (tok, milli)
    got = {
        (r.lang, r.rank): (r.tok, r.chi2_milli)
        for r in chi2_feature_terms(spark, SF_DIR).collect()
    }
    assert got == expect


def test_minhash_estimate_error_bands(spark):
    from etl_energy_tracker_spark.operators import dedup
    from etl_energy_tracker_spark.queries.dedupops import _BANDS, _K
    from etl_energy_tracker_spark.queries.evalops import (
        minhash_estimate_error,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = dedup.minhash_dedup_pairs(
        docs, "doc_id", "text", threshold=0.0, k=_K, bands=_BANDS
    ).collect()
    bands = defaultdict(list)
    for p in pairs:
        jb = min(int(math.floor(p.jaccard * 10.0)), 9)
        bands[jb].append(
            math.floor((p.est_jaccard - p.jaccard) * 1_000_000.0)
        )
    got = {r.jband: r for r in minhash_estimate_error(spark, SF_DIR).collect()}
    assert set(got) == set(bands)
    for jb, diffs in bands.items():
        r = got[jb]
        assert r.n_pairs == len(diffs)
        assert r.mae_micro == sum(abs(x) for x in diffs) // len(diffs)
        s = sum(diffs)
        q = abs(s) // len(diffs)
        assert r.bias_micro == (q if s >= 0 else -q)
        assert r.max_abs_micro == max(abs(x) for x in diffs)


def test_khop_bfs_replay(spark):
    from etl_energy_tracker_spark.queries.graphops import (
        _KHOP_HOPS,
        _KHOP_SEEDS,
        khop_reachability,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    cust = {o.o_orderkey: o.o_custkey for o in orders}
    pairs = {
        (cust[li.l_orderkey], li.l_suppkey)
        for li in lineitem
        if li.l_orderkey in cust
    }
    adj = defaultdict(set)
    for ck, sk in pairs:
        adj[f"c{ck}"].add(f"s{sk}")
        adj[f"s{sk}"].add(f"c{ck}")
    degs = sorted(
        ((len(adj[v]), v) for v in adj if v.startswith("c")),
        key=lambda x: (-x[0], x[1]),
    )
    seeds = [v for _, v in degs[:_KHOP_SEEDS]]
    expect = {}
    for seed in seeds:
        visited = {seed}
        frontier = {seed}
        for hop in range(1, _KHOP_HOPS + 1):
            nxt = set()
            for v in frontier:
                nxt |= adj[v]
            frontier = nxt - visited
            visited |= frontier
            if frontier:
                expect[(seed, hop)] = (len(frontier), len(visited))
    got = {
        (r.seed, r.hop): (r.frontier_size, r.reachable_total)
        for r in khop_reachability(spark, SF_DIR).collect()
    }
    assert got == expect


def test_twopass_median_replay(spark):
    from etl_energy_tracker_spark.queries.sketchops import (
        _TPM_BIN,
        twopass_exact_median,
    )

    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_type = defaultdict(list)
    for e in events:
        cents = int(math.floor(abs(e.value) * 100 + 0.5)) * (
            1 if e.value >= 0 else -1
        )
        by_type[e.event_type].append(cents)
    got = {r.event_type: r for r in twopass_exact_median(spark, SF_DIR).collect()}
    assert set(got) == set(by_type)
    for et, cents in by_type.items():
        cents.sort()
        n = len(cents)
        med = cents[(n + 1) // 2 - 1]
        r = got[et]
        assert (r.n_rows, r.median_cents) == (n, med)
        assert r.median_bin == med // _TPM_BIN
        assert r.bin_rows == sum(
            1 for x in cents if x // _TPM_BIN == med // _TPM_BIN
        )


@pytest.mark.slow
def test_auc_degenerate_single_class_yields_null(spark):
    """All-one-class labels make n_pos*n_neg = 0; the guarded integer
    division must yield NULL auc_ppm (not crash) on the Spark side,
    mirroring the oracle's NULLIF."""
    import tempfile

    # stopword ratio 50% >> the good band on every doc -> all negative
    docs = [(i, "a the a the a the", "en", "src0", 17) for i in range(20)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{d}/documents.parquet"
        )
        rows = classifier_auc_eval(spark, d).collect()
    assert rows and all(r.auc_ppm is None for r in rows)
    assert all(r.pos_total == 0 for r in rows)


def test_distribution_drift_replay(spark):
    from etl_energy_tracker_spark.queries.evalops import (
        _DRIFT_BIN,
        distribution_drift_chi2,
    )

    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    us = {
        e.event_id: int(e.ts.timestamp() * 1_000_000) for e in events
    }
    lo, hi = min(us.values()), max(us.values())
    split = lo + (hi - lo) // 2
    hist = defaultdict(lambda: [0, 0])  # (type, bin) -> [r, o]
    for e in events:
        cents = int(math.floor(abs(e.value) * 100 + 0.5)) * (
            1 if e.value >= 0 else -1
        )
        b = cents // _DRIFT_BIN
        hist[(e.event_type, b)][0 if us[e.event_id] < split else 1] += 1
    per_type = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    totals = defaultdict(lambda: [0, 0])
    for (et, b), (r, o) in hist.items():
        totals[et][0] += r
        totals[et][1] += o
    for (et, b), (r, o) in hist.items():
        R, C = totals[et]
        s = per_type[et]
        if r > 0:
            s[0] += 1
            num = float(o) * float(R) - float(r) * float(C)
            s[1] += math.floor(
                1000.0 * num * num / (float(r) * float(R) * float(C))
            )
        else:
            s[2] += 1
            s[3] += o
    got = {r.event_type: r for r in distribution_drift_chi2(spark, SF_DIR).collect()}
    assert set(got) == set(per_type)
    for et, (rb, chi, nb, nr, _, _) in per_type.items():
        r = got[et]
        assert (r.n_ref, r.n_cur) == tuple(totals[et])
        assert (r.ref_bins, r.chi2_milli, r.new_bins, r.new_rows) == (
            rb, chi, nb, nr,
        )


def test_neyman_allocation_replay(spark):
    from etl_energy_tracker_spark.queries.evalops import (
        _NEY_K,
        neyman_allocation_sample,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    strata = defaultdict(list)
    for d in docs:
        strata[d.lang].append(d)
    w_milli, n_h = {}, {}
    for lang, ds in strata.items():
        n = len(ds)
        sx = sum(d.n_chars for d in ds)
        sx2 = sum(d.n_chars * d.n_chars for d in ds)
        w_milli[lang] = math.floor(
            math.sqrt(float(n * sx2 - sx * sx)) * 1000.0
        )
        n_h[lang] = n
    w_tot = sum(w_milli.values())
    k_base = {g: (_NEY_K * w_milli[g]) // w_tot for g in w_milli}
    rem = {g: (_NEY_K * w_milli[g]) % w_tot for g in w_milli}
    extra = _NEY_K - sum(k_base.values())
    order = sorted(w_milli, key=lambda g: (-rem[g], g))
    k_h = dict(k_base)
    for g in order[:extra]:
        k_h[g] += 1
    expect = set()
    for lang, ds in strata.items():
        ranked = sorted(ds, key=lambda d: (_charhash(str(d.doc_id)), d.doc_id))
        expect |= {(d.doc_id, lang) for d in ranked[: k_h[lang]]}
    rows = neyman_allocation_sample(spark, SF_DIR).collect()
    assert {(r.doc_id, r.lang) for r in rows} == expect
    for r in rows:
        assert (r.k_h, r.n_h, r.w_milli) == (
            k_h[r.lang], n_h[r.lang], w_milli[r.lang],
        )
    assert sum(k_h.values()) == _NEY_K


@pytest.mark.slow
def test_degenerate_inputs_do_not_crash(spark):
    """The guards added for single-language corpora (chi2 margins),
    zero-variance strata (Neyman w_tot=0), zero-norm centroids, and
    retired event types (drift n_cur=0) must yield defined values on
    Spark instead of an ANSI divide-by-zero, matching the oracle."""
    import tempfile
    from datetime import datetime

    from etl_energy_tracker_spark.queries.evalops import (
        chi2_feature_terms,
        distribution_drift_chi2,
        neyman_allocation_sample,
    )

    docs = [(i, "key table row scan", "en", "src0", 17) for i in range(12)]
    # one event type entirely in the first half of the stream
    events = [
        (i, datetime(2024, 1, 1, 0, 0, i), i, "dead", 1.0, "{}")
        for i in range(5)
    ] + [
        (100 + i, datetime(2024, 1, 1, 6, 0, i), i, "alive", 2.0, "{}")
        for i in range(5)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{d}/documents.parquet"
        )
        spark.createDataFrame(
            events,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{d}/events.parquet"
        )
        # single-language corpus: every chi2 term hits lang_t = n_total
        chi = chi2_feature_terms(spark, d).collect()
        assert chi and all(r.chi2_milli == 0 for r in chi)
        # constant n_chars in the only stratum: w_tot = 0 -> empty
        # sample, no crash
        assert neyman_allocation_sample(spark, d).collect() == []
        # 'dead' retired before the midpoint: n_cur = 0, chi2 term 0
        drift = {
            r.event_type: r
            for r in distribution_drift_chi2(spark, d).collect()
        }
        assert drift["dead"].n_cur == 0
        assert drift["dead"].chi2_milli == 0


def test_bloom_join_replay(spark):
    from etl_energy_tracker_spark.queries.sketchops import (
        _BJ_K,
        _BJ_M,
        bloom_join_prefilter,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    small = {
        o.o_orderkey
        for o in orders
        if o.o_orderpriority == "1-URGENT" and o.o_orderdate.month == 3
    }
    def positions(key):
        h = _charhash(str(key))
        return [(h * (2 * i + 3) + 101 * (i + 1)) % _BJ_M for i in range(_BJ_K)]
    bits = set()
    for k in small:
        bits.update(positions(k))
    li_rows = bloom_passed = matched = qty = 0
    for li in lineitem:
        li_rows += 1
        p = all(x in bits for x in positions(li.l_orderkey))
        m = li.l_orderkey in small
        bloom_passed += p
        matched += m
        if m:
            qty += int(math.floor(abs(li.l_quantity) + 0.5))
        assert not (m and not p)  # bloom has no false negatives
    r = bloom_join_prefilter(spark, SF_DIR).collect()[0]
    assert (r.small_keys, r.li_rows) == (len(small), li_rows)
    assert (r.bloom_passed, r.true_matched) == (bloom_passed, matched)
    assert r.false_passed == bloom_passed - matched
    assert r.matched_qty == qty
    denom = li_rows - matched
    assert r.fp_ppm == (
        1_000_000 * (bloom_passed - matched) // denom if denom else None
    )


def _oracle_rows(name, tmpdir):
    """Run the registered DuckDB oracle for ``name`` against the
    parquet tables in ``tmpdir`` (same binding the driver uses)."""
    import duckdb

    from etl_energy_tracker_spark.queries import catalog

    catalog._load_all()
    con = duckdb.connect()
    for t in ("documents", "events"):
        import os

        p = f"{tmpdir}/{t}.parquet"
        if os.path.exists(p):
            # Spark writes a directory of part files
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
            )
    return con.sql(catalog.CATALOG[name].oracle).fetchall()


@pytest.mark.slow
def test_auc_small_corpus_engine_parity(spark):
    """n=7 docs (< 10 deciles, tied scores): Spark and the DuckDB
    oracle must agree bit-for-bit on the ntile edge behavior."""
    import tempfile

    texts = [
        "a key table",          # stopword 1/3 -> good band? 333k ppm: no
        "key table row scan slow fast merge batch part value a a",
        "key a table row scan slow fast merge batch part value dup big",
        "key table row scan",   # 0 stopwords -> not good
        "key table row scan",   # duplicate text: tied score
        "a key table row scan slow fast merge batch part",
        "value value value a the key table row scan slow fast merge",
    ]
    docs = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{d}/documents.parquet"
        )
        srows = classifier_auc_eval(spark, d).collect()
        orows = _oracle_rows("classifier_auc_eval", d)
    cols = ["decile", "n_docs", "n_pos", "pos_ppm", "auc_ppm",
            "pos_total", "neg_total"]
    got = sorted(tuple(str(r[c]) for c in cols) for r in srows)
    exp = sorted(tuple(str(v) for v in r) for r in orows)
    assert got == exp
    assert len(srows) == 7  # ntile(10) over 7 rows yields 7 deciles


@pytest.mark.slow
def test_acf_gapped_series_engine_parity(spark):
    """Hour gaps: time-lag join must drop pairs identically on both
    engines (a row-lag formulation would silently misalign)."""
    import tempfile
    from datetime import datetime

    hours = [0, 1, 2, 5, 6, 9, 10, 11, 26, 27]  # deliberate gaps
    events = [
        (i, datetime(2024, 1, 1, h % 24, 0, 0).replace(
            day=1 + h // 24), i, "t0", float(10 + (i % 4)), "{}")
        for i, h in enumerate(hours)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            events,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{d}/events.parquet"
        )
        srows = autocorrelation_lags(spark, d).collect()
        orows = _oracle_rows("autocorrelation_lags", d)
    cols = ["event_type", "lag", "n_pairs", "acf_ppm"]
    got = sorted(tuple(str(r[c]) for c in cols) for r in srows)
    exp = sorted(tuple(str(v) for v in r) for r in orows)
    assert got == exp
    # lag 3 pairs exist only via the 2->5 gap crossing (h, h+3):
    # {2->5, 6->9, 8?..} — verify at least one lag has FEWER pairs
    # than a row-lag formulation would produce
    by_lag = {r.lag: r.n_pairs for r in srows}
    assert by_lag.get(1, 0) < len(hours) - 1
