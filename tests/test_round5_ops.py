"""Invariant tests for the round-5 operator additions.

The driver's DuckDB-oracle hash compare is the primary gate; these
pin structural invariants the hash can't express (determinism across
runs, conservation laws, rank shapes).
"""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from etl_energy_tracker_spark.queries.behaviorops import winsorized_robust_stats
from etl_energy_tracker_spark.queries.corpusops import (
    _RES_K,
    reservoir_group_sample,
)
from etl_energy_tracker_spark.queries.dedupops import (
    _KNN_K,
    dedup_cluster_report,
    jaccard_knn_topk,
)
from etl_energy_tracker_spark.queries.hygieneops import bucketed_join_noshuffle
from etl_energy_tracker_spark.queries.searchops import (
    _TOP_DF,
    delta_encode_postings,
)
from etl_energy_tracker_spark.queries.textops import ngram_novelty_score
from etl_energy_tracker_spark.queries.timeops import time_weighted_average
from etl_energy_tracker_spark.queries.vectorops import embedding_centroid_shift

from conftest import SF_DIR


def test_twap_durations_and_bounds(spark):
    rows = time_weighted_average(spark, SF_DIR).collect()
    assert rows
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_ud = defaultdict(list)
    for e in events:
        by_ud[(e.user_id, e.ts.date())].append(e.value)
    assert len(rows) == len(by_ud)
    for r in rows:
        vals = by_ud[(r.user_id, r.day)]
        assert r.n_events == len(vals)
        # TWAP is a convex combination of the day's centi-values
        lo = min(int(round(v * 100)) for v in vals)
        hi = max(int(round(v * 100)) for v in vals)
        assert lo - 1 <= r.twap_centi <= hi + 1


def test_reservoir_sample_shape_and_determinism(spark):
    a = sorted(
        (r.source, r.doc_id, r.rank)
        for r in reservoir_group_sample(spark, SF_DIR).collect()
    )
    b = sorted(
        (r.source, r.doc_id, r.rank)
        for r in reservoir_group_sample(spark, SF_DIR).collect()
    )
    assert a == b, "sample must be deterministic across runs"
    per_group = Counter(s for s, _, _ in a)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    group_sizes = Counter(d.source for d in docs)
    for src, n in per_group.items():
        assert n == min(_RES_K, group_sizes[src])


def test_winsorized_stats_bounds(spark):
    for r in winsorized_robust_stats(spark, SF_DIR).collect():
        assert r.lo_centi <= r.hi_centi
        assert r.lo_centi <= r.winsor_mean_centi <= r.hi_centi
        assert r.n > 0


def test_knn_rank_shape(spark):
    rows = jaccard_knn_topk(spark, SF_DIR).collect()
    by_doc = defaultdict(list)
    for r in rows:
        assert r.doc_id != r.neighbor_id
        assert 1 <= r.rank <= _KNN_K
        by_doc[r.doc_id].append((r.rank, r.jaccard))
    for doc, rj in by_doc.items():
        rj.sort()
        ranks = [r for r, _ in rj]
        assert ranks == list(range(1, len(ranks) + 1))
        jacs = [j for _, j in rj]
        assert jacs == sorted(jacs, reverse=True)


def test_cluster_report_conserves_docs(spark):
    rows = dedup_cluster_report(spark, SF_DIR).collect()
    n_docs_total = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs_total
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters


def test_delta_postings_sizes(spark):
    rows = delta_encode_postings(spark, SF_DIR).collect()
    assert len(rows) == _TOP_DF
    for r in rows:
        assert r.df >= 1
        assert r.df <= r.varint_bytes <= 5 * r.df
        assert r.raw_bytes == 8 * r.df
        assert r.varint_bytes <= r.raw_bytes
        assert r.compressed_ppm <= 1_000_000


def test_novelty_ppm_bounds(spark):
    rows = ngram_novelty_score(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_unique <= r.n_sh
        assert 0 <= r.novelty_ppm <= 1_000_000


def test_centroid_shift_counts(spark):
    rows = embedding_centroid_shift(spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    by_label = Counter((e.label, e.vec_id % 2) for e in emb)
    for r in rows:
        assert r.n_even == by_label[(r.label, 0)]
        assert r.n_odd == by_label[(r.label, 1)]
        assert r.centroid_l2_shift >= 0.0


def test_bucketed_join_matches_plain_join(spark):
    got = {
        (r.source, r.label): (r.n_docs, r.sum_chars)
        for r in bucketed_join_noshuffle(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    want = {
        (r.source, r.label): (r.n_docs, r.sum_chars)
        for r in docs.join(emb, docs["doc_id"] == emb["vec_id"])
        .groupBy("source", "label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .collect()
    }
    assert got == want


# ------------------------- k-core / prefix-filter / priority sample


def test_kcore_matches_python_peel(spark):
    """4-round k=3 peel must equal the same peel run in Python over
    the collected edge list, and the surviving set must shrink (or
    stay fixed) monotonically round over round."""
    from etl_energy_tracker_spark.queries.graphops import (
        _CORE_K,
        _CORE_ROUNDS,
        kcore_decomposition,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    pairs = {
        (f"c{r['o_custkey']}", f"s{r['l_suppkey']}")
        for r in orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .collect()
    }
    edges = {(a, b) for a, b in pairs} | {(b, a) for a, b in pairs}
    sizes = []
    for _ in range(_CORE_ROUNDS):
        deg = Counter(src for src, _ in edges)
        keep = {v for v, d in deg.items() if d >= _CORE_K}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
        sizes.append(len({v for e in edges for v in e}))
    expected = sorted(Counter(src for src, _ in edges).items())

    got = sorted(
        (r["v"], r["deg"]) for r in kcore_decomposition(spark, SF_DIR).collect()
    )
    assert got == expected
    assert sizes == sorted(sizes, reverse=True)


def test_prefix_filter_join_is_lossless_and_prunes(spark):
    """The prefix-pruned join must return EXACTLY the brute-force
    tau-filtered pair set (losslessness), while indexing strictly
    fewer (doc, token) rows than the full shingle set (pruning)."""
    from etl_energy_tracker_spark.operators.dedup import with_shingles
    from etl_energy_tracker_spark.queries.dedupops import (
        _PFX_DEN,
        _PFX_NUM,
        prefix_filter_jaccard_join,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sets = {
        r["doc_id"]: set(r["shingles"])
        for r in with_shingles(docs.select("doc_id", "text"), "text").collect()
        if r["shingles"]
    }
    ids = sorted(sets)
    expected = sorted(
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if (lambda inter, uni: _PFX_DEN * inter >= _PFX_NUM * uni)(
            len(sets[a] & sets[b]), len(sets[a] | sets[b])
        )
    )
    rows = prefix_filter_jaccard_join(spark, SF_DIR).collect()
    got = sorted((r["doc_a"], r["doc_b"]) for r in rows)
    assert got == expected
    for r in rows:
        assert _PFX_DEN * r["inter"] >= _PFX_NUM * r["uni"]
        assert r["jaccard_ppm"] == (1_000_000 * r["inter"]) // r["uni"]
    # the prefix index is strictly smaller than the full token index
    n_full = sum(len(s) for s in sets.values())
    n_pfx = sum(
        len(s) - ((_PFX_NUM * len(s) + _PFX_DEN - 1) // _PFX_DEN) + 1
        for s in sets.values()
    )
    assert n_pfx < n_full


def test_priority_sample_matches_python_reference(spark):
    """Ranks are 1..k per source, and the selected (source, doc_id,
    weight, rank) rows equal the DLT priority sample computed in pure
    Python — the priority is one exact BIGINT multiply plus one IEEE
    double division, so Python reproduces both engines bit for bit."""
    from etl_energy_tracker_spark.functions.hashing import MOD
    from etl_energy_tracker_spark.queries.corpusops import (
        _PRI_K,
        _PRI_SEED,
        priority_sample_weighted,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    by_src = defaultdict(list)
    for d in docs:
        h = _PRI_SEED
        for c in str(d["doc_id"]):
            h = (h * 31 + ord(c)) % MOD
        w = d["n_chars"] + 1
        pri = float(w * MOD) / (h + 1)
        by_src[d["source"]].append((-pri, d["doc_id"], w))
    expected = sorted(
        (src, doc, w, rank)
        for src, items in by_src.items()
        for rank, (_, doc, w) in enumerate(sorted(items)[:_PRI_K], start=1)
    )

    rows = priority_sample_weighted(spark, SF_DIR).collect()
    per_src = defaultdict(list)
    for r in rows:
        per_src[r["source"]].append(r["rank"])
    for ranks in per_src.values():
        assert sorted(ranks) == list(range(1, min(_PRI_K, len(ranks)) + 1))
    got = sorted((r["source"], r["doc_id"], r["weight"], r["rank"]) for r in rows)
    assert got == expected


def test_greedy_max_coverage_matches_python_greedy(spark):
    """The k-round selection must equal the classic greedy max-coverage
    loop run in Python over the collected shingle sets (argmax marginal
    gain, gain-then-doc_id tie-break, no re-selection)."""
    from etl_energy_tracker_spark.operators.dedup import with_shingles
    from etl_energy_tracker_spark.queries.corpusops import (
        _COV_K,
        greedy_max_coverage,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sets = {
        r["doc_id"]: set(r["shingles"])
        for r in with_shingles(docs.select("doc_id", "text"), "text").collect()
        if r["shingles"]
    }
    covered: set = set()
    chosen: set = set()
    expected = []
    for rnd in range(_COV_K):
        best = min(
            ((doc, len(s - covered)) for doc, s in sets.items() if doc not in chosen),
            key=lambda kv: (-kv[1], kv[0]),
        )
        expected.append((rnd, best[0], best[1]))
        covered |= sets[best[0]]
        chosen.add(best[0])

    got = sorted(
        (r["pick_round"], r["doc_id"], r["gain"])
        for r in greedy_max_coverage(spark, SF_DIR).collect()
    )
    assert got == expected
    # greedy property: marginal gains are non-increasing
    gains = [g for _, _, g in expected]
    assert gains == sorted(gains, reverse=True)


def test_prefix_filter_theorem_on_random_corpora(spark):
    """Property-test the prefix-filter completeness theorem the
    operator's pruning rests on: for random small token-set corpora
    and tau = 3/5, every pair with Jaccard >= tau shares a token in
    BOTH prefixes under the rarest-first global order (with length
    L = n - ceil(tau*n) + 1), including after the length and
    positional filters."""
    import random
    from collections import Counter

    rng = random.Random(20260814)
    for trial in range(50):
        vocab = [f"t{i}" for i in range(rng.randint(4, 30))]
        docs = {}
        for d in range(rng.randint(2, 20)):
            k = rng.randint(1, min(12, len(vocab)))
            docs[d] = frozenset(rng.sample(vocab, k))
        # duplicate-ish pair to ensure high-jaccard cases occur
        if len(docs) >= 2:
            docs[max(docs) + 1] = docs[0]
        df = Counter(t for s in docs.values() for t in s)
        order = {t: (df[t], t) for t in df}
        pref = {}
        pos = {}
        for d, s in docs.items():
            toks = sorted(s, key=lambda t: order[t])
            n = len(toks)
            L = n - ((3 * n + 4) // 5) + 1
            pref[d] = toks[:L]
            pos[d] = {t: i for i, t in enumerate(toks[:L])}
        ids = sorted(docs)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                inter = len(docs[a] & docs[b])
                uni = len(docs[a] | docs[b])
                if 5 * inter < 3 * uni:
                    continue
                na, nb = len(docs[a]), len(docs[b])
                shared = [
                    t for t in pref[a] if t in pos[b]
                ]
                assert shared, (trial, a, b)
                # at least one shared prefix token survives the length
                # + positional filters the operator applies at the join
                assert 5 * na >= 3 * nb and 5 * nb >= 3 * na
                ok = any(
                    8 * (min(na - pos[a][t] - 1, nb - pos[b][t] - 1) + 1)
                    >= 3 * (na + nb)
                    for t in shared
                )
                assert ok, (trial, a, b)


def test_ohlc_bars_match_python_reference(spark):
    """Every bar's open/high/low/close must equal the Python replay
    over the hour's ticks ordered by (ts, event_id), in exact
    centi-units (decimal-cast rounding, no float arithmetic)."""
    from decimal import Decimal, ROUND_HALF_UP

    from etl_energy_tracker_spark.queries.timeops import ohlc_bars_hourly

    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    bars = defaultdict(list)
    for e in events:
        hour = e.ts.replace(minute=0, second=0, microsecond=0)
        vc = int(
            Decimal(repr(e.value)).quantize(
                Decimal("0.01"), rounding=ROUND_HALF_UP
            )
            * 100
        )
        bars[(e.event_type, hour)].append((e.ts, e.event_id, vc))
    expected = {}
    for key, ticks in bars.items():
        ticks.sort()
        vcs = [v for _, _, v in ticks]
        expected[key] = (vcs[0], max(vcs), min(vcs), vcs[-1], len(vcs))

    rows = ohlc_bars_hourly(spark, SF_DIR).collect()
    assert len(rows) == len(expected)
    for r in rows:
        o, h, lo, c, n = expected[(r.event_type, r.hour_ts)]
        assert (r.open_centi, r.high_centi, r.low_centi, r.close_centi, r.n_events) == (o, h, lo, c, n)
        assert r.low_centi <= r.open_centi <= r.high_centi
        assert r.low_centi <= r.close_centi <= r.high_centi


def test_checksum_diff_localizes_planted_drift(spark):
    """Buckets flagged out-of-sync must be exactly the buckets
    containing a drifted key (o_orderkey % 97 == 0), and bucket
    counts must partition the table."""
    from etl_energy_tracker_spark.queries.cdcops import (
        _CK_BUCKETS,
        _CK_DRIFT_MOD,
        table_checksum_diff,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    drift_buckets = {
        o.o_orderkey % _CK_BUCKETS
        for o in orders
        if o.o_orderkey % _CK_DRIFT_MOD == 0
    }
    bucket_sizes = Counter(o.o_orderkey % _CK_BUCKETS for o in orders)

    rows = table_checksum_diff(spark, SF_DIR).collect()
    assert sum(r.n_a for r in rows) == len(orders)
    for r in rows:
        assert r.n_a == r.n_b == bucket_sizes[r.bucket]
        assert r.in_sync == (0 if r.bucket in drift_buckets else 1)


def test_cusum_closed_form_equals_recursion(spark):
    """The operator's window closed form S_t = P_t - min(0,
    running_min(P)) must equal the literal CUSUM recursion
    S_t = max(0, S_{t-1} + d_t) replayed in Python, including the
    alarm count against the integer-MAD threshold."""
    from decimal import Decimal, ROUND_HALF_UP

    from etl_energy_tracker_spark.queries.timeops import (
        _CUSUM_H_MULT,
        cusum_changepoint,
    )

    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    hourly = defaultdict(lambda: defaultdict(int))
    for e in events:
        hour = e.ts.replace(minute=0, second=0, microsecond=0)
        vc = int(
            Decimal(repr(e.value)).quantize(
                Decimal("0.01"), rounding=ROUND_HALF_UP
            )
            * 100
        )
        hourly[e.event_type][hour] += vc
    expected = {}
    for et, series in hourly.items():
        xs = [series[h] for h in sorted(series)]
        mu = sum(xs) // len(xs)
        devs = [x - mu for x in xs]
        h_thr = _CUSUM_H_MULT * (sum(abs(d) for d in devs) // len(devs))
        S = maxc = alarms = 0
        for d in devs:
            S = max(0, S + d)
            maxc = max(maxc, S)
            alarms += S > h_thr
        expected[et] = (len(xs), mu, h_thr, maxc, alarms)

    rows = cusum_changepoint(spark, SF_DIR).collect()
    assert len(rows) == len(expected)
    for r in rows:
        assert (
            r.n_hours, r.mu_centi, r.h_thr, r.max_cusum, r.n_alarms
        ) == expected[r.event_type]


def test_ann_eval_consistent_with_its_inputs(spark):
    """Recall/MRR must be recomputable from the two input pipelines'
    own outputs: n_hits == |truth ∩ approx| per query, nn_rank is the
    approximate rank of the true top-1, and the ppm fields are exact
    integer divisions of those."""
    from etl_energy_tracker_spark.queries.vectorops import (
        _TOP_K,
        ann_cosine_topk,
        ann_ivf_topk,
        ann_recall_mrr_eval,
    )

    truth = defaultdict(list)
    for r in ann_cosine_topk(spark, SF_DIR).collect():
        truth[r.query_id].append((-r.cosine, r.vec_id))
    approx = defaultdict(list)
    for r in ann_ivf_topk(spark, SF_DIR).collect():
        approx[r.query_id].append((-r.cosine, r.vec_id))

    rows = ann_recall_mrr_eval(spark, SF_DIR).collect()
    assert {r.query_id for r in rows} == set(truth)
    for r in rows:
        t_ids = [v for _, v in sorted(truth[r.query_id])]
        a_ids = [v for _, v in sorted(approx.get(r.query_id, []))]
        assert r.n_hits == len(set(t_ids) & set(a_ids))
        assert r.recall_ppm == (1_000_000 * r.n_hits) // _TOP_K
        nn = t_ids[0]
        want_rank = a_ids.index(nn) + 1 if nn in a_ids else 0
        assert r.nn_rank == want_rank
        assert r.mrr_ppm == (1_000_000 // want_rank if want_rank else 0)


def test_stream_cusum_equals_python_recursion(spark):
    """The stateful stream must emit exactly the alarm set the literal
    per-type CUSUM recursion produces over the (ts, event_id)-ordered
    event stream, with identical S values."""
    from decimal import Decimal, ROUND_HALF_UP

    from etl_energy_tracker_spark.queries.streamops import (
        _CUSUM_STREAM_H,
        _CUSUM_STREAM_MU,
        stream_cusum_alarm,
    )

    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_type = defaultdict(list)
    for e in events:
        vc = int(
            Decimal(repr(e.value)).quantize(
                Decimal("0.01"), rounding=ROUND_HALF_UP
            )
            * 100
        )
        by_type[e.event_type].append((e.ts, e.event_id, vc))
    expected = {}
    for et, rows in by_type.items():
        s = 0
        for _, eid, vc in sorted(rows):
            s = max(0, s + (vc - _CUSUM_STREAM_MU))
            if s > _CUSUM_STREAM_H:
                expected[eid] = (et, s)

    got = {
        r.event_id: (r.event_type, r.cusum)
        for r in stream_cusum_alarm(spark, SF_DIR).collect()
    }
    assert got == expected
    assert expected, "threshold must actually fire on the fixture"
