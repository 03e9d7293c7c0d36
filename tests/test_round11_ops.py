"""Round-11 operator tests: the full k-truss peel (sum-support
reconciliation against an independent triangle enumeration, peel
invariants) plus the round's new operators. Each mirrors the operator
in plain Python / an independent Spark derivation over collected rows
(the catalog contract tests cover the DuckDB oracle at the driver
gate)."""

from __future__ import annotations

import pytest

import datetime

from conftest import SF_DIR


# ------------------------------------------ full k-truss peel


def test_ktruss_round0_matches_independent_enumeration(spark):
    """Round-0 stats reconcile against an independent lo<mid<hi
    triangle enumeration (a DIFFERENT algorithm from the op's
    degree-ordered edge iterator) on the same windowed graph — and
    n_triangles is the SUM(support) DIV 3 identity, so this pins the
    reconciliation end-to-end."""
    from pyspark.sql import functions as F

    from etl_energy_tracker_spark.queries.graphops import (
        _TRUSS_WINDOW,
        ktruss_decomposition,
    )
    from etl_energy_tracker_spark.sources.registry import load_table

    rows = {
        r.round: r for r in ktruss_decomposition(spark, SF_DIR).collect()
    }
    li = load_table(spark, "lineitem", SF_DIR).filter(
        (F.col("l_shipdate") >= F.lit(_TRUSS_WINDOW[0]).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_TRUSS_WINDOW[1]).cast("timestamp"))
    ).select("l_orderkey", "l_partkey")
    edges = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("lo"),
            F.col("b.l_partkey").alias("hi"),
        )
        .distinct()
    )
    edges.createOrReplaceTempView("tt_e0")
    n_edges = edges.count()
    n_tris = spark.sql(
        """
        SELECT COUNT(*) AS n FROM tt_e0 a
        JOIN tt_e0 b ON a.lo = b.lo AND a.hi < b.hi
        JOIN tt_e0 c ON c.lo = a.hi AND c.hi = b.hi
        """
    ).collect()[0].n
    assert rows[0].edges_in == n_edges
    assert rows[0].n_triangles == n_tris


def test_ktruss_peel_invariants(spark):
    """Each round's survivors are the next round's input; the edge
    set is monotonically non-increasing; triangles never grow."""
    from etl_energy_tracker_spark.queries.graphops import (
        _TRUSS_ROUNDS,
        ktruss_decomposition,
    )

    rows = sorted(
        ktruss_decomposition(spark, SF_DIR).collect(),
        key=lambda r: r.round,
    )
    assert len(rows) == _TRUSS_ROUNDS
    for prev, cur in zip(rows, rows[1:]):
        assert cur.edges_in == prev.edges_kept
        assert cur.edges_in <= prev.edges_in
        assert cur.n_triangles <= prev.n_triangles
    for r in rows:
        assert 0 <= r.edges_kept <= r.edges_in


# --------------------------------- expansion-CWS weighted-LSH sketch


def test_icws_sketch_verified_subset_of_exact(spark):
    """Verified candidates use the exact op's own df-capped formula
    and threshold, so ver is a SUBSET of the exact pair set: precision
    is identically 1.0 whenever anything verifies, n_common equals
    n_verified, and recall is bounded by 1."""
    from etl_energy_tracker_spark.queries.textops import (
        icws_weighted_lsh_pairs,
    )

    row = icws_weighted_lsh_pairs(spark, SF_DIR).collect()[0]
    assert row.n_common == row.n_verified
    assert row.n_verified <= row.n_candidates
    assert row.n_verified <= row.n_exact
    if row.n_verified > 0:
        assert row.precision == 1.0
    if row.n_exact > 0:
        assert 0.0 <= row.recall <= 1.0


def test_icws_expansion_signature_identity(spark):
    """The expansion-sampler determinism the sketch rests on, checked
    via a pure-Python replay of the exact same int64 arithmetic:
    identical tf multisets yield IDENTICAL k=16 signatures (so true
    duplicates always collide on every band), and the per-position
    value is min over (gram, copy) elements of the permuted hash —
    i.e., plain MinHash over the expanded multiset."""
    from etl_energy_tracker_spark.functions.hashing import MOD
    from etl_energy_tracker_spark.queries.textops import _CWS_K, _CWS_MOD

    assert _CWS_MOD == MOD

    def charhash(s: str, seed: int = 7) -> int:
        acc = seed
        for ch in s:
            acc = (acc * 31 + ord(ch)) % MOD
        return acc

    def signature(multiset: dict[str, int]) -> list[int]:
        elems = [
            (charhash(g) * 31 + k) % MOD
            for g, c in multiset.items()
            for k in range(1, c + 1)
        ]
        return [
            min(((2 * p + 1) * e + (p + 1) * 7919) % MOD for e in elems)
            for p in range(_CWS_K)
        ]

    m1 = {"a b c": 2, "b c a": 1, "c a b": 1}
    m2 = dict(m1)
    assert signature(m1) == signature(m2)
    # changing ONE count changes the element set, and the signature
    # of the superset is elementwise <= (extra elements can only
    # lower a min) — the monotonicity plain MinHash has over sets
    m3 = {"a b c": 3, "b c a": 1, "c a b": 1}
    s1, s3 = signature(m1), signature(m3)
    assert all(v3 <= v1 for v1, v3 in zip(s1, s3))
    # and the Spark-side expression computes the same signature for
    # the same multiset (one row, all 16 positions)
    from pyspark.sql import Row

    tf = spark.createDataFrame(
        [Row(doc_id=1, g=g, c=c) for g, c in m1.items()]
    )
    from etl_energy_tracker_spark.functions.hashing import spark_charhash
    from pyspark.sql import functions as F

    hashed = tf.withColumn("hg", F.expr(spark_charhash("g")))
    partial_cols = [
        F.expr(
            f"array_min(transform(sequence(1, c), k -> "
            f"({2 * p + 1}L * ((hg * 31L + k) % {MOD}L) "
            f"+ {(p + 1) * 7919}L) % {MOD}L))"
        ).alias(f"p{p}")
        for p in range(_CWS_K)
    ]
    got = (
        hashed.select("doc_id", *partial_cols)
        .groupBy("doc_id")
        .agg(*[F.min(f"p{p}").alias(f"p{p}") for p in range(_CWS_K)])
        .collect()[0]
    )
    assert [got[f"p{p}"] for p in range(_CWS_K)] == signature(m1)


# -------------------------- exact cross-doc LRS / bracket reconciliation


@pytest.mark.slow
def test_lrs_closes_dup_substring_bracket(spark):
    """The doubling-bracket claim, closed end-to-end: if L is the
    largest ladder level where dup_substring_maxlen found a cross-doc
    duplicate, the exact cross-doc LRS lies in [L, 2L) — capped at
    the 511-char truncation, which equals the top bracket's maximum
    measurable value by construction."""
    from etl_energy_tracker_spark.queries.llmprep import (
        _LRS_TRUNC,
        dup_substring_maxlen,
        lrs_cross_doc_exact,
    )

    ladder = {
        r.level: r.n_dup_substrings
        for r in dup_substring_maxlen(spark, SF_DIR).collect()
    }
    lrs = lrs_cross_doc_exact(spark, SF_DIR).collect()[0].lrs_len
    dup_levels = [lvl for lvl, n in ladder.items() if n > 0]
    if dup_levels:
        top = max(dup_levels)
        assert top <= lrs <= min(2 * top - 1, _LRS_TRUNC)
    else:
        assert lrs < 16
    # and every ladder level at or below the LRS must have found dups
    # (a repeat of length >= L contains duplicated L-grams)
    for lvl, n in ladder.items():
        if lvl <= lrs:
            assert n > 0, f"level {lvl} should see the LRS's grams"


@pytest.mark.slow
def test_lrs_staged_pass_matches_single_window(spark, monkeypatch):
    """The VERDICT r11 task-2 staged pass is result-identical to the
    single-window plan: forcing a tiny stage budget makes the op run
    B > 1 prefix-hash stages and fold their maxima driver-side, and
    the full row (lrs_len, n_suffixes, n_crossdoc_buckets) must equal
    the lazy B=1 result byte-for-byte."""
    from etl_energy_tracker_spark.queries import llmprep

    single = llmprep.lrs_cross_doc_exact(spark, SF_DIR).collect()[0]
    # sf0.001 suffix-char volume is ~4e6 — a 1e6 budget forces B >= 4
    monkeypatch.setattr(llmprep, "_LRS_STAGE_CHAR_BUDGET", 1_000_000)
    staged = llmprep.lrs_cross_doc_exact(spark, SF_DIR).collect()[0]
    assert staged.asDict() == single.asDict()
    assert single.lrs_len >= 16  # the corpus does carry cross-doc repeats


# ------------------------------------------ bloom filter audit


def test_bloom_no_false_negatives(spark):
    """Every true member is flagged (a Bloom filter can only err
    toward false positives), and the audit's counters reconcile:
    flagged = members + false positives."""
    from etl_energy_tracker_spark.queries.sketchops import (
        bloom_prune_audit,
    )

    row = bloom_prune_audit(spark, SF_DIR).collect()[0]
    assert row.n_flagged == row.n_member + row.n_fp
    assert 0 < row.n_set_bits <= row.m_bits
    assert row.n_member <= row.n_probe
    # with m >> k*n the measured FP rate stays moderate; the audit's
    # value is the measurement, but a saturated filter (all probes
    # flagged) would mean the arithmetic is broken
    assert row.n_flagged < row.n_probe or row.n_member == row.n_probe


# ------------------------------------------ bigram LM perplexity


def test_lm_perplexity_python_replay(spark):
    """Exact replay of the add-1 bigram LM in plain Python over the
    collected corpus: same split, same counts, same integer micro-nat
    ln (via the portable series' defining identity checked through
    the collected Spark outputs)."""
    import math

    from etl_energy_tracker_spark.queries.llmprep import (
        lm_bigram_perplexity,
    )
    from etl_energy_tracker_spark.sources.registry import load_table

    got = {
        r.source: r for r in lm_bigram_perplexity(spark, SF_DIR).collect()
    }
    docs = load_table(spark, "documents", SF_DIR).select(
        "doc_id", "source", "text"
    ).collect()
    from collections import Counter, defaultdict

    tb: Counter = Counter()
    for r in docs:
        if r.doc_id % 5 == 0:
            continue
        t = r.text.strip().split()
        for a, b in zip(t, t[1:]):
            tb[(a, b)] += 1
    tu: Counter = Counter()
    for (a, _), c in tb.items():
        tu[a] += c
    v = len(tu)
    sums = defaultdict(lambda: [0, set(), 0])
    for r in docs:
        if r.doc_id % 5 != 0:
            continue
        t = r.text.strip().split()
        for a, b in zip(t, t[1:]):
            num = tu.get(a, 0) + v
            den = tb.get((a, b), 0) + 1
            # micro-nat via double ln is within 1 micro of the
            # portable series; compare SUM with a tolerance scaled to
            # the bigram count instead of exact equality
            s = sums[r.source]
            s[0] += math.floor(math.log(num / den) * 1e6 + 0.5)
            s[1].add(r.doc_id)
            s[2] += 1
    for src, (tot, ds, nb) in sums.items():
        row = got[src]
        assert row.n_eval_docs == len(ds)
        assert row.n_eval_bigrams == nb
        assert abs(row.sum_nll_micro - tot) <= nb  # <= 1 micro-nat per term


# ------------------------------------------ MLM masking plan


def test_mlm_masking_plan_python_replay(spark):
    """Exact replay of the deterministic plan: same hash, same
    digits, same per-source counts; the 80/10/10 split partitions the
    selected set exactly."""
    from etl_energy_tracker_spark.queries.prepops import (
        mlm_masking_plan,
    )
    from etl_energy_tracker_spark.sources.registry import load_table

    MOD = 1_000_000_007

    def charhash(s: str, seed: int = 7) -> int:
        acc = seed
        for ch in s:
            acc = (acc * 31 + ord(ch)) % MOD
        return acc

    got = {r.source: r for r in mlm_masking_plan(spark, SF_DIR).collect()}
    docs = load_table(spark, "documents", SF_DIR).select(
        "doc_id", "source", "text"
    ).collect()
    from collections import defaultdict

    exp = defaultdict(lambda: [0, 0, 0, 0, 0])
    for r in docs:
        toks = r.text.strip().split()
        for i in range(1, len(toks) + 1):
            h = charhash(f"{r.doc_id}:{i}")
            e = exp[r.source]
            e[0] += 1
            if h % 100 < 15:
                e[1] += 1
                a = (h // 100) % 100
                if a < 80:
                    e[2] += 1
                elif a < 90:
                    e[3] += 1
                else:
                    e[4] += 1
    for src, (nt, ns, nm, nr, nk) in exp.items():
        row = got[src]
        assert (
            row.n_tokens,
            row.n_selected,
            row.n_mask,
            row.n_random,
            row.n_keep,
        ) == (nt, ns, nm, nr, nk)
        assert row.n_selected == row.n_mask + row.n_random + row.n_keep


# ------------------------------------------ Hill tail index


def test_hill_tail_index_python_replay(spark):
    """Replay: same top-(k+1) count multiset, same integer micro-nat
    sum within 1 micro per term (double-ln replay vs the portable
    series)."""
    import math
    from collections import Counter

    from etl_energy_tracker_spark.queries.textops import hill_tail_index
    from etl_energy_tracker_spark.sources.registry import load_table

    row = hill_tail_index(spark, SF_DIR).collect()[0]
    docs = load_table(spark, "documents", SF_DIR).select("text").collect()
    tf = Counter()
    for r in docs:
        tf.update(r.text.strip().split())
    counts = sorted(tf.values(), reverse=True)[:101]
    k = len(counts) - 1
    floor = counts[k]
    s = sum(
        math.floor(math.log(c / floor) * 1e6 + 0.5) for c in counts[:k]
    )
    assert row.k == k
    assert row.c_floor == floor
    assert abs(row.sum_lr_micro - s) <= k
    assert row.gamma_micro == row.sum_lr_micro // k


# ------------------------------------------ label propagation CC


def test_label_propagation_invariants(spark):
    """Min-label propagation is monotone: the distinct-label count
    never increases across rounds, and a round with zero changes
    fixes every later round (n_changed stays 0)."""
    from etl_energy_tracker_spark.queries.graphops import (
        _LP_ROUNDS,
        label_propagation_cc,
    )

    rows = sorted(
        label_propagation_cc(spark, SF_DIR).collect(),
        key=lambda r: r.round,
    )
    assert len(rows) == _LP_ROUNDS
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_labels <= prev.n_labels
        if prev.n_changed == 0:
            assert cur.n_changed == 0
    assert all(r.n_labels >= 1 for r in rows)


# ------------------------------------------ CEM matching ATT


def test_cem_matching_python_replay(spark):
    """Exact integer replay of the CEM pipeline over collected events
    (same midpoint split, bins, truncating milli divisions)."""
    from collections import defaultdict

    from etl_energy_tracker_spark.queries.statops import cem_matching_att
    from etl_energy_tracker_spark.sources.registry import load_table

    got = {r.event_type: r for r in cem_matching_att(spark, SF_DIR).collect()}
    ev = load_table(spark, "events", SF_DIR).select(
        "event_type", "user_id", "ts", "value"
    ).collect()
    import math

    us = [
        int(r.ts.replace(tzinfo=datetime.timezone.utc).timestamp()
            * 1_000_000)
        for r in ev
    ]  # tz-pinned replay: naive .timestamp() applies the host zone
    split = min(us) + (max(us) - min(us)) // 2
    per_user = defaultdict(lambda: [0, 0])  # (pre_cnt, y)
    for r, u in zip(ev, us):
        k = (r.event_type, r.user_id)
        if u < split:
            per_user[k][0] += 1
        else:
            per_user[k][1] += math.floor(r.value * 100)
    strata = defaultdict(lambda: [0, 0, 0, 0])  # t_cnt c_cnt t_sum c_sum
    for (et, uid), (pre, y) in per_user.items():
        s = strata[(et, min(pre, 10))]
        if uid % 2 == 1:
            s[0] += 1
            s[2] += y
        else:
            s[1] += 1
            s[3] += y

    def trunc_div(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q

    per_type = defaultdict(lambda: [0, 0, 0, 0, 0])
    for (et, _), (tc, cc, ts_, cs) in strata.items():
        p = per_type[et]
        p[0] += 1
        if tc >= 1 and cc >= 1:
            diff = trunc_div(ts_ * 1000, tc) - trunc_div(cs * 1000, cc)
            p[1] += 1
            p[2] += tc
            p[3] += cc
            p[4] += tc * diff
    for et, (nst, nsm, ntm, ncm, wsum) in per_type.items():
        row = got[et]
        assert row.n_strata_total == nst
        assert row.n_strata_matched == nsm
        assert row.n_treated_matched == ntm
        assert row.n_control_matched == ncm
        if ntm:
            assert row.att_milli == trunc_div(wsum, ntm)


# ------------------------------------------ QTE at the median


def test_qte_median_python_replay(spark):
    """Exact replay: lower median by (y, user_id) per (type, arm)."""
    from collections import defaultdict

    from etl_energy_tracker_spark.queries.statops import qte_median
    from etl_energy_tracker_spark.sources.registry import load_table

    import math

    got = {r.event_type: r for r in qte_median(spark, SF_DIR).collect()}
    ev = load_table(spark, "events", SF_DIR).select(
        "event_type", "user_id", "ts", "value"
    ).collect()
    us = [
        int(r.ts.replace(tzinfo=datetime.timezone.utc).timestamp()
            * 1_000_000)
        for r in ev
    ]  # tz-pinned replay: naive .timestamp() applies the host zone
    split = min(us) + (max(us) - min(us)) // 2
    y = defaultdict(int)
    for r, u in zip(ev, us):
        if u >= split:
            y[(r.event_type, r.user_id)] += math.floor(r.value * 100)
        else:
            y.setdefault((r.event_type, r.user_id), 0)
    arms = defaultdict(list)
    for (et, uid), v in y.items():
        arms[(et, uid % 2)].append((v, uid))
    for et, row in got.items():
        for arm, med_col, n_col in (
            (1, "t_median_cents", "n_treated"),
            (0, "c_median_cents", "n_control"),
        ):
            vals = sorted(arms[(et, arm)])
            assert getattr(row, n_col) == len(vals)
            assert getattr(row, med_col) == vals[(len(vals) + 1) // 2 - 1][0]
        assert row.qte_cents == row.t_median_cents - row.c_median_cents


# ------------------------------------------ off-policy IPS/SNIPS


def test_ips_snips_python_replay(spark):
    """Exact replay: same portable-hash target policy, same integer
    estimator arithmetic; IPS relates to SNIPS exactly through
    K * n_matched / n_logged in the uniform-logging model."""
    from collections import defaultdict

    from etl_energy_tracker_spark.queries.evalops import (
        offpolicy_ips_snips,
    )
    from etl_energy_tracker_spark.sources.registry import load_table

    MOD = 1_000_000_007

    def charhash(s: str, seed: int = 7) -> int:
        acc = seed
        for ch in s:
            acc = (acc * 31 + ord(ch)) % MOD
        return acc

    import math

    row = offpolicy_ips_snips(spark, SF_DIR).collect()[0]
    ev = load_table(spark, "events", SF_DIR).select(
        "user_id", "event_type", "value"
    ).collect()
    actions = sorted({r.event_type for r in ev})
    users = {r.user_id for r in ev}
    # tie-break in the op is (hv DESC, event_type ASC); replicate:
    pi = {}
    for u in users:
        best = sorted(
            actions, key=lambda a: (-charhash(f"{u}|{a}"), a)
        )[0]
        pi[u] = best
    msum = n_match = 0
    for r in ev:
        if r.event_type == pi[r.user_id]:
            n_match += 1
            msum += math.floor(r.value * 100)
    k = len(actions)
    assert row.k_actions == k
    assert row.n_matched == n_match
    assert row.ips_milli_cents == (k * msum * 1000) // len(ev)
    assert row.snips_milli_cents == (msum * 1000) // n_match


# ------------------------------------------ EB rate shrinkage


def test_eb_shrinkage_pulls_toward_prior(spark):
    """Shrinkage invariants: every shrunk rate lies between its raw
    rate and the prior mean (within 1 ppm of truncation), and
    higher-n items move less (relative shrink weight n/(n+s))."""
    from etl_energy_tracker_spark.queries.statops import (
        eb_rate_shrinkage,
    )

    rows = eb_rate_shrinkage(spark, SF_DIR).collect()
    assert rows
    s = rows[0].prior_strength
    m = rows[0].prior_mean_ppm
    if s is None or s <= 0:
        assert all(r.shrunk_ppm is None for r in rows)
        return
    for r in rows:
        lo, hi = sorted((r.raw_ppm, m))
        assert lo - 1 <= r.shrunk_ppm <= hi + 1, (r.item, r.raw_ppm, m, r.shrunk_ppm)
        # exact formula replay
        assert r.shrunk_ppm == (r.x * 1_000_000 + s * m) // (r.n + s)


# ------------------------------------------ bigram entropy rate


def test_bigram_entropy_python_replay(spark):
    """Replay per source with double ln within 1 micro-nat per term;
    entropy is bounded by ln(vocab) and non-negative."""
    import math
    from collections import Counter, defaultdict

    from etl_energy_tracker_spark.queries.llmprep import (
        bigram_entropy_rate,
    )
    from etl_energy_tracker_spark.sources.registry import load_table

    got = {
        r.source: r for r in bigram_entropy_rate(spark, SF_DIR).collect()
    }
    docs = load_table(spark, "documents", SF_DIR).select(
        "source", "text"
    ).collect()
    c12 = defaultdict(Counter)
    for r in docs:
        t = r.text.strip().split()
        for a, b in zip(t, t[1:]):
            c12[r.source][(a, b)] += 1
    for src, cc in c12.items():
        c1 = Counter()
        for (a, _), n in cc.items():
            c1[a] += n
        tot = sum(cc.values())
        s = sum(
            n * math.floor(math.log(c1[a] / n) * 1e6 + 0.5)
            for (a, _), n in cc.items()
        )
        row = got[src]
        assert row.n_bigrams == tot
        assert row.n_distinct_bigrams == len(cc)
        assert abs(row.sum_h_micro - s) <= len(cc)
        assert row.entropy_micro_nats >= 0


# ------------------------------------------ quantile normalization


def test_quantile_norm_map_exact_ranks(spark):
    """Each per-type cut is the exact ceil(d*n/10)-th order statistic
    and each pooled cut is the exact pooled order statistic."""
    from collections import defaultdict

    from etl_energy_tracker_spark.queries.statops import (
        quantile_norm_map,
    )
    from etl_energy_tracker_spark.sources.registry import load_table

    import math

    rows = quantile_norm_map(spark, SF_DIR).collect()
    ev = load_table(spark, "events", SF_DIR).select(
        "event_type", "event_id", "value"
    ).collect()
    by_type = defaultdict(list)
    pooled = []
    for r in ev:
        c = math.floor(r.value * 100)
        by_type[r.event_type].append((c, r.event_id))
        pooled.append(c)
    pooled.sort()
    n_pool = len(pooled)
    for r in rows:
        vals = sorted(by_type[r.event_type])
        n = len(vals)
        rk = (r.decile * n + 9) // 10
        assert r.cut_cents == vals[rk - 1][0]
        prk = (r.decile * n_pool + 9) // 10
        assert r.pooled_cut_cents == pooled[prk - 1]
        assert r.shift_cents == r.pooled_cut_cents - r.cut_cents


# ------------------------------------------ degree assortativity


def test_assortativity_python_replay(spark):
    """Exact integer replay of Newman's formula over the collected
    window graph; r in [-1, 1] scaled ppm."""
    from collections import Counter, defaultdict

    from etl_energy_tracker_spark.queries.graphops import (
        _TRUSS_WINDOW,
        degree_assortativity,
    )
    from etl_energy_tracker_spark.sources.registry import load_table

    import datetime as dt

    row = degree_assortativity(spark, SF_DIR).collect()[0]
    li = load_table(spark, "lineitem", SF_DIR).select(
        "l_orderkey", "l_partkey", "l_shipdate"
    ).collect()
    lo_d = dt.datetime.fromisoformat(_TRUSS_WINDOW[0])
    hi_d = dt.datetime.fromisoformat(_TRUSS_WINDOW[1])
    baskets = defaultdict(set)
    for r in li:
        if lo_d <= r.l_shipdate < hi_d:
            baskets[r.l_orderkey].add(r.l_partkey)
    edges = set()
    for parts in baskets.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                edges.add((a, b))
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    m = len(edges)
    s_jk = sum(deg[a] * deg[b] for a, b in edges)
    s_sum = sum(deg[a] + deg[b] for a, b in edges)
    s_sq = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in edges)
    assert (row.m_edges, row.s_jk, row.s_sum, row.s_sq) == (
        m, s_jk, s_sum, s_sq,
    )
    den = 2 * m * s_sq - s_sum * s_sum
    if den:
        num = (4 * m * s_jk - s_sum * s_sum) * 1_000_000

        def trunc_div(a: int, b: int) -> int:
            q = abs(a) // abs(b)
            return q if (a >= 0) == (b > 0) else -q

        assert row.assortativity_ppm == trunc_div(num, den)
        assert -1_000_000 <= row.assortativity_ppm <= 1_000_000


# ------------------------------------------ successive halving


@pytest.mark.slow
def test_successive_halving_invariants(spark):
    """Field halves each rung (ceil(n/2)); survivors chain (next
    rung's n_in == this rung's n_kept); min kept revenue is
    monotonically non-decreasing in the rung (more evidence can only
    raise the cumulative cut for survivors of a shrinking field)."""
    from etl_energy_tracker_spark.queries.mlops import (
        _SH_RUNGS,
        successive_halving_suppliers,
    )

    rows = sorted(
        successive_halving_suppliers(spark, SF_DIR).collect(),
        key=lambda r: r.rung,
    )
    assert len(rows) == _SH_RUNGS
    for r in rows:
        assert r.n_kept == (r.n_in + 1) // 2
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_in == prev.n_kept
        assert cur.min_kept_cents >= prev.min_kept_cents
