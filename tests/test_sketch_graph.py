"""Invariant tests for sketchops.py and graphops.py."""

from __future__ import annotations

from collections import Counter, defaultdict

from etl_energy_tracker_spark.queries.graphops import (
    _ITER,
    _SCALE,
    _TELEPORT,
    pagerank_bipartite,
)
from etl_energy_tracker_spark.queries.sketchops import (
    _TOPN,
    cms_join_cardinality,
    cms_token_counts,
)

from conftest import SF_DIR


def test_cms_one_sided_overestimate(spark):
    rows = cms_token_counts(spark, SF_DIR).collect()
    assert len(rows) == _TOPN
    for r in rows:
        assert r.est_c >= r.exact_c, r  # the CMS guarantee
        assert r.overest == r.est_c - r.exact_c
    # the probe set must be the true top-N by exact count
    toks = Counter()
    for d in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect():
        toks.update(d.text.strip().split())
    expect = sorted(toks.items(), key=lambda kv: (-kv[1], kv[0]))[:_TOPN]
    got = {(r.tok, r.exact_c) for r in rows}
    assert got == set(expect)


def test_cms_join_cardinality_bounds(spark):
    r = cms_join_cardinality(spark, SF_DIR).collect()[0]
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n = li.join(od, li.l_orderkey == od.o_orderkey).count()
    assert r.exact_pairs == n
    assert r.est_pairs >= r.exact_pairs  # inner product over-counts only
    assert r.overest_ratio >= 1.0


def test_pagerank_matches_python_reference(spark):
    rows = {r.v: r.score for r in pagerank_bipartite(spark, SF_DIR).collect()}
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    cust_of = {o.o_orderkey: o.o_custkey for o in orders}
    pairs = {
        (cust_of[l.l_orderkey], l.l_suppkey)
        for l in lineitem
        if l.l_orderkey in cust_of
    }
    adj = defaultdict(list)
    for ck, sk in pairs:
        adj[f"c{ck}"].append(f"s{sk}")
        adj[f"s{sk}"].append(f"c{ck}")
    score = {v: _SCALE for v in adj}
    for _ in range(_ITER):
        nxt = {v: _TELEPORT for v in adj}
        for u, nbrs in adj.items():
            part = (score[u] * 85) // (100 * len(nbrs))
            for v in nbrs:
                nxt[v] += part
        score = nxt
    assert rows == score


def test_hll_estimate_quality_and_python_parity(spark):
    from etl_energy_tracker_spark.queries.sketchops import (
        _HLL_M,
        _HLL_W,
        hll_distinct_audit,
    )

    r = hll_distinct_audit(spark, SF_DIR).collect()[0]
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    keys = {o.o_orderkey for o in orders}
    assert r.exact_distinct == len(keys)
    # HLL standard error is 1.04/sqrt(m) ~ 6.5% at m=256; allow 4 sigma
    assert abs(r.rel_err) < 0.26
    # re-derive the registers in pure Python (portable charhash)
    MOD = 1_000_000_007

    def charhash(s, seed=7):
        h = seed
        for ch in s:
            h = (h * 31 + ord(ch)) % MOD
        return h

    regs = {}
    for k in keys:
        hv = charhash(str(k))
        b, w = hv % _HLL_M, hv // _HLL_M
        rho = _HLL_W + 1 if w == 0 else _HLL_W + 1 - w.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    s = (_HLL_M - len(regs)) * 1.0 + sum(2.0 ** -v for v in regs.values())
    raw = 0.7182725932495458 * _HLL_M * _HLL_M / s
    if raw <= 2.5 * _HLL_M and len(regs) < _HLL_M:
        import math

        raw = _HLL_M * math.log(_HLL_M * 1.0 / (_HLL_M - len(regs)))
    assert r.hll_est == round(raw, 4)


def test_hll_set_algebra_identities(spark):
    from etl_energy_tracker_spark.queries.sketchops import hll_set_union_intersect

    r = hll_set_union_intersect(spark, SF_DIR).collect()[0]
    # exact inclusion-exclusion must hold exactly
    assert r.exact_union == r.exact_a + r.exact_b - r.exact_intersect
    # merged-register union can never estimate below either side
    assert r.est_union >= max(r.est_a, r.est_b) - 1e-9
    # estimates land near exact (4-sigma of 1.04/sqrt(256))
    for est, exact in ((r.est_a, r.exact_a), (r.est_b, r.exact_b), (r.est_union, r.exact_union)):
        assert abs(est - exact) / exact < 0.3


def test_salted_join_equals_plain_join(spark):
    from pyspark.sql import functions as F

    from etl_energy_tracker_spark.queries.relational import salted_skew_join

    rows = {r.hot_key: r for r in salted_skew_join(spark, SF_DIR).collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    plain = {
        r.hot_key: r
        for r in ev.select((F.col("user_id") % 5).alias("hot_key"), "event_id")
        .groupBy("hot_key")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("event_id").alias("min_event"),
            F.max("event_id").alias("max_event"),
        )
        .collect()
    }
    assert set(rows) == set(plain)
    for k, r in rows.items():
        p = plain[k]
        assert (r.n_rows, r.min_event, r.max_event) == (
            p.n_rows,
            p.min_event,
            p.max_event,
        )
        assert r.label == f"grp_{k}"


def test_histogram_quantile_estimate_error_bounded(spark):
    """The histogram estimate must land within one bin width of the
    exact quantile — the sketch's construction guarantee."""
    from etl_energy_tracker_spark.queries.sketchops import (
        _HIST_BINS,
        histogram_quantile_estimate,
    )

    r = histogram_quantile_estimate(spark, SF_DIR).collect()[0]
    vals = [
        x["value"]
        for x in spark.read.parquet(f"{SF_DIR}/events.parquet").select("value").collect()
    ]
    bin_w = (max(vals) - min(vals)) / _HIST_BINS
    for p in (50, 90, 99):
        est, exact = r[f"p{p}_est"], r[f"p{p}_exact"]
        assert abs(est - exact) <= bin_w + 1e-9, (p, est, exact, bin_w)
    # estimates are ordered like the quantiles they approximate
    assert r["p50_est"] <= r["p90_est"] <= r["p99_est"]
