"""Invariant tests for the corpus-hygiene + layout operators
(queries/hygieneops.py). The driver oracle gate checks value equality;
these pin the semantic invariants each operator promises.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from etl_energy_tracker_spark.queries.hygieneops import (
    _DUP_FRAC,
    _K,
    _M_BITS,
    _QUOTA,
    _WIN,
    _ZBUCKETS,
    bloom_decontaminate,
    domain_quota_cap,
    dup_window_spans,
    ngram_lm_score,
    zorder_layout_stats,
)

from conftest import SF_DIR


def _tokens(text):
    return text.strip().split()


def test_lm_score_matches_python_reference(spark):
    # re-derive the add-one-smoothed bigram LM in pure Python and check
    # the per-doc micro-unit sums (exact integers, so == is safe)
    docs = {
        r.doc_id: _tokens(r.text)
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    c12, c1, vocab = Counter(), Counter(), set()
    for toks in docs.values():
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
    v = len(vocab)
    expect = {}
    for did, toks in docs.items():
        bis = list(zip(toks, toks[1:]))
        if not bis:
            continue
        s = 0
        for a, b in bis:
            lp = round(math.log((c12[(a, b)] + 1.0) / (c1[a] + v)), 6)
            s += int(round(lp * 1_000_000))
        expect[did] = (len(bis), s)
    rows = ngram_lm_score(spark, SF_DIR).collect()
    assert len(rows) == len(expect)
    for r in rows:
        n, s = expect[r.doc_id]
        assert (r.n_bigrams, r.sum_logp_micro) == (n, s)
        assert r.avg_logp_micro == s // n  # python // is floor-div too
        band = "high" if s // n >= -4500000 else ("mid" if s // n >= -6000000 else "low")
        assert r.band == band


def test_dup_window_spans_flags_known_duplicates(spark):
    # every window counted duplicated must genuinely appear in >= 2 docs
    docs = {
        r.doc_id: _tokens(r.text)
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    win_docs = defaultdict(set)
    n_win = Counter()
    for did, toks in docs.items():
        for i in range(len(toks) - _WIN + 1):
            win_docs[" ".join(toks[i : i + _WIN])].add(did)
            n_win[did] += 1
    expect_dup = Counter()
    for did, toks in docs.items():
        for i in range(len(toks) - _WIN + 1):
            if len(win_docs[" ".join(toks[i : i + _WIN])]) >= 2:
                expect_dup[did] += 1
    rows = dup_window_spans(spark, SF_DIR).collect()
    assert len(rows) == len(n_win)
    for r in rows:
        assert r.n_windows == n_win[r.doc_id]
        assert r.dup_windows == expect_dup[r.doc_id]
        assert r.drop_doc == int(r.dup_windows / r.n_windows >= _DUP_FRAC)


def test_bloom_no_false_negatives(spark):
    # Bloom membership can false-positive but NEVER false-negative:
    # exact_hits <= bloom_hits on every row, and every doc with an
    # exact benchmark overlap must be present in the flagged output
    rows = bloom_decontaminate(spark, SF_DIR).collect()
    flagged = {r.doc_id for r in rows}
    for r in rows:
        assert r.exact_hits <= r.bloom_hits
        assert r.false_pos == r.bloom_hits - r.exact_hits
        assert r.bloom_hits > 0

    docs = {
        r.doc_id: _tokens(r.text)
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    bench = set()
    for did, toks in docs.items():
        if did % 50 == 0:
            for i in range(len(toks) - 2):
                bench.add(" ".join(toks[i : i + 3]))
    for did, toks in docs.items():
        if did % 50 == 0:
            continue
        grams = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        n_exact = len(grams & bench)
        if n_exact:
            assert did in flagged, f"doc {did} has exact overlap but not flagged"


def test_domain_quota_cap_respects_quota(spark):
    rows = domain_quota_cap(spark, SF_DIR).collect()
    per_src = Counter(r.source for r in rows)
    total = Counter(
        r.source
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    )
    for src, kept in per_src.items():
        assert kept == min(_QUOTA, total[src])
        assert kept <= _QUOTA


def test_zorder_buckets_partition_the_table(spark):
    rows = zorder_layout_stats(spark, SF_DIR).collect()
    n_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert len(rows) == _ZBUCKETS
    assert sum(r.n_rows for r in rows) == n_orders
    # clustering quality: the mean per-bucket envelope must be far
    # narrower than the global range on BOTH dimensions (that's the
    # whole point of z-order vs a single-column sort), allowing a few
    # straddling buckets
    for lo, hi in (("min_cust", "max_cust"), ("min_day", "max_day")):
        gmin = min(getattr(r, lo) for r in rows)
        gmax = max(getattr(r, hi) for r in rows)
        spans = [getattr(r, hi) - getattr(r, lo) for r in rows]
        assert sum(spans) / len(spans) < 0.5 * (gmax - gmin), (lo, spans)
