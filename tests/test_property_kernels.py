"""Property tests (hypothesis) for the round-4 portable kernels:
z-order interleave, the portable floor-division rewrite, the HLL rho
CASE-ladder, and bloom position parity — each checked three ways
(Python reference / Spark SQL expression / DuckDB SQL expression) so
the cross-engine determinism claims rest on generated evidence, not
just the driver's fixed datasets."""

from __future__ import annotations

import pytest

import duckdb
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from etl_energy_tracker_spark.queries.hygieneops import (
    _bloom_pos_duck,
    _bloom_pos_spark,
    _floor_div,
    _K,
    _z_duck,
    _z_spark,
)
from etl_energy_tracker_spark.queries.sketchops import _HLL_W, _rho_case


def _z_py(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 255), st.integers(0, 255)), min_size=1, max_size=50))
def test_zorder_interleave_three_way(spark, pairs):
    expect = [_z_py(x, y) for x, y in pairs]
    sdf = spark.createDataFrame(pairs, "x long, y long")
    got_spark = [
        r.z for r in sdf.select(F.expr(_z_spark("x", "y")).alias("z")).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    got_duck = [r[0] for r in con.execute(f"SELECT {_z_duck('x', 'y')} FROM t").fetchall()]
    assert got_spark == expect
    assert got_duck == expect
    # injectivity on the 8+8-bit grid: distinct (x, y) -> distinct z
    assert len(set(expect)) == len(set(pairs))


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(-(10**12), 10**12), st.integers(1, 10**6)
        ),
        min_size=1,
        max_size=60,
    )
)
def test_portable_floor_div_three_way(spark, cases):
    expect = [m // n for m, n in cases]
    sdf = spark.createDataFrame(cases, "m long, n long")
    got_spark = [
        r.q
        for r in sdf.select(F.expr(_floor_div("m", "n", "div")).alias("q")).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (m BIGINT, n BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", cases)
    got_duck = [
        r[0] for r in con.execute(f"SELECT {_floor_div('m', 'n', '//')} FROM t").fetchall()
    ]
    assert got_spark == expect
    assert got_duck == expect


@settings(max_examples=6, deadline=None)
@given(st.lists(st.integers(0, (1 << _HLL_W) - 1), min_size=1, max_size=60))
def test_hll_rho_ladder_three_way(spark, words):
    expect = [
        _HLL_W + 1 if w == 0 else _HLL_W + 1 - w.bit_length() for w in words
    ]
    sdf = spark.createDataFrame([(w,) for w in words], "w long")
    got_spark = [r.r for r in sdf.select(F.expr(_rho_case("w")).alias("r")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (w BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(w,) for w in words])
    got_duck = [r[0] for r in con.execute(f"SELECT {_rho_case('w')} FROM t").fetchall()]
    assert got_spark == expect
    assert got_duck == expect


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FFF),
            min_size=0,
            max_size=24,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_bloom_positions_spark_duck_parity(spark, grams):
    sdf = spark.createDataFrame([(g,) for g in grams], "g string")
    cols = [F.expr(_bloom_pos_spark(i)).alias(f"p{i}") for i in range(_K)]
    got_spark = [tuple(r) for r in sdf.select(*cols).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(g,) for g in grams])
    exprs = ", ".join(_bloom_pos_duck(i) for i in range(_K))
    got_duck = [tuple(r) for r in con.execute(f"SELECT {exprs} FROM t").fetchall()]
    assert got_spark == got_duck
    for row in got_spark:
        assert all(0 <= p < 131072 for p in row)


# ------------------------------------ URL canonicalization (webprep)

_URL_CHARS = st.text(
    alphabet="abcdefghij05/?&=._-", min_size=0, max_size=30
)


@settings(max_examples=20, deadline=None)
@given(_URL_CHARS, st.booleans(), st.booleans())
def test_url_canonicalization_idempotent_and_scheme_free(path, www, track):
    """canon(canon(u)) == canon(u) for arbitrary messy URLs, and the
    canonical form never keeps scheme/www/tracking params/trailing
    slash. Mirrors webprep._CANON_STEPS in Python (the same mirror the
    fixture test uses against Spark)."""
    import re

    from etl_energy_tracker_spark.queries.webprep import _CANON_STEPS

    def canon(u):
        u = u.lower()
        for pat, rep in _CANON_STEPS:
            u = re.sub(pat, rep, u)
        return u

    url = ("https://" + ("www." if www else "")) + "host.example/" + path
    if track:
        url += "?utm_source=x&ref=y"
    c = canon(url)
    assert canon(c) == c
    assert not c.startswith(("http://", "https://", "www."))
    assert "utm_source=" not in c and not c.endswith("/") or c == ""


# ---------------------------------------------- BPE merge fold (llmprep)

_SYMS = st.lists(st.sampled_from(["a", "b", "c", "ab", "bc"]), min_size=0, max_size=12)


@settings(max_examples=10, deadline=None)
@given(_SYMS, st.sampled_from([("a", "b"), ("b", "b"), ("a", "a"), ("ab", "c")]))
def test_bpe_merge_fold_matches_python_greedy(spark, syms, pair):
    """The SQL aggregate() fold used by bpe_train_merges must equal the
    greedy left-to-right non-overlapping merge for arbitrary symbol
    sequences, including self-pairs like (a, a) on runs of 'a'."""
    from pyspark.sql import functions as F

    p1, p2 = pair
    expect = []
    for x in syms:
        if expect and expect[-1] == p1 and x == p2:
            expect[-1] = p1 + p2
        else:
            expect.append(x)

    sdf = spark.createDataFrame([(syms,)], "s array<string>")
    merged = sdf.select(
        F.expr(
            f"aggregate(s, CAST(array() AS array<string>), (acc, x) -> "
            f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{p1}' AND x = '{p2}' "
            f"THEN concat(slice(acc, 1, size(acc) - 1), array('{p1}{p2}')) "
            f"ELSE concat(acc, array(x)) END)"
        ).alias("m")
    ).collect()[0]["m"]
    assert merged == expect


# ------------------------- ExactSubstr trim vs generated-corpus replay

_trim_corpus = st.lists(
    st.lists(st.sampled_from("ab"), min_size=8, max_size=20),
    min_size=2,
    max_size=12,
)


@settings(max_examples=4, deadline=None)
@given(_trim_corpus)
@pytest.mark.slow
def test_exact_substring_trim_generated(spark, tok_lists):
    """A tiny two-letter alphabet forces duplicated windows, intra-doc
    repeats, and OVERLAPPING removal spans — the arbitration edge cases
    the fixed corpus may not exercise. Spark result must equal a direct
    Python replay of the spec on every generated corpus."""
    import tempfile

    from etl_energy_tracker_spark.queries.hygieneops import (
        exact_substring_trim,
    )

    docs = [
        (i, " ".join(toks), "en", "src0", len(" ".join(toks)))
        for i, toks in enumerate(tok_lists)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {r.doc_id: r for r in exact_substring_trim(spark, d).collect()}

    # Python replay of the spec
    occ = []
    for i, toks in enumerate(tok_lists):
        for p in range(len(toks) - 7):
            occ.append((i, p + 1, tuple(toks[p : p + 8])))
    from collections import defaultdict

    cnt = defaultdict(int)
    first = {}
    for d_, p_, w in occ:
        cnt[w] += 1
        k = d_ * 1_000_000_000 + p_
        if w not in first or k < first[w]:
            first[w] = k
    rem_pos = defaultdict(set)
    rem_win = defaultdict(int)
    for d_, p_, w in occ:
        if cnt[w] >= 2 and d_ * 1_000_000_000 + p_ != first[w]:
            rem_win[d_] += 1
            rem_pos[d_].update(range(p_, p_ + 8))
    assert set(got) == set(range(len(tok_lists)))
    for i, toks in enumerate(tok_lists):
        r = got[i]
        n, rem = len(toks), len(rem_pos[i])
        assert (r.n_tokens, r.removed_tokens, r.kept_tokens) == (n, rem, n - rem)
        assert r.removed_windows == rem_win[i]
        assert r.kept_ppm == (n - rem) * 1_000_000 // n


# ------------------------- two-pass exact median vs generated multisets

_tpm_groups = st.lists(
    st.lists(
        st.integers(min_value=1, max_value=400),  # cents: spans ~3 bins
        min_size=1,
        max_size=40,
    ),
    min_size=1,
    max_size=3,
)


@settings(max_examples=4, deadline=None)
@given(_tpm_groups)
@pytest.mark.slow
def test_twopass_median_generated(spark, groups):
    """Generated multisets hit the refinement edge cases the fixed
    corpus may not: median exactly on a 128-cent bin boundary, all
    values equal (one hot bin), n=1 groups, even/odd n ties. The
    two-pass result must equal the direct sorted lower median."""
    import tempfile
    from datetime import datetime, timedelta

    from etl_energy_tracker_spark.queries.sketchops import (
        _TPM_BIN,
        twopass_exact_median,
    )

    rows = []
    eid = 0
    for g, cents_list in enumerate(groups):
        for c in cents_list:
            rows.append(
                (
                    eid,
                    datetime(2024, 1, 1) + timedelta(seconds=eid),
                    eid % 7,
                    f"t{g}",
                    c / 100.0,
                    "{}",
                )
            )
            eid += 1
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {
            r.event_type: r
            for r in twopass_exact_median(spark, d).collect()
        }
    for g, cents_list in enumerate(groups):
        s = sorted(cents_list)
        n = len(s)
        med = s[(n + 1) // 2 - 1]
        r = got[f"t{g}"]
        assert (r.n_rows, r.median_cents) == (n, med)
        assert r.median_bin == med // _TPM_BIN
        assert r.bin_rows == sum(
            1 for x in s if x // _TPM_BIN == med // _TPM_BIN
        )


# ------------------------------- best-of-n order-statistic identity


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=-1000, max_value=1000),
             min_size=8, max_size=16),
    st.sampled_from([2, 4, 8]),
)
def test_best_of_n_identity_generated(vals, nn):
    """The exact combinatorial identity behind best_of_n_curve:
    E[max of n draws without replacement] computed by brute-force
    subset enumeration equals the order-statistic weighted sum
    sum_i s_(i) * C(i-1, n-1)/C(N, n) — as exact fractions, for any
    multiset including duplicates and negatives."""
    from fractions import Fraction
    from itertools import combinations
    from math import comb

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


# ------------------------------- PAV minimax identity


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=50),
                  st.integers(min_value=0, max_value=1_000_000)),
        min_size=1, max_size=10,
    )
)
def test_pav_minimax_matches_pool_adjacent_violators(bins):
    """isotonic_calibration_pav computes the isotonic fit via the
    minimax identity iso(i) = max_{j<=i} min_{k>=i} mean(j..k); this
    pins it against the classical stack-based PAV algorithm on
    arbitrary weighted bin tables (weights = bin counts)."""
    # minimax form (quantized ppm floor-divide, as the operator does)
    def wmean(j, k):
        num = sum(n * a for n, a in bins[j:k + 1])
        den = sum(n for n, _ in bins[j:k + 1])
        return num // den

    mini = [
        max(
            min(wmean(j, k) for k in range(i, len(bins)))
            for j in range(0, i + 1)
        )
        for i in range(len(bins))
    ]
    # classical PAV on exact fractions, then floor to the same units
    from fractions import Fraction

    stack = []  # (weight, mean as Fraction)
    for n, a in bins:
        cur = (n, Fraction(a))
        while stack and stack[-1][1] >= cur[1]:
            pn, pm = stack.pop()
            w = pn + cur[0]
            cur = (w, (pn * pm + cur[0] * cur[1]) / w)
        stack.append(cur)
    pav = []
    for w, m in stack:
        pav.extend([m] * w)
    # expand mini by weights for comparison
    mini_x = []
    for (n, _), v in zip(bins, mini):
        mini_x.extend([v] * n)
    # each PAV level IS the exact weighted mean of a contiguous block,
    # and the minimax form attains the same block partition — so the
    # floor-divide minimax solution equals floor(exact PAV) exactly
    # (accuracies are non-negative, so Fraction truncation == floor)
    assert [int(m) for m in pav] == mini_x
    # and monotonicity of the minimax fit
    assert mini == sorted(mini)


# ------------------------------- Benjamini-Hochberg integer form


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=64),
             min_size=1, max_size=12)
)
def test_bh_integer_predicate_matches_textbook(p_counts):
    """permutation_test_fdr's pure-integer BH predicate
    20*p_count*m <= rank*64 must select exactly the textbook step-up
    set {i <= k : k = max i with p_(i) <= i*alpha/m} at alpha = 0.05
    with p = p_count/64 — as exact fractions, for any p-vector."""
    from fractions import Fraction

    ps = sorted(p_counts)
    m = len(ps)
    alpha = Fraction(5, 100)
    k_ref = max(
        (i for i in range(1, m + 1)
         if Fraction(ps[i - 1], 64) <= i * alpha / m),
        default=None,
    )
    k_int = max(
        (i for i in range(1, m + 1) if 20 * ps[i - 1] * m <= i * 64),
        default=None,
    )
    assert k_ref == k_int
    ref_set = set(range(1, (k_ref or 0) + 1))
    int_set = {i for i in range(1, m + 1)
               if k_int is not None and i <= k_int}
    assert ref_set == int_set


# ------------------------------- Shapley axioms on random games


@settings(max_examples=40, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=15),  # masks over 4 channels
        st.integers(min_value=0, max_value=50),  # conversions
        min_size=1, max_size=12,
    )
)
def test_shapley_axioms_on_random_mask_games(mstats):
    """The exact lattice Shapley computation used by
    shapley_channel_attribution, on arbitrary mask->conversion
    histograms: efficiency (sum phi = v(full) - v(empty)), the null
    player axiom (a channel in no mask gets exactly 0), and symmetry
    (channels that appear in exactly the same masks get equal phi)."""
    from math import factorial

    cc = 4

    def v(s):
        return sum(cv for m, cv in mstats.items() if (m & s) == m)

    vt = [v(s) for s in range(1 << cc)]
    phis = []
    for c in range(cc):
        bit = 1 << c
        phi = sum(
            factorial(bin(s).count("1"))
            * factorial(cc - bin(s).count("1") - 1)
            * (vt[s + bit] - vt[s])
            for s in range(1 << cc)
            if not s & bit
        )
        phis.append(phi)
    fact_c = factorial(cc)
    # efficiency, exactly
    assert sum(phis) == fact_c * (vt[(1 << cc) - 1] - vt[0])
    # null player: channel absent from every mask contributes nothing
    for c in range(cc):
        if all(not (m >> c) & 1 for m in mstats):
            assert phis[c] == 0
    # symmetry: identical mask membership -> identical phi
    for a in range(cc):
        for b in range(a + 1, cc):
            if all(((m >> a) & 1) == ((m >> b) & 1) for m in mstats):
                assert phis[a] == phis[b]
    # monotone game: every marginal is non-negative
    assert all(p >= 0 for p in phis)
