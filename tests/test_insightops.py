"""Independent Python replays for the insightops.py operators."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from etl_energy_tracker_spark.queries.insightops import (
    _DE_COLS,
    ab_test_zscore,
    cohort_ltv_curve,
    dict_encoding_audit,
    grouping_sets_report,
    markov_steady_state,
)

from conftest import SF_DIR

_EPOCH_ORD = 719163  # date(1970,1,1).toordinal()


def _rows(table: str) -> list[dict]:
    return pq.read_table(f"{SF_DIR}/{table}.parquet").to_pylist()


def _d2(x: float) -> int:
    from decimal import Decimal, ROUND_HALF_UP

    return int((Decimal(repr(x)) * 100).quantize(0, rounding=ROUND_HALF_UP))


# --------------------------------------------------- grouping sets


def test_grouping_sets_python_replay(spark):
    got = {
        (r.brand, r.month_idx, r.gid): (r.n_rows, r.rev_units)
        for r in grouping_sets_report(spark, SF_DIR).collect()
    }
    brand = {p["p_partkey"]: p["p_brand"] for p in _rows("part")}
    cells = defaultdict(lambda: [0, 0])
    for li in _rows("lineitem"):
        b = brand[li["l_partkey"]]
        mi = li["l_shipdate"].year * 12 + li["l_shipdate"].month
        rev = _d2(li["l_extendedprice"]) * (100 - _d2(li["l_discount"]))
        cells[(b, mi)][0] += 1
        cells[(b, mi)][1] += rev
    expected = {}
    for (b, mi), (n, v) in cells.items():
        expected[(b, mi, 0)] = [n, v]
    for key_fn, gid in ((lambda b, mi: (b, None), 1),
                        (lambda b, mi: (None, mi), 2),
                        (lambda b, mi: (None, None), 3)):
        agg = defaultdict(lambda: [0, 0])
        for (b, mi), (n, v) in cells.items():
            k = key_fn(b, mi)
            agg[k][0] += n
            agg[k][1] += v
        for (b, mi), (n, v) in agg.items():
            expected[(b, mi, gid)] = [n, v]
    assert got == {k: tuple(v) for k, v in expected.items()}


# ------------------------------------------------- Markov chain


def test_markov_python_replay(spark):
    got = {r.state: r for r in markov_steady_state(spark, SF_DIR).collect()}
    by_user = defaultdict(list)
    for e in _rows("events"):
        by_user[e["user_id"]].append((e["ts"], e["event_id"], e["event_type"]))
    trans = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    row_tot = Counter()
    for (a, _), c in trans.items():
        row_tot[a] += c
    p = {k: 1000000 * c // row_tot[k[0]] for k, c in trans.items()}
    states = sorted(row_tot)
    k = len(states)
    v = {s: 1000000 // k for s in states}

    def step(v):
        out = defaultdict(int)
        for (a, b), ppm in p.items():
            if a in v:
                out[b] += v[a] * ppm
        return {s: x // 1000000 for s, x in out.items()}

    v1 = step(v)
    v2 = step(v1)
    assert set(got) == set(states)
    for s in states:
        r = got[s]
        assert r.v0_ppm == v[s]
        assert r.v1_ppm == v1[s]
        assert r.v2_ppm == v2[s]
    # mass is conserved up to ppm truncation
    assert 999000 <= sum(r.v2_ppm for r in got.values()) <= 1000000


# ------------------------------------------------------ A/B test


def test_ab_test_python_replay(spark):
    got = {r.event_type: r for r in ab_test_zscore(spark, SF_DIR).collect()}
    agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # na nb sa sb qa qb
    for e in _rows("events"):
        cents = math.floor(e["value"] * 100)
        a = agg[e["event_type"]]
        if e["user_id"] % 2 == 0:
            a[0] += 1
            a[2] += cents
            a[4] += cents * cents
        else:
            a[1] += 1
            a[3] += cents
            a[5] += cents * cents
    assert set(got) == set(agg)
    for t, (na, nb, sa, sb, qa, qb) in agg.items():
        r = got[t]
        assert (r.n_a, r.n_b) == (na, nb)
        assert r.mean_a_cents == sa // na
        assert r.mean_b_cents == sb // nb
        num = float(sa) / float(na) - float(sb) / float(nb)
        den = math.sqrt(
            (float(na) * float(qa) - float(sa) * float(sa))
            / (float(na) ** 3)
            + (float(nb) * float(qb) - float(sb) * float(sb))
            / (float(nb) ** 3)
        )
        assert r.z_milli == math.floor(1000.0 * num / den)
        # parity split carries no real effect
        assert abs(r.z_milli) < 4000


# ------------------------------------------------------ LTV curve


def test_cohort_ltv_python_replay(spark):
    got = {
        (r.cohort_week, r.age): r
        for r in cohort_ltv_curve(spark, SF_DIR).collect()
    }

    def wk(ts):
        return (ts.date().toordinal() - _EPOCH_ORD) // 7

    firsts = {}
    for e in _rows("events"):
        w = wk(e["ts"])
        u = e["user_id"]
        if u not in firsts or w < firsts[u]:
            firsts[u] = w
    sizes = Counter(firsts.values())
    rev = defaultdict(lambda: [0, set()])
    for e in _rows("events"):
        if e["event_type"] != "purchase":
            continue
        cw = firsts[e["user_id"]]
        age = wk(e["ts"]) - cw
        rev[(cw, age)][0] += math.floor(e["value"] * 100)
        rev[(cw, age)][1].add(e["user_id"])
    assert set(got) == set(rev)
    for cw in {c for c, _ in rev}:
        ages = sorted(a for c, a in rev if c == cw)
        cum = 0
        for a in ages:
            cents, users = rev[(cw, a)]
            cum += cents
            r = got[(cw, a)]
            assert r.cohort_users == sizes[cw]
            assert r.active_users == len(users)
            assert r.rev_cents == cents
            assert r.cum_rev_cents == cum
            assert r.cum_ltv_millicents == 10 * cum // sizes[cw]
        # the curve is monotone by construction
        cums = [got[(cw, a)].cum_rev_cents for a in ages]
        assert cums == sorted(cums)


# ---------------------------------------------------- dict audit


def test_dict_encoding_python_replay(spark):
    got = {r.col_name: r for r in dict_encoding_audit(spark, SF_DIR).collect()}
    assert set(got) == {f"{t}.{c}" for t, c in _DE_COLS}
    for t, c in _DE_COLS:
        vals = [str(r[c]) for r in _rows(t)]
        tf = Counter(vals)
        n = len(vals)
        ndv = len(tf)
        raw = sum(len(v) for v in vals)
        bits = ndv.bit_length()
        dict_bytes = sum(len(v) for v in tf) + (n * bits + 7) // 8
        r = got[f"{t}.{c}"]
        assert (r.n_rows, r.ndv, r.raw_bytes) == (n, ndv, raw)
        assert r.dict_bytes == dict_bytes
        assert r.savings_ppm == 1000000 * (raw - dict_bytes) // raw
        # these are all low-cardinality columns: encoding must pay
        assert r.savings_ppm > 500_000


# ------------------------------------------ weighted percentiles


def test_weighted_percentile_python_replay(spark):
    from etl_energy_tracker_spark.queries.insightops import (
        _WP_QS,
        weighted_percentile_exact,
    )

    got = {
        (r.flag, r.pct): r
        for r in weighted_percentile_exact(spark, SF_DIR).collect()
    }
    hist = defaultdict(Counter)
    for li in _rows("lineitem"):
        hist[li["l_returnflag"]][_d2(li["l_extendedprice"])] += int(
            li["l_quantity"]
        )
    assert set(got) == {
        (f, q) for f in hist for q in _WP_QS
    }
    for flag, tf in hist.items():
        total = sum(tf.values())
        cum = 0
        found = {}
        for cents in sorted(tf):
            cum += tf[cents]
            for q in _WP_QS:
                if q not in found and cum * 100 >= q * total:
                    found[q] = cents
        for q in _WP_QS:
            r = got[(flag, q)]
            assert r.total_weight == total
            assert r.value_cents == found[q]
        # percentiles are monotone in q
        assert found[50] <= found[90] <= found[99]


# --------------------------------------- degenerate-input guards


def test_ab_test_one_empty_arm_returns_null(spark, tmp_path):
    # all users in arm 0: Spark's ANSI DIV/NaN-cast would throw or
    # diverge from DuckDB without the NULLIF/CASE guards
    import shutil

    sf = str(tmp_path / "sf")
    shutil.copytree(SF_DIR, sf)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    from pyspark.sql import functions as F

    one_arm = ev.limit(4).withColumn(
        "user_id", (F.col("user_id") * 2).cast("long")
    )
    (tmp_path / "sf" / "events.parquet").unlink()
    one_arm.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    rows = ab_test_zscore(spark, sf).collect()
    assert rows
    for r in rows:
        assert r.n_b == 0
        assert r.mean_b_cents is None
        assert r.z_milli is None
        assert r.mean_a_cents is not None


def test_kappa_empty_corpus_returns_nulls(spark, tmp_path):
    import shutil

    from etl_energy_tracker_spark.queries.statops import (
        cohens_kappa_agreement,
    )

    sf = str(tmp_path / "sf")
    shutil.copytree(SF_DIR, sf)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    (tmp_path / "sf" / "documents.parquet").unlink()
    docs.limit(0).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    r = cohens_kappa_agreement(spark, sf).collect()[0]
    assert r.n == 0
    assert r.agree_ppm is None
    assert r.kappa_ppm is None


def test_fk_audit_empty_child_returns_null_ppm(spark, tmp_path):
    import shutil

    from etl_energy_tracker_spark.queries.martops import fk_integrity_audit

    sf = str(tmp_path / "sf")
    shutil.copytree(SF_DIR, sf)
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    (tmp_path / "sf" / "nation.parquet").unlink()
    nation.limit(0).write.mode("overwrite").parquet(f"{sf}/nation.parquet")
    got = {
        r.relationship: r for r in fk_integrity_audit(spark, sf).collect()
    }
    g = got["nation.n_regionkey->region"]
    assert g.n_rows == 0
    assert g.orphan_ppm is None
    # customer->nation now sees every key as orphan, and still reports
    g2 = got["customer.c_nationkey->nation"]
    assert g2.orphan_rows == g2.n_rows > 0


# ------------------------------------------------- bitmap index


def test_bitmap_intersection_python_replay(spark):
    from etl_energy_tracker_spark.queries.insightops import (
        bitmap_intersection_audit,
    )

    got = {
        (r.type_a, r.type_b): r
        for r in bitmap_intersection_audit(spark, SF_DIR).collect()
    }
    users = defaultdict(set)
    for e in _rows("events"):
        users[e["event_type"]].add(e["user_id"])
    types = sorted(users)
    expect_keys = {
        (a, b) for i, a in enumerate(types) for b in types[i + 1:]
    }
    assert set(got) == expect_keys
    for a, b in expect_keys:
        inter = len(users[a] & users[b])
        union = len(users[a] | users[b])
        r = got[(a, b)]
        assert r.users_a == len(users[a])
        assert r.users_b == len(users[b])
        assert r.common_users == inter
        assert r.jaccard_ppm == 1000000 * inter // union


# -------------------------------------------- HLL daily series


def test_hll_daily_series_python_replay(spark):
    from etl_energy_tracker_spark.functions.hashing import MOD
    from etl_energy_tracker_spark.queries.sketchops import (
        _HLL_M,
        hll_daily_series,
    )

    def charhash(s, seed=7):
        h = seed
        for ch in s:
            h = (h * 31 + ord(ch)) % MOD
        return h

    _W = 22

    def rho(w):
        return _W + 1 if w == 0 else _W + 1 - w.bit_length()

    alpha = 0.7182725932495458

    def estimate(regs):
        n_filled = len(regs)
        s_filled = sum(1.0 / (1 << r) for r in regs.values())
        raw = alpha * _HLL_M * _HLL_M / (
            (_HLL_M - n_filled) * 1.0 + s_filled
        )
        if raw <= 2.5 * _HLL_M and n_filled < _HLL_M:
            return _HLL_M * math.log(_HLL_M * 1.0 / (_HLL_M - n_filled))
        return raw

    got = {r.day_num: r for r in hll_daily_series(spark, SF_DIR).collect()}
    day_regs = defaultdict(dict)
    day_users = defaultdict(set)
    all_users = set()
    for e in _rows("events"):
        day = e["ts"].date().toordinal() - _EPOCH_ORD
        hv = charhash(str(e["user_id"]))
        b, w = hv % _HLL_M, hv // _HLL_M
        r = rho(w)
        if r > day_regs[day].get(b, 0):
            day_regs[day][b] = r
        day_users[day].add(e["user_id"])
        all_users.add(e["user_id"])
    merged = {}
    for regs in day_regs.values():
        for b, r in regs.items():
            if r > merged.get(b, 0):
                merged[b] = r
    assert set(got) == set(day_regs)
    m_est = round(estimate(merged), 4)
    for day, regs in day_regs.items():
        r = got[day]
        assert r.exact_users == len(day_users[day])
        assert r.hll_est == round(estimate(regs), 4)
        assert r.total_exact_users == len(all_users)
        assert r.merged_hll_est == m_est
        # the sketch is honest: within 20% of exact at m=256
        assert abs(r.hll_est - r.exact_users) <= 0.2 * r.exact_users
    # merged estimate tracks the true union, not the sum of days
    assert abs(m_est - len(all_users)) <= 0.2 * len(all_users)
