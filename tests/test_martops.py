"""Independent Python replays for the martops.py operators."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from etl_energy_tracker_spark.queries.martops import (
    _CP_TOPK,
    _FK_RELS,
    asof_join_next_purchase,
    copurchase_item_similarity,
    dow_hour_heatmap,
    fk_integrity_audit,
)

from conftest import SF_DIR


def _rows(table: str) -> list[dict]:
    return pq.read_table(f"{SF_DIR}/{table}.parquet").to_pylist()


# ------------------------------------------------------ FK audit


def test_fk_integrity_python_replay(spark):
    got = {
        r.relationship: r for r in fk_integrity_audit(spark, SF_DIR).collect()
    }
    tables = {}
    for label, child, ck, parent, pk in _FK_RELS:
        for t in (child, parent):
            if t not in tables:
                tables[t] = _rows(t)
        parents = {r[pk] for r in tables[parent]}
        rows = tables[child]
        orphans = [r[ck] for r in rows if r[ck] not in parents]
        g = got[label]
        assert g.n_rows == len(rows)
        assert g.n_keys == len({r[ck] for r in rows})
        assert g.orphan_rows == len(orphans)
        assert g.orphan_keys == len(set(orphans))
        assert g.orphan_ppm == 1000000 * len(orphans) // len(rows)
    # TPC-H data is referentially intact
    assert all(r.orphan_rows == 0 for r in got.values())


def test_fk_audit_detects_injected_orphan(spark, tmp_path):
    # rebuild a tiny lake with one dangling nation->region key and
    # prove the detector fires (the all-zeros pass above can't)
    import shutil

    sf = str(tmp_path / "sf")
    shutil.copytree(SF_DIR, sf)
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    broken = nation.unionByName(
        nation.limit(1).withColumn("n_nationkey", F.lit(900))
        .withColumn("n_regionkey", F.lit(999))
    )
    (tmp_path / "sf" / "nation.parquet").unlink()
    broken.write.mode("overwrite").parquet(f"{sf}/nation.parquet")
    got = {
        r.relationship: r for r in fk_integrity_audit(spark, sf).collect()
    }
    g = got["nation.n_regionkey->region"]
    assert g.orphan_rows == 1 and g.orphan_keys == 1
    assert g.orphan_ppm == 1000000 * 1 // g.n_rows
    # the other relationships stay clean
    assert got["customer.c_nationkey->nation"].orphan_rows == 0


# ------------------------------------------------- co-purchase


def test_copurchase_python_replay(spark):
    got = defaultdict(dict)
    for r in copurchase_item_similarity(spark, SF_DIR).collect():
        got[r.part][r.rank] = r
    baskets = defaultdict(set)
    for r in _rows("lineitem"):
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    freq = Counter()
    pairs = Counter()
    for parts in baskets.values():
        freq.update(parts)
        sp = sorted(parts)
        for i, a in enumerate(sp):
            for b in sp[i + 1:]:
                pairs[(a, b)] += 1
    neighbors = defaultdict(list)
    for (a, b), c in pairs.items():
        neighbors[a].append((b, c))
        neighbors[b].append((a, c))
    for part, cands in neighbors.items():
        ranked = sorted(
            cands,
            key=lambda bc: (
                -(float(bc[1]) * float(bc[1])
                  / (float(freq[part]) * float(freq[bc[0]]))),
                bc[0],
            ),
        )[:_CP_TOPK]
        assert set(got[part]) == set(range(1, len(ranked) + 1))
        for rk, (nb, c) in enumerate(ranked, start=1):
            r = got[part][rk]
            assert (r.neighbor, r.copurchases) == (nb, c)
            assert r.cosine_ppm == math.floor(
                1000000.0 * float(c)
                / math.sqrt(float(freq[part]) * float(freq[nb]))
            )
    assert set(got) == set(neighbors)


# ------------------------------------------------------ heatmap


def test_dow_hour_heatmap_python_replay(spark):
    got = {
        (r.dow, r.hr): r for r in dow_hour_heatmap(spark, SF_DIR).collect()
    }
    cells = defaultdict(lambda: [0, 0])
    for e in _rows("events"):
        key = (e["ts"].isoweekday() - 1, e["ts"].hour)
        cells[key][0] += 1
        cells[key][1] += math.floor(e["value"] * 100)
    n_total = sum(c[0] for c in cells.values())
    row = Counter()
    col = Counter()
    for (d, h), (n, _) in cells.items():
        row[d] += n
        col[h] += n
    assert set(got) == set(cells)
    for (d, h), (n, cents) in cells.items():
        r = got[(d, h)]
        assert r.n_events == n
        assert r.value_cents == cents
        assert r.lift_ppm == 1000000 * n * n_total // (row[d] * col[h])


# ------------------------------------------- forward as-of join


def test_asof_forward_python_replay(spark):
    got = {
        r.event_id: r
        for r in asof_join_next_purchase(spark, SF_DIR).collect()
    }
    by_user = defaultdict(list)
    clicks = []
    for e in _rows("events"):
        if e["event_type"] == "purchase":
            by_user[e["user_id"]].append((e["ts"], e["value"]))
        elif e["event_type"] == "click":
            clicks.append(e)
    for u in by_user:
        by_user[u].sort()
    assert set(got) == {c["event_id"] for c in clicks}
    for c in clicks:
        after = [
            (t, v) for t, v in by_user.get(c["user_id"], []) if t >= c["ts"]
        ]
        r = got[c["event_id"]]
        if after:
            assert r.next_purchase_at == after[0][0]
            assert r.purchase_value == after[0][1]
            assert r.next_purchase_at >= r.ts
        else:
            assert r.next_purchase_at is None
            assert r.purchase_value is None


# ---------------------------------------------- reconciliation


def test_order_reconciliation_python_replay(spark):
    from etl_energy_tracker_spark.queries.martops import (
        _REC_TOL_MICRO,
        order_total_reconciliation,
    )
    from decimal import Decimal, ROUND_HALF_UP

    def d2(x: float) -> int:
        # DECIMAL(38,2) cast then x100 -> integer cents
        return int(
            (Decimal(repr(x)) * 100).quantize(0, rounding=ROUND_HALF_UP)
        )

    got = {
        r.status: r
        for r in order_total_reconciliation(spark, SF_DIR).collect()
    }
    comp = defaultdict(int)
    for li in _rows("lineitem"):
        comp[li["l_orderkey"]] += (
            d2(li["l_extendedprice"])
            * (100 - d2(li["l_discount"]))
            * (100 + d2(li["l_tax"]))
        )
    per_status = defaultdict(list)
    for o in _rows("orders"):
        adiff = abs(
            d2(o["o_totalprice"]) * 10000 - comp.get(o["o_orderkey"], 0)
        )
        per_status[o["o_orderstatus"]].append(adiff)
    assert set(got) == set(per_status)
    for st, diffs in per_status.items():
        diffs.sort()
        n = len(diffs)
        mism = sum(1 for d in diffs if d > _REC_TOL_MICRO)
        r = got[st]
        assert r.n_orders == n
        assert r.n_mismatch == mism
        assert r.mismatch_ppm == 1000000 * mism // n
        assert r.max_adiff_cents == diffs[-1] // 10000
        # lower median: smallest v with 2*cum >= n
        assert r.median_adiff_cents == diffs[(n - 1) // 2] // 10000


# ------------------------------------------------- modularity


def test_modularity_python_replay(spark):
    from etl_energy_tracker_spark.queries.martops import (
        graph_modularity_score,
    )

    got = {
        r.brand: r for r in graph_modularity_score(spark, SF_DIR).collect()
    }
    brand = {p["p_partkey"]: p["p_brand"] for p in _rows("part")}
    baskets = defaultdict(set)
    for r in _rows("lineitem"):
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    pairs = Counter()
    for parts in baskets.values():
        sp = sorted(parts)
        for i, a in enumerate(sp):
            for b in sp[i + 1:]:
                pairs[(a, b)] += 1
    m = sum(pairs.values())
    intra = Counter()
    deg = Counter()
    for (a, b), c in pairs.items():
        if brand[a] == brand[b]:
            intra[brand[a]] += c
        deg[brand[a]] += c
        deg[brand[b]] += c
    assert set(got) == set(deg)
    q = 0
    for br in deg:
        r = got[br]
        assert r.intra_weight == intra.get(br, 0)
        assert r.degree_weight == deg[br]
        assert r.total_weight == m
        expect = math.floor(
            1000000.0
            * (
                float(intra.get(br, 0)) / float(m)
                - (float(deg[br]) / (2.0 * float(m)))
                * (float(deg[br]) / (2.0 * float(m)))
            )
        )
        assert r.contribution_ppm == expect
        q += expect
    # random baskets: brand partition carries ~no structure
    assert abs(q) < 100_000


# ------------------------------------------------ month movers


def test_brand_month_movers_python_replay(spark):
    from etl_energy_tracker_spark.queries.martops import (
        brand_month_movers,
    )
    from decimal import Decimal, ROUND_HALF_UP

    def d2(x: float) -> int:
        return int(
            (Decimal(repr(x)) * 100).quantize(0, rounding=ROUND_HALF_UP)
        )

    got = {
        (r.brand, r.month_idx): r
        for r in brand_month_movers(spark, SF_DIR).collect()
    }
    brand = {p["p_partkey"]: p["p_brand"] for p in _rows("part")}
    rev = defaultdict(int)
    for li in _rows("lineitem"):
        b = brand[li["l_partkey"]]
        mi = li["l_shipdate"].year * 12 + li["l_shipdate"].month
        rev[(b, mi)] += d2(li["l_extendedprice"]) * (
            100 - d2(li["l_discount"])
        )
    by_brand = defaultdict(list)
    for (b, mi), v in rev.items():
        by_brand[b].append((mi, v))
    rows = []
    for b, seq in by_brand.items():
        seq.sort()
        for (pm, pv), (cm, cv) in zip(seq, seq[1:]):
            num = 1000000 * (cv - pv)
            ppm = -((-num) // pv) if num < 0 else num // pv
            rows.append((b, cm, cv, ppm))
    assert set(got) == {(b, m) for b, m, _, _ in rows}
    by_month = defaultdict(list)
    for b, mi, v, ppm in rows:
        r = got[(b, mi)]
        assert r.rev_units == v
        assert r.mom_ppm == ppm
        by_month[mi].append((b, ppm))
    for mi, entries in by_month.items():
        ranked = sorted(entries, key=lambda bp: (-bp[1], bp[0]))
        for rk, (b, _) in enumerate(ranked, start=1):
            assert got[(b, mi)].mover_rank == rk
