"""Invariant tests for the web-corpus prep operators
(queries/webprep.py) and the JL random projection (vectorops). The
driver oracle gate checks value equality; these pin the semantics each
operator promises against independent Python recomputation.
"""

from __future__ import annotations

import re
from collections import Counter

from etl_energy_tracker_spark.queries.vectorops import (
    _RP_DIM,
    _RP_OUT,
    random_projection_reduce,
)
from etl_energy_tracker_spark.queries.webprep import (
    _STOP_MIN,
    gopher_quality_report,
    perplexity_tertile_split,
    url_canonicalize_dedup,
)

from conftest import SF_DIR

_STOPS = {"the", "be", "to", "of", "and", "that", "have", "with"}


def test_gopher_rules_match_python_recompute(spark):
    rows = {r["doc_id"]: r for r in gopher_quality_report(spark, SF_DIR).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    assert set(rows) == set(docs)
    for doc_id, text in docs.items():
        # both engines tokenize on ASCII \s (Java regex / DuckDB RE2);
        # Python str.split() would also split Unicode whitespace
        toks = [t for t in re.split(r"\s+", text.strip(), flags=re.ASCII) if t]
        r = rows[doc_id]
        assert r["n_words"] == len(toks)
        assert r["mean_wlen_centi"] == sum(len(t) for t in toks) * 100 // len(toks)
        assert r["n_alpha"] == sum(1 for t in toks if re.search("[A-Za-z]", t))
        assert r["n_stop"] == sum(1 for t in toks if t in _STOPS)
        # each flag is exactly its rule; the verdict is exactly the AND
        assert r["nwords_ok"] == (50 <= r["n_words"] <= 100000)
        assert r["wlen_ok"] == (300 <= r["mean_wlen_centi"] <= 1000)
        assert r["alpha_ok"] == (r["n_alpha"] * 100 >= 80 * r["n_words"])
        assert r["stop_ok"] == (r["n_stop"] >= _STOP_MIN)
        assert r["symbol_ok"] == (r["n_symbol"] * 10 <= r["n_words"])
        assert r["gopher_pass"] == (
            r["nwords_ok"] and r["wlen_ok"] and r["alpha_ok"]
            and r["stop_ok"] and r["symbol_ok"]
        )
    # the report must not be degenerate on the fixture corpus: both
    # verdicts occur
    verdicts = {r["gopher_pass"] for r in rows.values()}
    assert verdicts == {True, False}


def _py_canonical(source: str, doc_id: int) -> str:
    url = f"https://www.{source}.example.com/Articles/{doc_id % 11}"
    if doc_id % 5 == 0:
        url += "/"
    if doc_id % 3 == 0:
        url += f"?utm_source=feed&utm_campaign=c{doc_id % 7}&ref=rss"
    u = url.lower()
    u = re.sub("^https?://", "", u)
    u = re.sub(r"^www\.", "", u)
    u = re.sub(r"[?&](utm_[a-z]+|ref)=[^&#]*", "", u)
    u = re.sub(r"\?$", "", u)
    u = re.sub("/+$", "", u)
    return u


def test_url_canonicalize_dedup_matches_python(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    ).collect()
    expected = Counter(_py_canonical(r["source"], r["doc_id"]) for r in docs)
    keepers = {}
    for r in docs:
        c = _py_canonical(r["source"], r["doc_id"])
        keepers[c] = min(keepers.get(c, r["doc_id"]), r["doc_id"])
    out = {r["canonical_url"]: r for r in url_canonicalize_dedup(spark, SF_DIR).collect()}
    assert {k: v["n_urls"] for k, v in out.items()} == dict(expected)
    assert {k: v["keeper_doc_id"] for k, v in out.items()} == keepers
    # canonicalization must actually merge: tracking-param / slash
    # variants of one page collapse (fewer canonical urls than docs)
    assert len(out) < len(docs)
    for url in out:
        assert not url.startswith(("http", "www."))
        assert "utm_" not in url and "?" not in url
        assert not url.endswith("/")


def test_perplexity_tertiles_are_balanced_and_ordered(spark):
    rows = perplexity_tertile_split(spark, SF_DIR).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["ccnet_bucket"], []).append(
            (r["avg_logp_micro"], r["doc_id"])
        )
    assert set(by_bucket) == {"head", "middle", "tail"}
    sizes = sorted(len(v) for v in by_bucket.values())
    assert sizes[-1] - sizes[0] <= 1  # NTILE balance
    # rank order: every head doc sorts before every middle doc in the
    # (score desc, doc_id) order, and middle before tail
    def sort_key(t):
        return (-t[0], t[1])

    h = max(by_bucket["head"], key=sort_key)
    m_lo = min(by_bucket["middle"], key=sort_key)
    m_hi = max(by_bucket["middle"], key=sort_key)
    t_lo = min(by_bucket["tail"], key=sort_key)
    assert sort_key(h) < sort_key(m_lo)
    assert sort_key(m_hi) < sort_key(t_lo)


def test_random_projection_matches_numpy(spark):
    import numpy as np

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype="float64")
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    out = {r["vec_id"]: r for r in random_projection_reduce(spark, SF_DIR).collect()}
    assert set(out) == set(emb)
    sign = np.array(
        [
            [1 if (i * 73 + j * 151) % 97 < 48 else -1 for j in range(_RP_OUT)]
            for i in range(_RP_DIM)
        ],
        dtype="int64",
    )
    for vid, v in list(emb.items())[:20]:
        # Spark/DuckDB round() is half-AWAY-from-zero; np.round is
        # half-to-even, which would diverge on exact .5 micro-values
        scaled = v * 1_000_000
        micro = np.trunc(scaled + np.copysign(0.5, scaled)).astype("int64")
        expect = micro @ sign
        got = np.array([out[vid][f"p{j}"] for j in range(_RP_OUT)])
        assert (got == expect).all(), vid
    # ±1 matrix is balanced enough that no output dim is constant
    for j in range(_RP_OUT):
        assert len({out[v][f"p{j}"] for v in out}) > 1


def test_normalized_exact_dedup_merges_variants(spark):
    """Case/punctuation/whitespace variants of one text must share a
    keeper; distinct texts must not."""
    from etl_energy_tracker_spark.queries.textops import normalized_exact_dedup

    out = {r["norm_hash"]: r for r in normalized_exact_dedup(spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()

    def norm(t):
        t = re.sub("[^a-z0-9 ]", " ", t.lower())
        return re.sub(" +", " ", t).strip()

    groups = {}
    for r in docs:
        groups.setdefault(norm(r["text"]), []).append(r["doc_id"])
    assert len(out) == len(groups)
    for ids in groups.values():
        # every group's min id is a keeper somewhere
        assert any(v["keeper_doc_id"] == min(ids) and v["n_docs"] == len(ids)
                   for v in out.values())


def test_phrase_match_count_matches_python(spark):
    from etl_energy_tracker_spark.queries.textops import _PHRASE, phrase_match_count

    out = {r["doc_id"]: r["n_hits"] for r in phrase_match_count(spark, SF_DIR).collect()}
    expected = {}
    for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect():
        toks = [t for t in re.split(r"\s+", r["text"].strip(), flags=re.ASCII) if t]
        n = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == _PHRASE[0] and toks[i + 1] == _PHRASE[1]
        )
        if n:
            expected[r["doc_id"]] = n
    assert out == expected and out


def test_phrase_match_short_docs_do_not_crash(spark):
    """sequence(1, size-1) is DESCENDING for 1-token docs ([1, 0]) and
    would index toks[-1] under ANSI — short/empty docs must produce
    zero hits, not a crash. Exercises the operator's expression on a
    crafted frame (the fixture corpus has no short docs)."""
    from pyspark.sql import functions as F

    from etl_energy_tracker_spark.queries.textops import _PHRASE

    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, f"{_PHRASE[0]} {_PHRASE[1]}")],
        "doc_id long, text string",
    )
    t = df.select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks"))
    hits = F.expr(
        f"CASE WHEN size(toks) < 2 THEN 0 ELSE "
        f"size(filter(sequence(1, size(toks) - 1), "
        f"i -> toks[i-1] = '{_PHRASE[0]}' AND toks[i] = '{_PHRASE[1]}')) END"
    )
    out = {r["doc_id"]: r["n"] for r in t.select("doc_id", hits.alias("n")).collect()}
    assert out == {1: 0, 2: 0, 3: 1}


def test_seasonal_naive_backtest_matches_python(spark):
    """WAPE per event_type must match an independent Python replay of
    the s=168h seasonal-naive baseline."""
    from collections import defaultdict
    from decimal import Decimal

    from etl_energy_tracker_spark.queries.timeops import (
        _SEASON_H,
        seasonal_naive_backtest,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    hourly = defaultdict(Decimal)
    for r in ev:
        h = r["ts"].replace(minute=0, second=0, microsecond=0)
        hourly[(r["event_type"], h)] += Decimal(str(round(r["value"], 6)))
    # mirror the engine: hourly totals as DECIMAL(38,6)-exact doubles
    hv = {k: float(v) for k, v in hourly.items()}
    agg = defaultdict(lambda: [0, Decimal(0), Decimal(0)])
    from datetime import timedelta

    for (et, h), v in hv.items():
        prev = (et, h - timedelta(hours=_SEASON_H))
        if prev in hv:
            st = agg[et]
            st[0] += 1
            st[1] += Decimal(str(round(abs(v - hv[prev]), 6)))
            st[2] += Decimal(str(v))
    got = {r["event_type"]: r for r in seasonal_naive_backtest(spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for et, (n, err, act) in agg.items():
        r = got[et]
        assert r["n_hours"] == n
        assert abs(r["sum_abs_err"] - float(err)) < 1e-6
        assert abs(r["wape"] - round(float(err) / float(act), 6)) < 1e-6


def test_hopping_windows_cover_each_event_four_times(spark):
    """Every event must appear in exactly 4 overlapping windows, and
    each window's count must equal the events in [start, start+1h)."""
    from collections import Counter
    from datetime import timedelta

    from etl_energy_tracker_spark.queries.timeops import hopping_window_agg

    out = hopping_window_agg(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    total_rows = sum(r["n"] for r in out)
    assert total_rows == 4 * len(ev)  # 4x replication, none lost
    expected = Counter()
    for r in ev:
        t = r["ts"]
        base = t.replace(minute=(t.minute // 15) * 15, second=0, microsecond=0)
        for k in range(4):
            expected[(base - timedelta(minutes=15 * k), r["event_type"])] += 1
    got = {(r["window_start"], r["event_type"]): r["n"] for r in out}
    assert got == dict(expected)
