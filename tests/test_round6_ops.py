"""Invariant tests for the round-6 operator additions.

The driver's DuckDB-oracle hash compare is the primary gate; these
pin structural invariants the hash can't express (conservation laws,
identity decompositions, independent Python recomputations).
"""

from __future__ import annotations

import pytest

import math
import re
from collections import defaultdict

from pyspark.sql import functions as F

from etl_energy_tracker_spark.functions.hashing import MOD
from etl_energy_tracker_spark.queries.prepops import (
    _BL_CHUNK,
    _ED_SIM_PCT,
    _HLC_BUCKETS,
    _IB_BUDGET,
    _KA_KS,
    _PQ_K,
    _PQ_M,
    boilerplate_line_removal,
    hashed_linear_classifier,
    image_bucket_batching,
    k_anonymity_report,
    leakage_safe_split,
    lsh_edit_distance_verify,
    pq_quantize_stats,
    seasonal_decompose_ma,
    tokenizer_fertility_report,
)
from etl_energy_tracker_spark.queries.streamops import stream_scd1_upsert

from conftest import SF_DIR


def _charhash(s: str, seed: int = 7) -> int:
    h = seed
    for ch in s:
        h = (h * 31 + ord(ch)) % MOD
    return h


def _toks(text: str) -> list[str]:
    return re.split(r"\s+", text.strip(), flags=re.ASCII)


def test_boilerplate_conserves_chunks(spark):
    rows = boilerplate_line_removal(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    expected = {
        d.doc_id: math.ceil(len(_toks(d.text)) / _BL_CHUNK) for d in docs
    }
    got = {r.doc_id: r.n_chunks for r in rows}
    assert got == expected
    assert all(0 <= r.n_removed <= r.n_chunks for r in rows)
    # something IS boilerplate at this vocab size, and not everything
    assert any(r.n_removed > 0 for r in rows)
    assert any(r.n_removed < r.n_chunks for r in rows)


def test_edit_distance_verify_against_python(spark):
    rows = lsh_edit_distance_verify(spark, SF_DIR).collect()
    assert rows
    texts = {
        d.doc_id: d.text
        for d in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[-1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    for r in rows[:5]:
        assert r.lev == lev(texts[r.id_a], texts[r.id_b])
    for r in rows:
        mx = max(r.len_a, r.len_b)
        assert (mx - r.lev) * 100 >= _ED_SIM_PCT * mx
        assert r.sim_pct == (mx - r.lev) * 100 // mx


def test_leakage_safe_split_cluster_integrity(spark):
    rows = leakage_safe_split(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) == n_docs
    by_comp = defaultdict(set)
    for r in rows:
        by_comp[r.component].add(r.split)
    # the whole point: no component straddles two splits
    assert all(len(s) == 1 for s in by_comp.values())
    # and the hash split is the component hash, 90/5/5-shaped
    splits = defaultdict(int)
    for r in rows:
        assert r.split == (
            "train"
            if _charhash(str(r.component)) % 100 < 90
            else ("val" if _charhash(str(r.component)) % 100 < 95 else "test")
        )
        splits[r.split] += 1
    assert splits["train"] > splits["val"] + splits["test"]


def test_hashed_linear_classifier_recompute(spark):
    rows = {
        r.doc_id: r for r in hashed_linear_classifier(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20).collect()
    for d in docs:
        toks = _toks(d.text)
        score = sum(
            ((_charhash(t) % _HLC_BUCKETS) * 2654435761) % 1000003 % 2001
            - 1000
            for t in toks
        )
        r = rows[d.doc_id]
        assert r.n_tokens == len(toks)
        assert r.score == score
        assert r.positive == (score > 0)


def test_pq_codes_shape_and_zero_error_on_codebook(spark):
    rows = pq_quantize_stats(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        codes = [int(c) for c in r.codes.split(",")]
        assert len(codes) == _PQ_M
        assert all(0 <= c < _PQ_K for c in codes)
        assert r.qerr_micro >= 0
        if r.vec_id < _PQ_K:
            # a codebook vector quantizes to itself exactly
            assert codes == [r.vec_id] * _PQ_M
            assert r.qerr_micro == 0


def test_image_batches_respect_budget(spark):
    rows = image_bucket_batching(spark, SF_DIR).collect()
    by_batch = defaultdict(list)
    for r in rows:
        assert r.w % 16 == 0 and r.h % 16 == 0
        assert r.n_tokens == (r.w // 16) * (r.h // 16)
        by_batch[(r.bucket, r.batch_id)].append(r.n_tokens)
    for (_, batch_id), toks in by_batch.items():
        assert batch_id >= 0
        # greedy packing: a batch only exceeds the budget by at most
        # its final item (the item that tipped the running sum over)
        assert sum(toks) - max(toks) < _IB_BUDGET


def test_k_anonymity_monotone(spark):
    rows = {r.k: r for r in k_anonymity_report(spark, SF_DIR).collect()}
    assert set(rows) == set(_KA_KS)
    ks = sorted(_KA_KS)
    for a, b in zip(ks, ks[1:]):
        assert rows[a].n_groups_below <= rows[b].n_groups_below
        assert rows[a].n_rows_below <= rows[b].n_rows_below
    total = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    for r in rows.values():
        assert r.rows_below_ppm == r.n_rows_below * 1_000_000 // total


def test_seasonal_decomposition_identity(spark):
    rows = seasonal_decompose_ma(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert (
            r.v_micro
            == r.trend_micro + r.seasonal_micro + r.remainder_micro
        )
    # hour-of-day seasonal is constant within (event_type, hour-of-day)
    seas = defaultdict(set)
    for r in rows:
        seas[(r.event_type, r.h.hour)].add(r.seasonal_micro)
    assert all(len(v) == 1 for v in seas.values())


def test_fertility_bounds(spark):
    rows = tokenizer_fertility_report(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.fertility_ppm >= 1_000_000  # >= 1 token per word
        assert r.n_tokens <= r.n_chars  # every token is >= 1 char
        assert r.fertility_ppm == r.n_tokens * 1_000_000 // r.n_words
        assert r.chars_per_token_centi == r.n_chars * 100 // r.n_tokens


def test_stream_scd1_matches_batch_keep_last(spark):
    got = {
        r.user_id: (r.last_event_id, r.last_value, r.n_events)
        for r in stream_scd1_upsert(spark, SF_DIR).collect()
    }
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    last: dict[int, tuple] = {}
    counts: dict[int, int] = defaultdict(int)
    for e in events:
        counts[e.user_id] += 1
        k = (e.ts, e.event_id)
        if e.user_id not in last or k > last[e.user_id][0]:
            last[e.user_id] = (k, e.event_id, e.value)
    expected = {
        u: (ev, round(v * 100) / 100.0, counts[u])
        for u, (_, ev, v) in last.items()
    }
    assert got == expected


def test_dsir_weights_recompute(spark):
    from etl_energy_tracker_spark.queries.prepops import (
        _DSIR_BUCKETS,
        dsir_importance_weights,
    )

    rows = {r.doc_id: r for r in dsir_importance_weights(spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    raw: dict[int, int] = defaultdict(int)
    tgt: dict[int, int] = defaultdict(int)
    grams_by_doc: dict[int, list[int]] = {}
    for d in docs:
        toks = _toks(d.text)
        bs = [
            _charhash(f"{a} {b}") % _DSIR_BUCKETS
            for a, b in zip(toks, toks[1:])
        ]
        grams_by_doc[d.doc_id] = bs
        for b in bs:
            raw[b] += 1
            if d.lang == "en":
                tgt[b] += 1

    def ilog2(x: int) -> int:
        return x.bit_length() - 1

    w = {b: ilog2(tgt.get(b, 0) + 1) - ilog2(raw[b] + 1) for b in raw}
    for d in docs[:25]:
        bs = grams_by_doc[d.doc_id]
        if not bs:
            assert d.doc_id not in rows
            continue
        score = sum(w[b] for b in bs)
        r = rows[d.doc_id]
        assert r.n_grams == len(bs)
        assert r.score == score
        assert r.selected == (score > 0)


def test_late_arrival_audit_replay(spark):
    from etl_energy_tracker_spark.queries.prepops import (
        _LATE_WM_US,
        late_arrival_audit,
    )

    got = {r.event_type: r for r in late_arrival_audit(spark, SF_DIR).collect()}
    events = sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet").collect(),
        key=lambda e: e.event_id,
    )
    hwm: dict[str, int] = {}
    agg = defaultdict(lambda: [0, 0, 0, 0])  # n, n_late, total, max
    for e in events:
        us = int(e.ts.timestamp() * 1_000_000)
        late = max(hwm.get(e.event_type, us) - us, 0)
        a = agg[e.event_type]
        a[0] += 1
        a[1] += late > _LATE_WM_US
        a[2] += late
        a[3] = max(a[3], late)
        hwm[e.event_type] = max(hwm.get(e.event_type, us), us)
    for et, (n, nl, tot, mx) in agg.items():
        r = got[et]
        assert (r.n_events, r.n_late, r.total_late_us, r.max_late_us) == (
            n,
            nl,
            tot,
            mx,
        )


def test_adc_topk_vs_exact_pq_distance(spark):
    from etl_energy_tracker_spark.queries.prepops import (
        _ADC_TOP_K,
        ann_pq_adc_topk,
    )

    rows = ann_pq_adc_topk(spark, SF_DIR).collect()
    by_q = defaultdict(list)
    for r in rows:
        by_q[r.query_id].append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) == _ADC_TOP_K
        # distances are non-decreasing with rank
        ds = [r.adc_dist_micro for r in rs]
        assert ds == sorted(ds)
        # a query's own vector PQ-reconstructs closest to itself more
        # often than not; at minimum its ADC self-distance equals its
        # quantization error, which must appear in the top-k if small
        assert all(d >= 0 for d in ds)


@pytest.mark.slow
def test_quality_keeper_beats_cluster_peers(spark):
    from etl_energy_tracker_spark.queries.dedupops import near_dup_clusters
    from etl_energy_tracker_spark.queries.prepops import (
        quality_keeper_selection,
    )

    keepers = {
        r.component: r for r in quality_keeper_selection(spark, SF_DIR).collect()
    }
    comp = near_dup_clusters(spark, SF_DIR).collect()
    docs = {
        d.doc_id: d.text
        for d in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }

    def quality(doc_id: int) -> int:
        toks = _toks(docs[doc_id])
        return len(set(toks)) * 10000 // len(toks)

    members = defaultdict(list)
    for c in comp:
        members[c.component].append(c.doc_id)
    assert set(keepers) == set(members)
    for component, ids in members.items():
        k = keepers[component]
        assert k.cluster_size == len(ids)
        best = max(ids, key=lambda i: (quality(i), -i))
        assert k.keeper_doc_id == best
        assert k.keeper_quality_bp == quality(best)


def test_dataset_card_totals(spark):
    from etl_energy_tracker_spark.queries.prepops import dataset_card_report

    r = dataset_card_report(spark, SF_DIR).collect()[0]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    n_tokens = sum(len(_toks(d.text)) for d in docs)
    assert r.n_docs == len(docs)
    assert r.n_tokens == n_tokens
    assert r.n_chars == sum(d.n_chars for d in docs)
    assert r.n_langs == len({d.lang for d in docs})
    assert r.n_sources == len({d.source for d in docs})
    dup = len(docs) - len({d.text for d in docs})
    assert r.exact_dup_ppm == dup * 1_000_000 // len(docs)
    assert r.mean_doc_tokens_centi == n_tokens * 100 // len(docs)
    en = sum(1 for d in docs if d.lang == "en")
    assert r.en_share_ppm == en * 1_000_000 // len(docs)


def _window_occurrences(docs):
    """[(doc_id, pos1based, win_string)] over 8-token windows."""
    occ = []
    for d in docs:
        toks = _toks(d.text)
        for i in range(len(toks) - 7):
            occ.append((d.doc_id, i + 1, " ".join(toks[i : i + 8])))
    return occ


def test_exact_substring_trim_recompute(spark):
    from etl_energy_tracker_spark.queries.hygieneops import (
        exact_substring_trim,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    occ = _window_occurrences(docs)
    cnt = defaultdict(int)
    first = {}
    for doc_id, pos, win in occ:
        cnt[win] += 1
        k = doc_id * 1_000_000_000 + pos
        if win not in first or k < first[win]:
            first[win] = k
    removed_pos = defaultdict(set)
    removed_win = defaultdict(int)
    for doc_id, pos, win in occ:
        if cnt[win] >= 2 and doc_id * 1_000_000_000 + pos != first[win]:
            removed_win[doc_id] += 1
            removed_pos[doc_id].update(range(pos, pos + 8))
    got = {r.doc_id: r for r in exact_substring_trim(spark, SF_DIR).collect()}
    assert set(got) == {d.doc_id for d in docs}
    some_removed = False
    for d in docs:
        r = got[d.doc_id]
        n = len(_toks(d.text))
        rem = len(removed_pos[d.doc_id])
        assert r.n_tokens == n
        assert r.removed_tokens == rem
        assert r.kept_tokens == n - rem
        assert r.removed_windows == removed_win[d.doc_id]
        assert r.kept_ppm == (n - rem) * 1_000_000 // n
        some_removed = some_removed or rem > 0
    assert some_removed  # the corpus genuinely contains duplicated spans


def test_source_overlap_matrix_recompute(spark):
    from etl_energy_tracker_spark.queries.hygieneops import (
        source_overlap_matrix,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    src = {d.doc_id: d.source for d in docs}
    wins = defaultdict(set)
    for doc_id, _, win in _window_occurrences(docs):
        wins[src[doc_id]].add(win)
    exp = {}
    sources = sorted(wins)
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            shared = len(wins[a] & wins[b])
            if shared:
                exp[(a, b)] = shared
    got = {
        (r.src_a, r.src_b): r
        for r in source_overlap_matrix(spark, SF_DIR).collect()
    }
    assert set(got) == set(exp)
    for (a, b), r in got.items():
        assert r.shared_windows == exp[(a, b)]
        assert r.n_a == len(wins[a]) and r.n_b == len(wins[b])
        assert r.containment_a_ppm == r.shared_windows * 1_000_000 // r.n_a
        assert r.containment_b_ppm == r.shared_windows * 1_000_000 // r.n_b


def test_domain_blocklist_suffix_semantics(spark):
    from etl_energy_tracker_spark.queries.webprep import (
        _BLOCK_PPM,
        domain_blocklist_filter,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    src = {d.doc_id: d.source for d in docs}
    occ = _window_occurrences(docs)
    cnt = defaultdict(int)
    for _, _, win in occ:
        cnt[win] += 1
    tot = defaultdict(int)
    dup = defaultdict(int)
    for doc_id, _, win in occ:
        tot[src[doc_id]] += 1
        dup[src[doc_id]] += cnt[win] >= 2
    blocked = {
        s for s in tot if dup[s] * 1_000_000 >= _BLOCK_PPM * tot[s]
    }
    assert blocked and blocked != set(tot)  # nonempty, non-total
    rows = domain_blocklist_filter(spark, SF_DIR).collect()
    assert {r.doc_id for r in rows} == set(src)
    for r in rows:
        s = src[r.doc_id]
        assert r.host == f"www.{s}.example.com"
        if s in blocked:
            # the rule matched via the host SUFFIX, not equality
            assert r.matched_rule == f"{s}.example.com"
            assert not r.kept
            assert r.host != r.matched_rule
            assert r.host.endswith("." + r.matched_rule)
        else:
            assert r.matched_rule is None and r.kept
