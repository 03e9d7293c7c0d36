"""Corpus-preparation operator tests (queries/corpusops.py).

The oracle matrix (tools/check_correctness.py) proves value parity
with DuckDB; these tests pin the *semantic invariants* — split
stability under corpus growth, sampling monotonicity, decontamination
completeness — and the plan shapes that matter at 100 TB (benchmark
set broadcast, no corpus-side shuffle before the final agg).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_energy_tracker_spark.queries.corpusops import (
    corpus_prep_e2e,
    decontaminate_ngrams,
    pii_scrub,
    stratified_sample_docs,
    train_val_test_split,
)

from conftest import SF_DIR


def test_split_is_total_and_stable(spark):
    out = train_val_test_split(spark, SF_DIR)
    rows = {r["doc_id"]: (r["bucket"], r["split"]) for r in out.collect()}
    n = len(rows)
    assert n > 0
    # every doc labeled, buckets in range, label consistent with bucket
    for bucket, split in rows.values():
        assert 0 <= bucket < 100
        assert split == ("train" if bucket < 90 else "val" if bucket < 95 else "test")
    # deterministic: second evaluation identical (no rand() anywhere)
    again = {r["doc_id"]: (r["bucket"], r["split"]) for r in
             train_val_test_split(spark, SF_DIR).collect()}
    assert rows == again
    # roughly 90/5/5 (hash-uniform; generous tolerance for small N)
    train = sum(1 for _, s in rows.values() if s == "train")
    assert 0.8 * n <= train <= 0.97 * n


def test_split_stable_under_growth(spark):
    """A document's split must not change when the corpus grows —
    the property rand()/row-order splits lack."""
    full = train_val_test_split(spark, SF_DIR)
    subset_ids = [r["doc_id"] for r in full.limit(20).collect()]
    sub = {r["doc_id"]: r["split"] for r in
           full.where(F.col("doc_id").isin(subset_ids)).collect()}
    full_map = {r["doc_id"]: r["split"] for r in full.collect()}
    assert all(full_map[d] == s for d, s in sub.items())


def test_stratified_sample_monotone(spark):
    """Kept docs are exactly {bucket < rate(lang)} — so raising a rate
    only adds documents, never swaps them."""
    out = stratified_sample_docs(spark, SF_DIR).collect()
    assert len(out) > 0
    for r in out:
        assert r["bucket"] < (20 if r["lang"] == "en" else 50)
    # en downsampled harder than the rest
    split_all = {r["doc_id"]: r["bucket"] for r in
                 train_val_test_split(spark, SF_DIR).collect()}
    kept = {r["doc_id"] for r in out}
    # no doc with bucket >= 50 is ever kept
    assert all(split_all[d] < 50 for d in kept)


def test_decontaminate_flags_shared_grams(spark):
    out = {r["doc_id"]: r["n_shared_grams"]
           for r in decontaminate_ngrams(spark, SF_DIR).collect()}
    # benchmark docs themselves never appear
    assert all(d % 50 != 0 for d in out)
    assert all(n >= 1 for n in out.values())


def test_decontaminate_broadcasts_benchmark(spark):
    plan = decontaminate_ngrams(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # benchmark gram set is the built side


def test_pii_scrub_counts_and_masking(spark):
    rows = {r["doc_id"]: r for r in pii_scrub(spark, SF_DIR).collect()}
    for d, r in rows.items():
        assert r["n_emails"] == (1 if d % 7 == 0 else 0)
        assert r["n_phones"] == (1 if d % 11 == 0 else 0)
    # hash differs between scrubbed/unscrubbed only when PII was planted:
    # doc 0 gets both email+phone, doc 1 gets neither
    assert 0 in rows and 1 in rows


def test_corpus_prep_e2e_partitions_corpus(spark):
    out = {r["split"]: r for r in corpus_prep_e2e(spark, SF_DIR).collect()}
    assert set(out) <= {"train", "val", "test"}
    n_clean = sum(r["n_docs"] for r in out.values())
    # the chain only removes docs: clean <= corpus (benchmark excluded)
    from etl_energy_tracker_spark.sources.registry import load_table

    n_corpus = load_table(spark, "documents", SF_DIR).where(
        F.col("doc_id") % 50 != 0
    ).count()
    assert 0 < n_clean <= n_corpus
    assert all(r["total_tokens"] > 0 for r in out.values())


@pytest.mark.parametrize("fn", [train_val_test_split, stratified_sample_docs, pii_scrub])
def test_map_only_ops_have_no_shuffle(spark, fn):
    """Split/sample/scrub are map-only: no Exchange in the plan."""
    plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_intra_doc_dedup_semantics(spark):
    from etl_energy_tracker_spark.queries.corpusops import intra_doc_dedup

    out = intra_doc_dedup(spark, SF_DIR)
    rows = out.collect()
    assert all(r["n_unique_chunks"] <= r["n_chunks"] for r in rows)
    # map-only: zero Exchange in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_cluster_balanced_sample_caps_cells(spark):
    from collections import Counter

    from etl_energy_tracker_spark.queries.vectorops import cluster_balanced_sample

    rows = cluster_balanced_sample(spark, SF_DIR).collect()
    per_cell = Counter(r["cell"] for r in rows)
    assert per_cell and all(n <= 20 for n in per_cell.values())
    # deterministic across evaluations
    again = sorted((r["vec_id"], r["cell"]) for r in
                   cluster_balanced_sample(spark, SF_DIR).collect())
    assert again == sorted((r["vec_id"], r["cell"]) for r in rows)


def test_text_repetition_score_bounds(spark):
    from etl_energy_tracker_spark.queries.textops import text_repetition_score

    out = text_repetition_score(spark, SF_DIR)
    rows = out.collect()
    assert all(0.0 <= r["dup_gram_ratio"] <= 1.0 for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only


def test_composition_report_levels_consistent(spark):
    """Grand total = 100% of tokens; every grouping level sums to the
    same doc/token totals; gid disambiguates subtotal rows."""
    from etl_energy_tracker_spark.queries.corpusops import (
        corpus_composition_report,
    )

    rows = corpus_composition_report(spark, SF_DIR).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    # exactly one grand-total row at 100% token share (integer ppm)
    (total,) = by_gid[3]
    assert total["lang"] == "ALL" and total["source"] == "ALL"
    assert total["tokens_ppm"] == 1_000_000
    # each level partitions the corpus: doc and token sums match the total
    for gid in (0, 1, 2):
        assert sum(r["n_docs"] for r in by_gid[gid]) == total["n_docs"]
        assert sum(r["n_tokens"] for r in by_gid[gid]) == total["n_tokens"]


def test_composition_report_plan_broadcasts_total(spark):
    """The grand-total scalar joins as a broadcast (1-row side), never
    a shuffled join; the cube agg is the only hash-partitioned
    exchange on the corpus side."""
    from etl_energy_tracker_spark.queries.corpusops import (
        corpus_composition_report,
    )

    plan = (
        corpus_composition_report(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# ------------------------------------------- round-2 late additions

def test_token_budget_packing_conserves_and_fills(spark):
    from etl_energy_tracker_spark.queries.corpusops import (
        _PACK_BUDGET,
        token_budget_packing,
    )
    from etl_energy_tracker_spark.sources.registry import load_table

    out = token_budget_packing(spark, SF_DIR).collect()
    docs = load_table(spark, "documents", SF_DIR)
    total = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
    ).first()[0]
    # token totals conserved across shards
    assert sum(r["shard_tokens"] for r in out) == total
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, shards in by_lang.items():
        shards.sort(key=lambda r: r["shard_id"])
        # shard ids contiguous from 0
        assert [r["shard_id"] for r in shards] == list(range(len(shards)))
        # packing boundary: docs in shards 0..k all start below (k+1)*B,
        # so their cumulative token mass is at least (k+1)*B for every
        # non-final shard k
        cum = 0
        for k, r in enumerate(shards[:-1]):
            cum += r["shard_tokens"]
            assert cum >= (k + 1) * _PACK_BUDGET


def test_deterministic_shuffle_is_a_permutation(spark):
    from etl_energy_tracker_spark.queries.corpusops import (
        deterministic_shuffle,
    )

    rows = deterministic_shuffle(spark, SF_DIR).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))  # every doc exactly once
    by_bucket = {}
    for r in rows:
        assert 0 <= r["bucket"] < 64
        by_bucket.setdefault(r["bucket"], []).append(r["pos"])
    for positions in by_bucket.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # deterministic across evaluations
    again = {(r["doc_id"], r["bucket"], r["pos"])
             for r in deterministic_shuffle(spark, SF_DIR).collect()}
    assert again == {(r["doc_id"], r["bucket"], r["pos"]) for r in rows}


def test_quality_filter_chain_reason_consistency(spark):
    from etl_energy_tracker_spark.queries.corpusops import (
        quality_filter_chain,
    )

    rows = quality_filter_chain(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        rules = [
            ("length", not (10 <= r["n_tokens"] <= 100000)),
            ("word_length", not (200 <= r["mean_wlen_centi"] <= 800)),
            ("stopwords", r["stop_n"] < 2),
            ("repetition", r["max_freq"] * 5 > r["n_tokens"]),
        ]
        failed = [name for name, bad in rules if bad]
        assert r["keep"] == (0 if failed else 1)
        assert r["reason"] == (failed[0] if failed else "pass")


def test_boilerplate_ngrams_threshold(spark):
    from etl_energy_tracker_spark.queries.corpusops import (
        _doc_ngrams,
        boilerplate_ngrams,
    )
    from etl_energy_tracker_spark.sources.registry import load_table

    docs = load_table(spark, "documents", SF_DIR)
    n_docs = docs.count()
    out = {r["g"]: r["df"] for r in boilerplate_ngrams(spark, SF_DIR).collect()}
    assert out, "corpus should contain some >=1%-df grams"
    # every reported gram clears the 1% document-frequency bar...
    assert all(df * 100 >= n_docs for df in out.values())
    # ...and the report is complete: recompute df independently
    truth = {
        r["g"]: r["df"]
        for r in _doc_ngrams(docs).groupBy("g").count().withColumnRenamed("count", "df").collect()
        if r["df"] * 100 >= n_docs
    }
    assert out == truth


def test_hashed_decontamination_matches_string_variant(spark):
    """Collapsing grams to integer hashes before the join must not
    change the verdict on this corpus (the portable hash space is
    large vs the gram count; identical on both engines by design)."""
    from etl_energy_tracker_spark.queries.corpusops import (
        decontaminate_hashed_ngrams,
        decontaminate_ngrams,
    )

    by_str = {
        (r["doc_id"], r["n_shared_grams"])
        for r in decontaminate_ngrams(spark, SF_DIR).collect()
    }
    by_hash = {
        (r["doc_id"], r["n_shared_grams"])
        for r in decontaminate_hashed_ngrams(spark, SF_DIR).collect()
    }
    assert by_hash == by_str


def test_tfidf_ranks_rarer_terms_higher(spark):
    from etl_energy_tracker_spark.queries.textops import tfidf_topk_docs

    rows = tfidf_topk_docs(spark, SF_DIR).collect()
    assert rows
    by_term = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
        # score factors exactly into tf * integer idf
        assert r["score_scaled"] % r["tf"] == 0
    for term, rs in by_term.items():
        assert len(rs) <= 5
        scores = [r["score_scaled"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        # all rows of one term agree on df and on the idf factor
        assert len({r["df"] for r in rs}) == 1
        assert len({r["score_scaled"] // r["tf"] for r in rs}) == 1


def test_incremental_exact_dedup_statuses(spark):
    from etl_energy_tracker_spark.queries.corpusops import (
        incremental_exact_dedup,
    )
    from etl_energy_tracker_spark.sources.registry import load_table

    docs = load_table(spark, "documents", SF_DIR)
    rows = {r["doc_id"]: r["status"] for r in
            incremental_exact_dedup(spark, SF_DIR).collect()}
    batch = {r["doc_id"]: r["h"] for r in
             docs.where(F.col("doc_id") % 3 == 0)
                 .select("doc_id", F.md5("text").alias("h")).collect()}
    hist = {r["h"] for r in
            docs.where(F.col("doc_id") % 3 != 0)
                .select(F.md5("text").alias("h")).collect()}
    assert set(rows) == set(batch)  # every batch doc classified
    first_seen = {}
    for doc_id in sorted(batch):
        h = batch[doc_id]
        expect = ("dup_in_batch" if h in first_seen
                  else "dup_vs_corpus" if h in hist else "new")
        first_seen.setdefault(h, doc_id)
        assert rows[doc_id] == expect, doc_id


def test_bm25_length_normalization_bites(spark):
    """BM25 must differ from raw tf ordering when doc lengths differ:
    a long doc with the same tf scores below a short one."""
    from etl_energy_tracker_spark.queries.textops import bm25_topk_docs
    from etl_energy_tracker_spark.sources.registry import load_table

    rows = bm25_topk_docs(spark, SF_DIR).collect()
    assert rows
    by_term = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    for term, rs in by_term.items():
        assert len(rs) <= 5
        scores = [r["score_scaled"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(r["score_scaled"] > 0 for r in rs)
    # every score matches the closed-form integer formula exactly
    docs = load_table(spark, "documents", SF_DIR)
    toks = {r["doc_id"]: r["dl"] for r in docs.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("dl")
    ).collect()}
    n_docs = len(toks)
    total_tokens = sum(toks.values())
    for r in rows:
        dl = toks[r["doc_id"]]
        norm = 250 + (750 * dl * n_docs) // total_tokens
        sat = (r["tf"] * 22000000) // (10000 * r["tf"] + 12 * norm)
        idf = (n_docs * 1000000) // r["df"]
        assert r["score_scaled"] == idf * sat, r


# ------------------------------------------- round-3 late additions

def test_cross_doc_paragraph_dedup_global_first_occurrence(spark):
    """Each chunk survives exactly once corpus-wide; totals conserve;
    plan is window-on-chunk + doc regroup (2 exchanges, no join)."""
    from etl_energy_tracker_spark.queries.corpusops import (
        cross_doc_paragraph_dedup,
        intra_doc_dedup,
    )

    out = cross_doc_paragraph_dedup(spark, SF_DIR)
    rows = out.collect()
    assert all(0 <= r["n_kept_chunks"] <= r["n_chunks"] for r in rows)
    # cross-doc is at least as aggressive as per-doc dedup
    intra = {
        r["doc_id"]: r["n_unique_chunks"]
        for r in intra_doc_dedup(spark, SF_DIR).collect()
    }
    assert all(r["n_kept_chunks"] <= intra[r["doc_id"]] for r in rows)
    # the synthetic corpus repeats sentences across docs -> some drops
    assert any(r["n_kept_chunks"] < intra[r["doc_id"]] for r in rows)
    # count exchanges in the final plan only (AQE prints the initial
    # plan as a second section, double-counting)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 2
    assert "Join" not in final


def test_mixture_resample_targets_uniform_share(spark):
    """Over-represented languages downsample; at-or-below-target keep
    everything (rate 1e6 ppm); kept tokens respect the rate."""
    from etl_energy_tracker_spark.queries.corpusops import mixture_resample

    rows = {r["lang"]: r for r in mixture_resample(spark, SF_DIR).collect()}
    assert rows and all(0 < r["rate_ppm"] <= 1_000_000 for r in rows.values())
    assert any(r["rate_ppm"] < 1_000_000 for r in rows.values())
    # deterministic across evaluations
    again = {r["lang"]: r for r in mixture_resample(spark, SF_DIR).collect()}
    assert {(k, v["n_docs_kept"], v["kept_tokens"]) for k, v in rows.items()} == {
        (k, v["n_docs_kept"], v["kept_tokens"]) for k, v in again.items()
    }


def test_temperature_sampling_upweights_tail_sources(spark):
    """alpha = 0.5 must give smaller sources a HIGHER keep rate than
    larger ones (the point of temperature sampling), rates must be
    exactly the integer formula, and kept counts must match the
    portable-hash replay."""
    from etl_energy_tracker_spark.functions.hashing import MOD
    from etl_energy_tracker_spark.queries.corpusops import (
        temperature_mixture_sample,
    )

    rows = temperature_mixture_sample(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    ).collect()
    from collections import Counter

    c = Counter(r["source"] for r in docs)
    s_micro = {s: round((n**0.5) * 1_000_000) for s, n in c.items()}
    s_sum, n_total = sum(s_micro.values()), sum(c.values())
    for r in rows:
        expect_rate = min(
            1_000_000, s_micro[r["source"]] * (n_total // 2) * 1_000_000
            // (s_sum * c[r["source"]])
        )
        assert r["rate_ppm"] == expect_rate

    def h(text):
        acc = 7
        for ch in text:
            acc = (acc * 31 + ord(ch)) % MOD
        return acc

    kept = Counter(
        r["source"] for r in docs
        if h(f"temp:{r['doc_id']}") % 1_000_000
        < next(x["rate_ppm"] for x in rows if x["source"] == r["source"])
    )
    assert {r["source"]: r["n_kept"] for r in rows} == dict(
        {s: kept.get(s, 0) for s in c}
    )
    # monotonicity: strictly smaller source -> rate at least as high
    by_size = sorted(rows, key=lambda r: r["c_docs"])
    for a, b in zip(by_size, by_size[1:]):
        if a["c_docs"] < b["c_docs"]:
            assert a["rate_ppm"] >= b["rate_ppm"]
