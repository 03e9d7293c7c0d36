"""Invariant tests for the round-4 continuation LLM-prep operators
(queries/llmprep.py). The driver oracle gate checks value equality;
these pin the *semantic* invariants each operator promises, plus the
plan shapes the scale story depends on.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from etl_energy_tracker_spark.queries.llmprep import (
    _BPE_TOP,
    _CHUNK_S,
    _CHUNK_W,
    _CONTAIN_TAU,
    _SEM_TAU,
    bpe_merge_pair_counts,
    doc_chunk_windows,
    length_band_trim,
    semdedup_prune,
    shingle_containment_pairs,
)
from etl_energy_tracker_spark.queries.textops import ngram_jaccard_pairs

from conftest import SF_DIR


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return round(dot / (na * nb), 6)


def test_semdedup_no_kept_pair_above_tau(spark):
    # after pruning, no two surviving docs in the same cluster may be
    # within tau of each other (the greedy lowest-id-wins guarantee)
    kept = semdedup_prune(spark, SF_DIR).collect()
    emb = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    by_cell: dict[int, list[int]] = {}
    for r in kept:
        by_cell.setdefault(r.cell, []).append(r.vec_id)
    for cell, ids in by_cell.items():
        ids.sort()
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                assert _cos(emb[a], emb[b]) < _SEM_TAU, (cell, a, b)
    # and something must actually have been pruned on this corpus
    assert len(kept) < len(emb)


def test_semdedup_keeps_lowest_id_per_cluster(spark):
    # the lowest vec_id of every cluster has no lower-id cluster-mate,
    # so it can never be dropped
    kept = {r.vec_id for r in semdedup_prune(spark, SF_DIR).collect()}
    from etl_energy_tracker_spark.operators.similarity import with_ivf_cell
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cent = emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 116)).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
    )
    assigned = with_ivf_cell(emb, cent, "embedding", "vec_id", n_probe=1)
    firsts = (
        assigned.groupBy("cell").agg(F.min("vec_id").alias("first_id")).collect()
    )
    for r in firsts:
        assert r.first_id in kept


def test_chunk_windows_cover_and_conserve(spark):
    rows = doc_chunk_windows(spark, SF_DIR).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, text in docs.items():
        toks = re.split(r"\s+", text.strip())
        n = len(toks)
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
        # chunk count = number of stride starts inside the doc
        assert len(chunks) == (n - 1) // _CHUNK_S + 1
        # per-chunk token counts follow min(W, n - start)
        for c in chunks:
            start = c.chunk_id * _CHUNK_S
            assert c.n_chunk_tokens == min(_CHUNK_W, n - start)
        # the final chunk reaches the last token (full coverage)
        last = chunks[-1]
        assert last.chunk_id * _CHUNK_S + last.n_chunk_tokens == n


def test_bpe_pair_counts_match_python_counter(spark):
    got = bpe_merge_pair_counts(spark, SF_DIR).collect()
    assert len(got) == _BPE_TOP
    texts = [
        r.text for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ]
    counter: Counter[str] = Counter()
    for t in texts:
        for w in re.findall(r"[a-z]+", t.lower()):
            for i in range(len(w) - 1):
                counter[w[i : i + 2]] += 1
    expected = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:_BPE_TOP]
    assert [(r.pair, r.cnt) for r in got] == expected or {
        (r.pair, r.cnt) for r in got
    } == set(expected)


def test_containment_dominates_jaccard(spark):
    # containment uses min(|A|,|B|) in the denominator, Jaccard uses
    # the union — so for any pair surfaced by both, containment >= jaccard
    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in shingle_containment_pairs(spark, SF_DIR).collect()
    }
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(spark, SF_DIR).collect()
    }
    assert cont, "no containment pairs on test corpus"
    for pair, c in cont.items():
        assert _CONTAIN_TAU <= c <= 1.0
        if pair in jac:
            assert c >= jac[pair] - 1e-6
    # every exact-duplicate Jaccard pair (j ~= 1) must also be a
    # containment pair
    for pair, j in jac.items():
        if j >= 0.999:
            assert pair in cont


def test_length_band_trim_bounds(spark):
    kept = length_band_trim(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    ).collect()
    by_lang: dict[str, list] = {}
    for r in docs:
        by_lang.setdefault(r.lang, []).append((r.n_chars, r.doc_id))
    kept_by_lang: dict[str, set] = {}
    for r in kept:
        kept_by_lang.setdefault(r.lang, set()).add(r.doc_id)
    for lang, rows in by_lang.items():
        rows.sort()
        cnt = len(rows)
        expected = {
            doc_id
            for rn, (_, doc_id) in enumerate(rows, start=1)
            if rn * 20 > cnt and (cnt - rn) * 20 >= cnt
        }
        assert kept_by_lang.get(lang, set()) == expected, lang


def test_fuzzy_decontaminate_catches_planted_contamination(spark):
    from etl_energy_tracker_spark.operators.dedup import fuzzy_decontaminate

    bench_text = "the quick brown fox jumps over the lazy dog every day"
    near_dup = "the quick brown fox jumps over the lazy dog every night"
    unrelated = "completely different content about spark partition tuning"
    corpus = spark.createDataFrame(
        [(1, near_dup), (2, unrelated), (3, bench_text)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    got = {
        (r.doc_id, r.bench_id): r.jaccard
        for r in fuzzy_decontaminate(corpus, bench, "doc_id", "text").collect()
    }
    # the verbatim copy must flag with jaccard 1.0
    assert got.get((3, 100)) == 1.0
    # the one-word paraphrase shares most shingles -> flagged
    assert (1, 100) in got and got[(1, 100)] >= 0.3
    # unrelated text must not flag
    assert (2, 100) not in got


def test_mapside_cell_assignment_matches_window_variant(spark):
    # the literal-codebook argmax must agree row-for-row with the
    # broadcast-join + window formulation (same rounding, same
    # lowest-centroid-id tie rule) — and carry no Exchange in its plan
    from pyspark.sql import functions as F

    from etl_energy_tracker_spark.operators.similarity import (
        with_ivf_cell,
        with_ivf_cell_mapside,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cent = emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 116)).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
    )
    windowed = {
        r.vec_id: r.cell
        for r in with_ivf_cell(emb, cent, "embedding", "vec_id", n_probe=1).collect()
    }
    mapside_df = with_ivf_cell_mapside(emb, cent, "embedding")
    mapside = {r.vec_id: r.cell for r in mapside_df.select("vec_id", "cell").collect()}
    assert mapside == windowed
    plan = mapside_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    # zero-norm vector: cosine is NULL against every centroid; both
    # variants must agree (window's NULLS LAST rank-1 row is the lowest
    # centroid_id — the fold's initial accumulator must match, not -1)
    dim = len(emb.first()["embedding"])
    zero = spark.createDataFrame(
        [(999_999, [0.0] * dim)], "vec_id long, embedding array<double>"
    )
    both = emb.select("vec_id", F.col("embedding").cast("array<double>")).unionByName(zero)
    w0 = {r.vec_id: r.cell for r in with_ivf_cell(both, cent, "embedding", "vec_id", n_probe=1).collect()}
    m0 = {r.vec_id: r.cell for r in with_ivf_cell_mapside(both, cent, "embedding").collect()}
    assert m0 == w0
    assert m0[999_999] == cent.agg(F.min("centroid_id")).first()[0]


def test_chunk_windows_plan_is_shuffle_free(spark):
    plan = doc_chunk_windows(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_bpe_train_merges_matches_reference_python(spark):
    """The learned merge table must equal the classic BPE training
    loop (Sennrich et al.) run independently in Python: count adjacent
    symbol pairs weighted by word frequency, merge the argmax pair
    greedily left-to-right, repeat."""
    import re
    from collections import Counter

    from etl_energy_tracker_spark.queries.llmprep import (
        _BPE_ROUNDS,
        bpe_train_merges,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    wf = Counter(
        w for r in docs for w in re.findall("[a-z]+", r["text"].lower())
    )
    syms = {w: [list(w), f] for w, f in wf.items()}

    expected = []
    for rnd in range(_BPE_ROUNDS):
        pc = Counter()
        for s, f in syms.values():
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        (p1, p2), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((rnd, p1, p2, p1 + p2, cnt))
        for v in syms.values():
            s = v[0]
            out = []
            for x in s:
                if out and out[-1] == p1 and x == p2:
                    out[-1] = p1 + p2
                else:
                    out.append(x)
            v[0] = out

    got = sorted(
        (r["merge_round"], r["p1"], r["p2"], r["merged"], r["cnt"])
        for r in bpe_train_merges(spark, SF_DIR).collect()
    )
    assert got == expected
    # merges are genuinely iterative: at least one later merge builds
    # on an earlier merged symbol OR counts strictly decrease
    cnts = [e[4] for e in expected]
    assert cnts == sorted(cnts, reverse=True) or any(
        len(e[1]) > 1 or len(e[2]) > 1 for e in expected[1:]
    )


def test_bpe_encode_corpus_matches_reference_python(spark):
    """Encoding under the trained merges must equal the classic loop's
    final symbol table: same merge sequence, then token frequency =
    sum of word frequencies over every occurrence in every word, and
    n_words = distinct words containing the token."""
    import re
    from collections import Counter

    from etl_energy_tracker_spark.queries.llmprep import (
        _BPE_ROUNDS,
        bpe_encode_corpus,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    wf = Counter(
        w for r in docs for w in re.findall("[a-z]+", r["text"].lower())
    )
    syms = {w: [list(w), f] for w, f in wf.items()}
    for _ in range(_BPE_ROUNDS):
        pc = Counter()
        for s, f in syms.values():
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        (p1, p2), _cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        for v in syms.values():
            s, out = v[0], []
            for x in s:
                if out and out[-1] == p1 and x == p2:
                    out[-1] = p1 + p2
                else:
                    out.append(x)
            v[0] = out

    total = Counter()
    nwords = Counter()
    for w, (s, f) in syms.items():
        for tok in s:
            total[tok] += f
        for tok in set(s):
            nwords[tok] += 1

    got = sorted(
        (r["token"], r["total_cnt"], r["n_words"])
        for r in bpe_encode_corpus(spark, SF_DIR).collect()
    )
    expected = sorted((t, total[t], nwords[t]) for t in total)
    assert got == expected
    # the merge products must actually appear in the encoded corpus
    assert any(len(t) > 1 for t, _, _ in got)
