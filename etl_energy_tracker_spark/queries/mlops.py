"""Round-6: optimizer statistics and training-pair assembly operators.

Two halves of "the engine feeds a model":

- the engine's own cost model needs column statistics
  (``analyze_column_stats`` — the ANALYZE TABLE shape: exact NDV,
  min/max, equi-depth histogram bounds per column, the inputs a CBO
  uses for selectivity and join-size estimates);
- a training pipeline needs assembled examples
  (``preference_pairs_assemble`` — RLHF-style chosen/rejected pairs
  per group by a deterministic quality score;
  ``skipgram_negative_samples`` — word2vec-style positive windows +
  hash-seeded negatives, aggregated to (center, other, kind)
  counts);
- and one linear-algebra scale pattern (``pca_power_iteration`` —
  two unrolled power-iteration steps for the corpus' top principal
  direction, entirely in fixed-point integer arithmetic: quantized
  embeddings, integer mat-vec, L-infinity renormalization — no
  float sum ever crosses a row boundary, so the result is
  bit-identical on any engine and any row order).

Engine-parity strategy as evalops/statops: integer micro/milli
units, truncating DIV, hash-derived pseudo-randomness, no
order-dependent float accumulation.

Ref parity: beyond-reference operators; the reference
(jcostac/ETL-Energy-Tracker) has no optimizer-stats or
training-assembly layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.hashing import duckdb_charhash, spark_charhash
from ..sources.registry import load_table
from .catalog import register
from .prepops import _HLC_W_DUCK, _HLC_W_SPARK

# -------------------------------------------- ANALYZE column stats

_ACS_COLS = ("l_quantity", "l_extendedprice", "l_discount")
_ACS_BUCKETS = 8


def _acs_duck_union() -> str:
    return " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, "
        f"CAST(FLOOR(CAST({c} AS DOUBLE) * 100) AS BIGINT) AS cents "
        f"FROM lineitem"
        for c in _ACS_COLS
    )


@register(
    "analyze_column_stats",
    oracle=f"""
    WITH long AS ({_acs_duck_union()}),
    hist AS (
        SELECT col_name, cents, COUNT(*) AS c
        FROM long GROUP BY col_name, cents
    ),
    cum AS (
        SELECT col_name, cents, c,
               SUM(c) OVER (
                   PARTITION BY col_name ORDER BY cents
               ) AS cum_c,
               SUM(c) OVER (PARTITION BY col_name) AS n
        FROM hist
    ),
    bounds AS (
        SELECT col_name, b.i AS bucket, MIN(cents) AS ub_cents
        FROM cum, (SELECT unnest(range(1, {_ACS_BUCKETS})) AS i) b
        WHERE cum_c * {_ACS_BUCKETS} >= b.i * n
        GROUP BY col_name, b.i
    ),
    stats AS (
        SELECT col_name,
               CAST(COUNT(*) AS BIGINT) AS ndv,
               CAST(SUM(c) AS BIGINT) AS n_rows,
               CAST(MIN(cents) AS BIGINT) AS min_cents,
               CAST(MAX(cents) AS BIGINT) AS max_cents
        FROM hist GROUP BY col_name
    )
    SELECT s.col_name, s.ndv, s.n_rows, s.min_cents, s.max_cents,
           CAST(b.bucket AS BIGINT) AS bucket,
           CAST(b.ub_cents AS BIGINT) AS ub_cents
    FROM stats s JOIN bounds b ON s.col_name = b.col_name
    """,
    tags=("optimizer", "stats", "tpch"),
    doc="ANALYZE TABLE column statistics for the cost-based "
    "optimizer: per numeric lineitem column, exact NDV, min/max, "
    "and 7 equi-depth histogram bounds (bound i = smallest value v "
    "with cum_count(v)*8 >= i*N — exact integer comparison, no "
    "float quantile interpolation), all on cent-quantized values. "
    "These are the selectivity/join-size inputs a CBO consumes; "
    "the equi-depth form bounds per-bucket error regardless of "
    "skew, unlike equi-width. Scale: one long-format union scan, "
    "collapse to a per-column distinct-value histogram (map-side "
    "combinable), then per-column windows over the histogram only — "
    "the ordered scan never touches raw rows; output is "
    "columns x 7 rows.",
)
def analyze_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    # ONE scan via stack() instead of a union of one scan per column —
    # the union re-read the table (and re-ran its row-group decode)
    # once per audited column; stack emits the same (col_name, cents)
    # rows from a single pass over the three columns together
    stack_args = ", ".join(
        f"'{c}', CAST(FLOOR(CAST({c} AS DOUBLE) * 100) AS BIGINT)"
        for c in _ACS_COLS
    )
    long = li.select(
        F.expr(
            f"stack({len(_ACS_COLS)}, {stack_args}) AS (col_name, cents)"
        )
    )
    hist = (
        long.groupBy("col_name", "cents")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    cum = hist.select(
        "col_name",
        "cents",
        "c",
        F.sum("c")
        .over(W.partitionBy("col_name").orderBy("cents"))
        .alias("cum_c"),
        F.sum("c").over(W.partitionBy("col_name")).alias("n"),
    )
    buckets = spark.range(1, _ACS_BUCKETS).select(
        F.col("id").cast("long").alias("bucket")
    )
    bounds = (
        cum.crossJoin(F.broadcast(buckets))
        .where(F.col("cum_c") * _ACS_BUCKETS >= F.col("bucket") * F.col("n"))
        .groupBy("col_name", "bucket")
        .agg(F.min("cents").cast("long").alias("ub_cents"))
    )
    stats = hist.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("long").alias("ndv"),
        F.sum("c").cast("long").alias("n_rows"),
        F.min("cents").cast("long").alias("min_cents"),
        F.max("cents").cast("long").alias("max_cents"),
    )
    return stats.join(bounds, "col_name").select(
        "col_name",
        "ndv",
        "n_rows",
        "min_cents",
        "max_cents",
        "bucket",
        "ub_cents",
    )


# ------------------------------------------ preference pair assembly


@register(
    "preference_pairs_assemble",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, source,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
        FROM documents
    ),
    scored AS (
        SELECT doc_id, lang, source,
               CAST(SUM({_HLC_W_DUCK}) AS BIGINT) AS score
        FROM toks GROUP BY doc_id, lang, source
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (
                   PARTITION BY lang, source
                   ORDER BY score DESC, doc_id
               ) AS rn_best,
               ROW_NUMBER() OVER (
                   PARTITION BY lang, source
                   ORDER BY score ASC, doc_id
               ) AS rn_worst,
               COUNT(*) OVER (PARTITION BY lang, source) AS n_docs
        FROM scored
    )
    SELECT b.lang, b.source,
           CAST(b.n_docs AS BIGINT) AS n_docs,
           b.doc_id AS chosen_doc, w.doc_id AS rejected_doc,
           b.score AS chosen_score, w.score AS rejected_score,
           b.score - w.score AS margin
    FROM ranked b
    JOIN ranked w ON b.lang = w.lang AND b.source = w.source
    WHERE b.rn_best = 1 AND w.rn_worst = 1 AND b.doc_id <> w.doc_id
    """,
    tags=("ml", "corpus", "assembly"),
    doc="RLHF-style preference-pair assembly: within each "
    "(lang, source) group, pair the highest-scoring document "
    "(chosen) with the lowest-scoring one (rejected) under the "
    "deterministic hashed-linear-classifier score, with doc_id "
    "tie-breaks so the pair is unique; groups with fewer than two "
    "docs (chosen == rejected) are dropped. Emits the pair plus its "
    "score margin — the weight a DPO/RM trainer would consume. "
    "Scale: one token shuffle to per-doc scores, two rank windows "
    "per bounded group key, a self-join on the group key only "
    "(2 rows per group reach it); payload text never moves.",
)
def preference_pairs_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id",
        "lang",
        "source",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
    )
    scored = (
        toks.groupBy("doc_id", "lang", "source")
        .agg(F.expr(f"CAST(SUM({_HLC_W_SPARK}) AS BIGINT)").alias("score"))
        .localCheckpoint(eager=False)
    )
    grp = W.partitionBy("lang", "source")
    ranked = scored.select(
        "*",
        F.row_number()
        .over(grp.orderBy(F.col("score").desc(), "doc_id"))
        .alias("rn_best"),
        F.row_number()
        .over(grp.orderBy(F.col("score").asc(), "doc_id"))
        .alias("rn_worst"),
        F.count(F.lit(1)).over(grp).alias("n_docs"),
    )
    best = ranked.where(F.col("rn_best") == 1).select(
        "lang",
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("doc_id").alias("chosen_doc"),
        F.col("score").alias("chosen_score"),
    )
    worst = ranked.where(F.col("rn_worst") == 1).select(
        "lang",
        "source",
        F.col("doc_id").alias("rejected_doc"),
        F.col("score").alias("rejected_score"),
    )
    return (
        best.join(worst, ["lang", "source"])
        .where(F.col("chosen_doc") != F.col("rejected_doc"))
        .select(
            "lang",
            "source",
            "n_docs",
            "chosen_doc",
            "rejected_doc",
            "chosen_score",
            "rejected_score",
            (F.col("chosen_score") - F.col("rejected_score")).alias(
                "margin"
            ),
        )
    )


# -------------------------------------- skip-gram negative sampling

_SG_OFFSETS = (1, 2)  # directed context window
_SG_NEGS = 2  # negatives per positive


@register(
    "skipgram_negative_samples",
    oracle=f"""
    WITH toksrc AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tokens
        FROM documents WHERE trim(text) <> ''
    ),
    words AS (
        SELECT doc_id, u.pos AS pos, u.w AS word FROM (
            SELECT doc_id, unnest(list_transform(
                range(1, len(tokens) + 1),
                i -> {{'pos': i, 'w': tokens[CAST(i AS INT)]}})) AS u
            FROM toksrc
        ) WHERE u.w <> ''
    ),
    vocab AS (
        SELECT word, ROW_NUMBER() OVER (
                   ORDER BY COUNT(*) DESC, word
               ) - 1 AS vid,
               COUNT(*) OVER () AS v
        FROM words GROUP BY word
    ),
    pos_pairs AS (
        SELECT c.word AS center, x.word AS other, 'pos' AS kind
        FROM words c
        CROSS JOIN (SELECT unnest([{", ".join(str(o) for o in _SG_OFFSETS)}])
                    AS o) o
        JOIN words x ON x.doc_id = c.doc_id AND x.pos = c.pos + o.o
    ),
    neg_draws AS (
        SELECT c.word AS center,
               (({duckdb_charhash("c.word")}
                 + c.doc_id * 1000003 + c.pos * 31 + k.k) % 1000000007)
                   % (SELECT MAX(v) FROM vocab) AS vid
        FROM words c,
             (SELECT unnest(range(0, {_SG_NEGS * len(_SG_OFFSETS)})) AS k) k
    ),
    neg_pairs AS (
        SELECT n.center, v.word AS other, 'neg' AS kind
        FROM neg_draws n JOIN vocab v ON v.vid = n.vid
    ),
    allp AS (
        SELECT * FROM pos_pairs UNION ALL SELECT * FROM neg_pairs
    )
    SELECT center, other, kind, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM allp GROUP BY center, other, kind
    """,
    tags=("ml", "text", "assembly"),
    doc="word2vec skip-gram training-pair assembly with negative "
    "sampling: positives are directed (center, context) pairs at "
    "offsets +1/+2 inside each document; negatives are drawn per "
    "(center position, draw index) by a deterministic polynomial "
    "hash mapped into the frequency-ranked vocabulary — the "
    "hash-seeded stand-in for word2vec's unigram-table draw, "
    "reproducible across engines and runs. Output is aggregated to "
    "(center, other, kind) counts — the exact multiset a trainer "
    "would consume, without materializing one row per pair. Scale: "
    "positives are a self-join on (doc_id, pos+offset) — "
    "co-partitioned, fan-out bounded by the window size; negatives "
    "are map-side hash draws joined to a broadcast-sized vocab; "
    "counts are map-side combinable.",
)
def skipgram_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    words = (
        docs.where(F.trim("text") != "")
        .select(
            "doc_id",
            F.posexplode(F.split(F.trim("text"), r"\s+")).alias(
                "pos0", "word"
            ),
        )
        .where(F.col("word") != "")
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
        .localCheckpoint(eager=False)
    )
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "word",
            (
                F.row_number().over(
                    W.orderBy(F.col("c").desc(), "word")
                )
                - 1
            ).alias("vid"),
        )
        .localCheckpoint(eager=False)
    )
    vsz = vocab.agg((F.max("vid") + 1).alias("vsz"))
    ctx = words.select(
        "doc_id", F.col("pos").alias("xpos"), F.col("word").alias("other")
    )
    offs = spark.createDataFrame(
        [(o,) for o in _SG_OFFSETS], "o int"
    )
    probes = words.crossJoin(F.broadcast(offs)).select(
        "doc_id",
        (F.col("pos") + F.col("o")).alias("xpos"),
        F.col("word").alias("center"),
    )
    pos_pairs = probes.join(ctx, ["doc_id", "xpos"]).select(
        "center", "other", F.lit("pos").alias("kind")
    )
    ks = spark.range(_SG_NEGS * len(_SG_OFFSETS)).select(
        F.col("id").cast("long").alias("k")
    )
    # hash each token once, THEN fan out to the k draws — the
    # polynomial charhash is O(len) and would otherwise run k times
    # per token
    hashed = words.select(
        "doc_id",
        "pos",
        "word",
        F.expr(spark_charhash("word")).alias("h"),
    )
    neg_draws = (
        hashed.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(vsz))
        .select(
            F.col("word").alias("center"),
            F.expr(
                "((h + doc_id * 1000003 + pos * 31 + k) % 1000000007) "
                "% vsz"
            ).alias("vid"),
        )
    )
    neg_pairs = neg_draws.join(F.broadcast(vocab), "vid").select(
        "center",
        F.col("word").alias("other"),
        F.lit("neg").alias("kind"),
    )
    return (
        pos_pairs.unionByName(neg_pairs)
        .groupBy("center", "other", "kind")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


# -------------------------------------------- PCA by power iteration

_PCA_D = 64


def _pca_ex_duck() -> str:
    return f"""
    SELECT vec_id, d,
           CAST(FLOOR(CAST(embedding[CAST(d AS INT)] AS DOUBLE) * 1000)
                AS BIGINT) AS ev
    FROM embeddings, (SELECT unnest(range(1, {_PCA_D + 1})) AS d) dd
    """


@register(
    "pca_power_iteration",
    oracle=f"""
    WITH ex AS ({_pca_ex_duck()}),
    dot1 AS (SELECT vec_id, SUM(ev) AS dot FROM ex GROUP BY vec_id),
    w1 AS (
        SELECT d, SUM(ev * dot) AS w
        FROM ex JOIN dot1 USING (vec_id) GROUP BY d
    ),
    m1 AS (SELECT MAX(ABS(w)) AS m FROM w1),
    v1 AS (
        SELECT d, (w * 1000) // NULLIF((SELECT m FROM m1), 0) AS v
        FROM w1
    ),
    dot2 AS (
        SELECT vec_id, SUM(ev * v) // 1000 AS dot
        FROM ex JOIN v1 USING (d) GROUP BY vec_id
    ),
    w2 AS (
        SELECT d, SUM(ev * dot) AS w
        FROM ex JOIN dot2 USING (vec_id) GROUP BY d
    ),
    m2 AS (SELECT MAX(ABS(w)) AS m FROM w2),
    v2 AS (
        SELECT d, (w * 1000) // NULLIF((SELECT m FROM m2), 0) AS v
        FROM w2
    )
    SELECT CAST(v1.d AS BIGINT) AS dim,
           CAST(v1.v AS BIGINT) AS v1_milli,
           CAST(v2.v AS BIGINT) AS v2_milli
    FROM v1 JOIN v2 ON v1.d = v2.d
    """,
    tags=("vector", "scale", "ml"),
    doc="Top principal direction by two unrolled power-iteration "
    "steps, entirely in fixed-point integers: embeddings quantized "
    "to milli-units, v0 = all-ones, each step is an integer "
    "mat-vec (dot per vector, then a per-dimension weighted sum) "
    "followed by L-infinity renormalization to milli scale — no "
    "sqrt, no float sum, so the iterate is bit-identical on any "
    "engine and any row/partition order (the property a floating "
    "power iteration on Spark does NOT have). Emits both iterates "
    "so convergence is visible. Scale: the pattern is the "
    "distributed mat-vec — one shuffle per half-step keyed by "
    "vec_id / dimension, state is one 64-vector broadcast back "
    "per iteration (bounded artifact); rows never pairwise "
    "interact. Integer headroom: |w| <= n * 1e3 * 6.4e4, inside "
    "BIGINT to ~1e8 vectors per partition-free sum.",
)
def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    ex = (
        emb.select(
            "vec_id", F.posexplode("embedding").alias("p0", "x")
        )
        .select(
            "vec_id",
            (F.col("p0") + 1).alias("d"),
            F.expr(
                "CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)"
            ).alias("ev"),
        )
        .localCheckpoint(eager=False)
    )

    def half_step(v: DataFrame | None) -> DataFrame:
        # dot per vector, then per-dimension weighted sum, then
        # L-infinity renormalization back to milli scale
        if v is None:
            dot = ex.groupBy("vec_id").agg(F.sum("ev").alias("dot"))
        else:
            dot = (
                ex.join(F.broadcast(v), "d")
                .groupBy("vec_id")
                .agg(F.expr("SUM(ev * v) DIV 1000").alias("dot"))
            )
        w = (
            ex.join(dot, "vec_id")
            .groupBy("d")
            .agg(F.sum(F.expr("ev * dot")).alias("w"))
        )
        m = w.agg(F.max(F.abs(F.col("w"))).alias("m"))
        return w.crossJoin(F.broadcast(m)).select(
            "d", F.expr("(w * 1000) DIV NULLIF(m, 0)").alias("v")
        )

    v1 = half_step(None).localCheckpoint(eager=False)
    v2 = half_step(v1)
    return v1.alias("a").join(v2.alias("b"), "d").select(
        F.col("d").cast("long").alias("dim"),
        F.col("a.v").cast("long").alias("v1_milli"),
        F.col("b.v").cast("long").alias("v2_milli"),
    )


# --------------------------------------------- join cardinality audit

# (join_name, left table, left key, right table, right key) — the
# TPC-H foreign-key joins the optimizer estimates most often
_JCA_JOINS = (
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation_region", "nation", "n_regionkey", "region", "r_regionkey"),
)


def _jca_oracle() -> str:
    selects = []
    for name, lt, lk, rt, rk in _JCA_JOINS:
        selects.append(f"""
    SELECT '{name}' AS join_name,
           (SELECT COUNT(*) FROM {lt}) AS n_left,
           (SELECT COUNT(*) FROM {rt}) AS n_right,
           (SELECT COUNT(DISTINCT {lk}) FROM {lt}) AS ndv_left,
           (SELECT COUNT(DISTINCT {rk}) FROM {rt}) AS ndv_right,
           (SELECT COUNT(*) FROM {lt} l JOIN {rt} r
             ON l.{lk} = r.{rk}) AS actual_rows""")
    union = "\n    UNION ALL\n    ".join(selects)
    # est_rows = n_left*n_right // g computed as
    # (n_left // g)*n_right + ((n_left % g)*n_right) // g — exact, and
    # intermediates stay <= GREATEST(ndv)*n_right (~2e18 at SF1000)
    # instead of n_left*n_right (~9e18, int64 wrap in Spark vs silent
    # HUGEINT promotion in DuckDB).
    return f"""
    WITH per_join AS (
    {union}
    )
    SELECT join_name,
           CAST(n_left AS BIGINT) AS n_left,
           CAST(n_right AS BIGINT) AS n_right,
           CAST(ndv_left AS BIGINT) AS ndv_left,
           CAST(ndv_right AS BIGINT) AS ndv_right,
           CAST((n_left // GREATEST(ndv_left, ndv_right)) * n_right
                + ((n_left % GREATEST(ndv_left, ndv_right)) * n_right)
                  // GREATEST(ndv_left, ndv_right) AS BIGINT)
               AS est_rows,
           CAST(actual_rows AS BIGINT) AS actual_rows,
           CAST(1000 * GREATEST(est_rows, actual_rows)
                // NULLIF(LEAST(est_rows, actual_rows), 0) AS BIGINT)
               AS q_error_milli
    FROM per_join
    """


@register(
    "join_cardinality_audit",
    oracle=_jca_oracle(),
    tags=("stats", "tpch", "optimizer"),
    doc="Join-cardinality estimation audit — the measurement behind "
    "every cost-based join order: for each TPC-H foreign-key join, "
    "compare the textbook uniform-containment estimate "
    "|A|*|B|/max(ndv_A, ndv_B) (exactly what Catalyst's CBO and "
    "ANALYZE-based planners compute from table stats, here with "
    "EXACT ndv so the audit isolates the FORMULA error, not sketch "
    "error) against the actual join cardinality, reporting the "
    "q-error (max/min ratio, milli-units) per join. On clean FK data "
    "q-error sits at 1000 (exact); drift above flags skew or "
    "integrity damage the estimator will mis-plan on — the companion "
    "to analyze_column_stats (which audits single-column stats) and "
    "fk_integrity_audit (which audits the keys themselves). All "
    "exact integer arithmetic. Scale: 7 independent co-partitioned "
    "key joins, each collapsing to one count; stats are map-side "
    "distinct aggregates. Ref parity: beyond-reference optimizer "
    "instrumentation.",
)
def join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for name, lt, lk, rt, rk in _JCA_JOINS:
        left = load_table(spark, lt, sf_dir)
        right = load_table(spark, rt, sf_dir)
        # NOTE (r12): a per-key count pre-aggregation (groupBy each side
        # to (k, cnt), join the count tables, sum cl*cr) was tried and
        # REVERTED: at bench SF the dimension side broadcasts, so the
        # raw join never shuffles the fact table, while the pre-agg
        # forces a full per-key exchange — measured 3.7 s -> 5.4 s.
        lstats = left.agg(
            F.count(F.lit(1)).cast("long").alias("n_left"),
            F.countDistinct(lk).cast("long").alias("ndv_left"),
        )
        rstats = right.agg(
            F.count(F.lit(1)).cast("long").alias("n_right"),
            F.countDistinct(rk).cast("long").alias("ndv_right"),
        )
        actual = (
            left.select(F.col(lk).alias("k"))
            .join(right.select(F.col(rk).alias("k")), "k")
            .agg(F.count(F.lit(1)).cast("long").alias("actual_rows"))
        )
        row = (
            lstats.crossJoin(F.broadcast(rstats))
            .crossJoin(F.broadcast(actual))
            .select(
                F.lit(name).alias("join_name"),
                "n_left",
                "n_right",
                "ndv_left",
                "ndv_right",
                # exact divide-before-multiply: == n_left*n_right DIV g
                # with intermediates bounded by g*n_right, not
                # n_left*n_right (int64 wrap at SF1000 lineitem joins)
                F.expr(
                    "CAST((n_left DIV GREATEST(ndv_left, ndv_right))"
                    " * n_right"
                    " + ((n_left % GREATEST(ndv_left, ndv_right))"
                    " * n_right) DIV GREATEST(ndv_left, ndv_right)"
                    " AS BIGINT)"
                ).alias("est_rows"),
                "actual_rows",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "*",
        F.expr(
            "CAST(1000 * GREATEST(est_rows, actual_rows)"
            " DIV NULLIF(LEAST(est_rows, actual_rows), 0) AS BIGINT)"
        ).alias("q_error_milli"),
    )


# ------------------------------------- logistic regression, on-engine

# Full-batch gradient descent for a 3-feature + bias logistic probe
# (predict lang = 'en' from length/punctuation/stopword ratios), run
# entirely in exact integer micro arithmetic so every engine and any
# row order produces the IDENTICAL weight trajectory:
# - features are micro ratios (BIGINT);
# - the link is the "fast sigmoid" 0.5*(1 + z/(1+|z|)) — in micro
#   units p = 500000*(z + 1e6 + |z|) // (1e6 + |z|), a single exact
#   non-negative integer division (no EXP: transcendentals are the
#   one surface where JVM Math and libm may differ by a ULP, and this
#   module's contract is bit-identical parity — pca_power_iteration
#   precedent);
# - per-step gradients are exact BIGINT sums collected as a 1-row
#   bounded artifact; the weight update (floor-divide, clamp +-1e7
#   micro) happens in Python // arithmetic, which the DuckDB oracle
#   mirrors with its floor-dividing // in unrolled step CTEs.
_LRGD_STEPS = 8
_LRGD_LR_DEN = 2  # lr = 1/2 as a floor divide of the micro gradient
_LRGD_CLAMP = 10_000_000
_LRGD_ZOFF = 40_000_000_000_000  # >= 4 * clamp * 1e6, multiple of 1e6
# English-only stoplist: the stopword-ratio feature must DISCRIMINATE
# lang='en' (a mixed EN/ES list made x3 uninformative and the probe
# collapsed to the majority class)
_LRGD_STOPS = "'the','of','and','is','was','to','in','that','it','for'"

_LRGD_FEAT_DUCK = f"""
        SELECT CAST(CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END
                    AS BIGINT) AS y6,
               CAST(1000000 AS BIGINT) AS x0,
               CAST(10000 * LEAST(len(regexp_split_to_array(trim(text),
                    '\\s+')), 100) AS BIGINT) AS x1,
               CAST(1000000 * (length(text) - length(replace(replace(
                    replace(replace(text, '.', ''), ',', ''), '!', ''),
                    '?', ''))) // GREATEST(length(text), 1)
                    AS BIGINT) AS x2,
               CAST(1000000 * len(list_filter(
                        regexp_split_to_array(trim(text), '\\s+'),
                        t -> lower(t) IN ({_LRGD_STOPS})))
                    // GREATEST(len(regexp_split_to_array(trim(text),
                        '\\s+')), 1) AS BIGINT) AS x3
        FROM documents
"""


def _lrgd_duck(steps: int) -> str:
    """Unrolled GD: w{t} is the 1-row weight CTE after step t (micro
    ints); each step scores with the previous weights and floor-
    divides the exact gradient sums."""
    parts = [
        f"rawfeat AS MATERIALIZED ({_LRGD_FEAT_DUCK})",
        # mean-center the non-bias features (floor-divide means, exact
        # ints) so the bias and slopes learn independently
        "m AS (SELECT SUM(x1) // COUNT(*) AS m1, SUM(x2) // COUNT(*) AS m2,"
        " SUM(x3) // COUNT(*) AS m3 FROM rawfeat)",
        "feat AS MATERIALIZED (SELECT y6, x0, x1 - m1 AS x1,"
        " x2 - m2 AS x2, x3 - m3 AS x3 FROM rawfeat CROSS JOIN m)",
        "w0s AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,"
        " CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3)"]
    upd = (
        "GREATEST(-{c}, LEAST({c}, {w} - (SUM((p - y6) * {x}) "
        "// (COUNT(*) * 1000000)) // {d}))"
    )
    for t in range(1, steps + 1):
        prev = f"w{t - 1}s"
        parts.append(f"""p{t} AS (
        SELECT f.*, 500000 * (z + 1000000 + ABS(z)) // (1000000 + ABS(z)) AS p
        FROM (
            SELECT f.*,
                   (w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2
                    + w.w3 * f.x3 + {_LRGD_ZOFF}) // 1000000
                    - {_LRGD_ZOFF // 1000000} AS z
            FROM feat f CROSS JOIN {prev} w
        ) f
    ),
    w{t}s AS (
        SELECT
            {upd.format(c=_LRGD_CLAMP, w="w.w0", x="x0", d=_LRGD_LR_DEN)} AS w0,
            {upd.format(c=_LRGD_CLAMP, w="w.w1", x="x1", d=_LRGD_LR_DEN)} AS w1,
            {upd.format(c=_LRGD_CLAMP, w="w.w2", x="x2", d=_LRGD_LR_DEN)} AS w2,
            {upd.format(c=_LRGD_CLAMP, w="w.w3", x="x3", d=_LRGD_LR_DEN)} AS w3
        FROM p{t} CROSS JOIN {prev} w
        GROUP BY w.w0, w.w1, w.w2, w.w3
    )""")
    return ",\n    ".join(parts)


@register(
    "logistic_regression_gd",
    oracle=f"""
    WITH {_lrgd_duck(_LRGD_STEPS)},
    scored AS (
        SELECT f.y6,
               500000 * (z + 1000000 + ABS(z)) // (1000000 + ABS(z)) AS p
        FROM (
            SELECT f.*,
                   (w.w0 * f.x0 + w.w1 * f.x1 + w.w2 * f.x2
                    + w.w3 * f.x3 + {_LRGD_ZOFF}) // 1000000
                    - {_LRGD_ZOFF // 1000000} AS z
            FROM feat f CROSS JOIN w{_LRGD_STEPS}s w
        ) f
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(w.w0 AS BIGINT) AS w0_micro,
           CAST(w.w1 AS BIGINT) AS w1_micro,
           CAST(w.w2 AS BIGINT) AS w2_micro,
           CAST(w.w3 AS BIGINT) AS w3_micro,
           CAST(1000000 * SUM(CASE WHEN (p >= 500000) = (y6 = 1000000)
                THEN 1 ELSE 0 END) // COUNT(*) AS BIGINT) AS train_acc_ppm,
           CAST(1000000 * SUM(CASE WHEN y6 = 1000000 THEN 1 ELSE 0 END)
                // COUNT(*) AS BIGINT) AS pos_rate_ppm
    FROM scored CROSS JOIN w{_LRGD_STEPS}s w
    GROUP BY w.w0, w.w1, w.w2, w.w3
    """,
    tags=("ml", "training", "corpus"),
    doc="On-engine logistic-probe training: 4 full-batch gradient-"
    "descent steps for a 3-feature + bias classifier (predict lang = "
    "'en' from capped token count, punctuation density, stopword "
    "ratio), the quality-classifier bootstrap a corpus pipeline "
    "distills from (fastText-style). Every quantity is an exact "
    "integer: micro features, the fast-sigmoid link 0.5*(1+z/(1+|z|)) "
    "as one non-negative integer division, exact BIGINT gradient "
    "sums, truncating-divide lr=1/2 updates clamped to +-10 (micro "
    "1e7; truncation = Spark DIV = DuckDB //, which TRUNCATES on "
    "negatives — not Python floor) — "
    "so the weight trajectory is bit-identical on any engine and any "
    "partitioning (pca_power_iteration's discipline; no EXP, whose "
    "ULP behavior differs between JVM Math and libm). Emits final "
    "weights, training accuracy, and class balance. On THIS synthetic "
    "corpus the text carries no lexical language signal (uniform tech "
    "vocabulary, zero punctuation), so GD provably converges to the "
    "class prior — the separable-corpus unit test proves the same "
    "loop learns (>90% acc) when signal exists. Scale: each step "
    "is one map-side scan producing a 4-value gradient aggregate "
    "(the classic data-parallel GD shape — gradients collected as a "
    "1-row bounded artifact, weights re-broadcast as literals); "
    "gradient sums stay in int64 to ~9e6 docs per 1e12 unit, "
    "noted like spearman_rank_corr's bound. Ref parity: beyond-"
    "reference ML-training layer.",
)
def logistic_regression_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    feat = docs.selectExpr(
        "CAST(CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END AS BIGINT) AS y6",
        "CAST(1000000 AS BIGINT) AS x0",
        "CAST(10000 * LEAST(size(split(trim(text), '\\\\s+')), 100)"
        " AS BIGINT) AS x1",
        "CAST(1000000 * (length(text) - length(replace(replace("
        "replace(replace(text, '.', ''), ',', ''), '!', ''), '?', '')))"
        " DIV GREATEST(length(text), 1) AS BIGINT) AS x2",
        "CAST(1000000 * size(filter(split(trim(text), '\\\\s+'),"
        f" t -> lower(t) IN ({_LRGD_STOPS})))"
        " DIV GREATEST(size(split(trim(text), '\\\\s+')), 1)"
        " AS BIGINT) AS x3",
    ).localCheckpoint(eager=False)
    # mean-center the non-bias features (floor-divide means, exact
    # ints; 1-row bounded artifact) so bias and slopes learn
    # independently — mirrors the oracle's m/feat CTEs
    mrow = feat.selectExpr(
        "SUM(x1) AS s1", "SUM(x2) AS s2", "SUM(x3) AS s3", "COUNT(*) AS n"
    ).collect()[0]
    m1 = int(mrow["s1"]) // int(mrow["n"])
    m2 = int(mrow["s2"]) // int(mrow["n"])
    m3 = int(mrow["s3"]) // int(mrow["n"])
    feat = feat.selectExpr(
        "y6", "x0", f"x1 - {m1} AS x1", f"x2 - {m2} AS x2",
        f"x3 - {m3} AS x3"
    ).localCheckpoint(eager=False)

    w = [0, 0, 0, 0]  # micro weights (bias, x1, x2, x3)
    zoff = _LRGD_ZOFF

    def z_expr() -> str:
        num = (
            f"({w[0]} * x0 + {w[1]} * x1 + {w[2]} * x2 + {w[3]} * x3"
            f" + {zoff})"
        )
        # numerator offset keeps the dividend non-negative so Spark's
        # truncating DIV and DuckDB // (both truncate) and Python floor
        # // all agree exactly
        return f"({num} DIV 1000000 - {zoff // 1000000})"

    p_expr_t = (
        "(500000 * ({z} + 1000000 + ABS({z})))"
        " DIV (1000000 + ABS({z}))"
    )
    for _ in range(_LRGD_STEPS):
        z = z_expr()
        p = p_expr_t.format(z=z)
        g = feat.selectExpr(
            f"(({p}) - y6) AS d", "x0", "x1", "x2", "x3"
        ).selectExpr(
            "SUM(d * x0) AS g0", "SUM(d * x1) AS g1",
            "SUM(d * x2) AS g2", "SUM(d * x3) AS g3",
            "COUNT(*) AS n",
        ).collect()[0]  # bounded 1-row gradient artifact per step
        n = int(g["n"])

        def tdiv(a: int, b: int) -> int:
            # truncate toward zero — DuckDB's integer `//` TRUNCATES on
            # negatives (-7 // 2 = -3), same as Spark SQL's DIV; Python's
            # // floors, which diverged by one unit per step on the
            # negative gradients at sf0.1 (caught by the belt-and-braces
            # sf0.1 oracle sweep, invisible at sf0.01)
            q = abs(a) // b
            return q if a >= 0 else -q

        for j in range(4):
            grad = tdiv(int(g[f"g{j}"]), n * 1000000)  # == oracle //
            w[j] = max(
                -_LRGD_CLAMP,
                min(_LRGD_CLAMP, w[j] - tdiv(grad, _LRGD_LR_DEN)),
            )

    z = z_expr()
    p = p_expr_t.format(z=z)
    return feat.selectExpr(
        f"({p}) AS p", "y6"
    ).selectExpr(
        "CAST(COUNT(*) AS BIGINT) AS n_docs",
        f"CAST({w[0]} AS BIGINT) AS w0_micro",
        f"CAST({w[1]} AS BIGINT) AS w1_micro",
        f"CAST({w[2]} AS BIGINT) AS w2_micro",
        f"CAST({w[3]} AS BIGINT) AS w3_micro",
        "CAST(1000000 * SUM(CASE WHEN (p >= 500000) = (y6 = 1000000)"
        " THEN 1 ELSE 0 END) DIV COUNT(*) AS BIGINT) AS train_acc_ppm",
        "CAST(1000000 * SUM(CASE WHEN y6 = 1000000 THEN 1 ELSE 0 END)"
        " DIV COUNT(*) AS BIGINT) AS pos_rate_ppm",
    )


# ---------------------------------------- Bradley-Terry MM fit

# Pairwise doubled-win counts between sources come from per-source
# score HISTOGRAMS (the Mann-Whitney trick): for ordered pair (i, j),
# 2*wins_ij = sum over the shared score grid of at_i(s) *
# (2*cum_below_j(s) + at_j(s)) — ties count half for each side, kept
# doubled so everything stays integer. w2_ij + w2_ji == 2*n_i*n_j
# exactly (pinned in pytest). Win counts are converted to per-pair
# ppm RATES before the MM fit, so the fit's integers are bounded by
# 2e6 regardless of corpus size; the histogram pass itself is exact
# to ~2e6 docs per source (w2 and 1e6*w2 inside BIGINT) — noted, not
# hidden (the spearman_rank_corr bound discipline).
_BT_SCALE = 1_000_000


@register(
    "bradley_terry_mm",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
        FROM documents
    ),
    scores AS (
        SELECT doc_id, source, CAST(SUM({_HLC_W_DUCK}) AS BIGINT) AS s
        FROM toks GROUP BY doc_id, source
    ),
    hist AS (
        SELECT source, s, CAST(COUNT(*) AS BIGINT) AS c
        FROM scores GROUP BY source, s
    ),
    srcs AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM hist
        GROUP BY source
    ),
    grid AS (
        SELECT r.source, g.s, COALESCE(h.c, 0) AS at_c,
               COALESCE(SUM(COALESCE(h.c, 0)) OVER (
                   PARTITION BY r.source ORDER BY g.s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS below_c
        FROM (SELECT DISTINCT s FROM hist) g
        CROSS JOIN (SELECT source FROM srcs) r
        LEFT JOIN hist h ON h.source = r.source AND h.s = g.s
    ),
    pairw AS (
        SELECT a.source AS si, b.source AS sj,
               CAST(SUM(a.at_c * (2 * b.below_c + b.at_c)) AS BIGINT)
                   AS w2
        FROM grid a JOIN grid b
          ON a.s = b.s AND a.source <> b.source
        GROUP BY a.source, b.source
    ),
    rates AS (
        SELECT p.si, p.sj,
               CAST({_BT_SCALE} * p.w2 // (ni.n * nj.n) AS BIGINT) AS r2
        FROM pairw p
        JOIN srcs ni ON ni.source = p.si
        JOIN srcs nj ON nj.source = p.sj
    ),
    pr AS (
        SELECT a.si, a.sj, a.r2, b.r2 AS r2rev
        FROM rates a JOIN rates b ON b.si = a.sj AND b.sj = a.si
    ),
    w1 AS (
        SELECT si AS source, CAST(SUM(r2) AS BIGINT) AS wsum,
               CAST(SUM((r2 + r2rev) * {_BT_SCALE}
                        // (2 * {_BT_SCALE})) AS BIGINT) AS d
        FROM pr GROUP BY si
    ),
    raw1 AS (
        SELECT source, wsum,
               CAST(wsum * {_BT_SCALE} // d AS BIGINT) AS raw
        FROM w1
    ),
    s1 AS (
        SELECT source, wsum,
               CAST(raw * ({_BT_SCALE} * (SELECT COUNT(*) FROM raw1))
                    // (SELECT SUM(raw) FROM raw1) AS BIGINT) AS v
        FROM raw1
    ),
    d2 AS (
        SELECT p.si AS source,
               CAST(SUM((p.r2 + p.r2rev) * {_BT_SCALE}
                        // (a.v + b.v)) AS BIGINT) AS d
        FROM pr p
        JOIN s1 a ON a.source = p.si
        JOIN s1 b ON b.source = p.sj
        GROUP BY p.si
    ),
    raw2 AS (
        SELECT w1.source,
               CAST(w1.wsum * {_BT_SCALE} // d2.d AS BIGINT) AS raw
        FROM w1 JOIN d2 ON d2.source = w1.source
    ),
    s2 AS (
        SELECT source,
               CAST(raw * ({_BT_SCALE} * (SELECT COUNT(*) FROM raw2))
                    // (SELECT SUM(raw) FROM raw2) AS BIGINT) AS v
        FROM raw2
    )
    SELECT s1.source, n.n AS n_docs,
           CAST(s1.wsum // (2 * ((SELECT COUNT(*) FROM s1) - 1))
                AS BIGINT) AS win_rate_ppm,
           s1.v AS strength1_ppm, s2.v AS strength2_ppm
    FROM s1
    JOIN srcs n ON n.source = s1.source
    JOIN s2 ON s2.source = s1.source
    """,
    tags=("ml", "eval", "corpus"),
    doc="Bradley-Terry source-strength fit by two unrolled MM "
    "iterations (Hunter 2004) — the pairwise-preference model behind "
    "reward-model and arena-style rankings, here fit to exact "
    "pairwise dominance counts of the hashed-linear-classifier doc "
    "score between sources. Doubled win counts come from per-source "
    "score histograms via the Mann-Whitney cumulative trick (never "
    "doc x doc pairs; w2_ij + w2_ji == 2*n_i*n_j exactly, pinned in "
    "pytest), are normalized to per-pair ppm rates so the MM fit's "
    "integers are bounded regardless of corpus size, and the MM "
    "update s_i' = W_i / sum_j(N_ij/(s_i+s_j)) runs in truncating "
    "integer arithmetic with per-iteration sum normalization — "
    "bit-identical on any engine and partitioning (the "
    "markov_steady_state / pca_power_iteration recipe). Scale: one "
    "token shuffle to per-doc scores, one map-side histogram "
    "collapse; the score grid is |scores| x sources rows (a bounded "
    "source dimension), the pair tables and both MM iterations live "
    "on the sources^2 table. Ref parity: beyond-reference "
    "training-eval layer (companion to preference_pairs_assemble "
    "and isotonic_calibration_pav).",
)
def bradley_terry_mm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
    )
    scores = toks.groupBy("doc_id", "source").agg(
        F.sum(F.expr(_HLC_W_SPARK)).cast("long").alias("s")
    )
    hist = (
        scores.groupBy("source", "s")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    srcs = hist.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    grid = (
        hist.select("s")
        .distinct()
        .crossJoin(srcs.select("source"))
        .join(hist, ["source", "s"], "left")
        .select(
            "source",
            "s",
            F.coalesce(F.col("c"), F.lit(0)).alias("at_c"),
        )
        .withColumn(
            "below_c",
            F.coalesce(
                F.sum("at_c").over(
                    W.partitionBy("source")
                    .orderBy("s")
                    .rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )
    a, b = grid.alias("a"), grid.alias("b")
    pairw = (
        a.join(
            b,
            (F.expr("a.s = b.s")) & (F.expr("a.source <> b.source")),
        )
        .groupBy(
            F.col("a.source").alias("si"), F.col("b.source").alias("sj")
        )
        .agg(
            F.expr(
                "CAST(SUM(a.at_c * (2 * b.below_c + b.at_c)) AS BIGINT)"
            ).alias("w2")
        )
    )
    ni = srcs.select(F.col("source").alias("si"), F.col("n").alias("n_i"))
    nj = srcs.select(F.col("source").alias("sj"), F.col("n").alias("n_j"))
    rates = (
        pairw.join(ni, "si")
        .join(nj, "sj")
        .select(
            "si",
            "sj",
            F.expr(f"CAST({_BT_SCALE} * w2 DIV (n_i * n_j) AS BIGINT)").alias(
                "r2"
            ),
        )
        .localCheckpoint(eager=False)
    )
    rev = rates.select(
        F.col("si").alias("sj"),
        F.col("sj").alias("si"),
        F.col("r2").alias("r2rev"),
    )
    pr = rates.join(rev, ["si", "sj"]).localCheckpoint(eager=False)
    w1 = pr.groupBy(F.col("si").alias("source")).agg(
        F.sum("r2").cast("long").alias("wsum"),
        F.expr(
            f"CAST(SUM((r2 + r2rev) * {_BT_SCALE} DIV (2 * {_BT_SCALE}))"
            " AS BIGINT)"
        ).alias("d"),
    )
    raw1 = w1.select(
        "source",
        "wsum",
        F.expr(f"CAST(wsum * {_BT_SCALE} DIV d AS BIGINT)").alias("raw"),
    )
    tot1 = raw1.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("raw").cast("long").alias("rsum"),
    )
    s1 = (
        raw1.crossJoin(F.broadcast(tot1))
        .select(
            "source",
            "wsum",
            F.expr(
                f"CAST(raw * ({_BT_SCALE} * k) DIV rsum AS BIGINT)"
            ).alias("v"),
        )
        .localCheckpoint(eager=False)
    )
    sa = s1.select(F.col("source").alias("si"), F.col("v").alias("v_i"))
    sb = s1.select(F.col("source").alias("sj"), F.col("v").alias("v_j"))
    d2 = (
        pr.join(sa, "si")
        .join(sb, "sj")
        .groupBy(F.col("si").alias("source"))
        .agg(
            F.expr(
                f"CAST(SUM((r2 + r2rev) * {_BT_SCALE} DIV (v_i + v_j))"
                " AS BIGINT)"
            ).alias("d")
        )
    )
    raw2 = w1.select("source", "wsum").join(d2, "source").select(
        "source",
        F.expr(f"CAST(wsum * {_BT_SCALE} DIV d AS BIGINT)").alias("raw"),
    )
    tot2 = raw2.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("raw").cast("long").alias("rsum"),
    )
    s2 = raw2.crossJoin(F.broadcast(tot2)).select(
        "source",
        F.expr(f"CAST(raw * ({_BT_SCALE} * k) DIV rsum AS BIGINT)").alias(
            "v2"
        ),
    )
    kcnt = s1.agg(F.count(F.lit(1)).cast("long").alias("k_all"))
    return (
        s1.join(srcs, "source")
        .join(s2, "source")
        .crossJoin(F.broadcast(kcnt))
        .select(
            "source",
            F.col("n").alias("n_docs"),
            F.expr("CAST(wsum DIV (2 * (k_all - 1)) AS BIGINT)").alias(
                "win_rate_ppm"
            ),
            F.col("v").alias("strength1_ppm"),
            F.col("v2").alias("strength2_ppm"),
        )
    )


# --------------------------- group-relative advantage (GRPO-style)

# Per-sample advantage from GROUP statistics only — the
# value-function-free policy-gradient normalization (Shao et al.
# 2024, DeepSeekMath GRPO): within each prompt group, A_i =
# (r_i - mean_g) / std_g. Identity used on both engines:
# (c - s/n) / (sqrt((n*q - s^2)) / n) = (n*c - s) / sqrt(n*q - s^2),
# with (n, s, q) = (count, sum, sum-of-squares) of integer cent
# rewards — so the numerator is exact in BIGINT-valued doubles and
# the ONLY float ops are one sqrt and one division of exact integer
# inputs (IEEE-identical on both engines, no order-dependent
# accumulation). The population variance products are formed in
# DOUBLE (exact to 2^53: |n*q| < 9e15 for n ~ 1e6 groups at cents <=
# 1e5 — stated, not hidden; past that the mean shift c - s DIV n
# keeps q small).
_GRPO_SD = (
    "SQRT(GREATEST(CAST(n AS DOUBLE) * CAST(q AS DOUBLE)"
    " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE), 0.0))"
)
_GRPO_ADV = (
    f"CASE WHEN {_GRPO_SD} = 0.0 THEN NULL ELSE "
    "CAST(FLOOR(1000.0 * (CAST(n AS DOUBLE) * CAST(cents AS DOUBLE)"
    f" - CAST(s AS DOUBLE)) / {_GRPO_SD}) AS BIGINT) END"
)


@register(
    "grpo_advantage",
    oracle=f"""
    WITH base AS (
        SELECT event_id, event_type,
               CAST(FLOOR(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    g AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s,
               CAST(SUM(cents * cents) AS BIGINT) AS q
        FROM base GROUP BY event_type
    )
    SELECT b.event_id, b.event_type, b.cents AS reward_cents,
           {_GRPO_ADV} AS advantage_milli,
           CAST(g.n AS BIGINT) AS group_n
    FROM base b JOIN g USING (event_type)
    """,
    tags=("ml", "events", "eval"),
    doc="GRPO-style group-relative advantage (Shao et al. 2024): "
    "per-sample policy-gradient advantage computed from GROUP "
    "statistics alone — A_i = (r_i - mean_group)/std_group over each "
    "prompt group's rollout rewards, the value-function-free "
    "normalization that makes best-of-n rollout batches trainable "
    "(pairs with best_of_n_curve: that op scores the selector, this "
    "one emits the training signal). Engine parity: the algebraic "
    "identity (n*c - s)/sqrt(n*q - s^2) keeps every input an exact "
    "integer-valued double; the only float ops are one IEEE sqrt and "
    "one division, so no order-dependent accumulation exists and "
    "FLOOR lands identically on both engines; a zero-variance group "
    "yields NULL advantages (every reward identical - no signal), "
    "never a division crash. Scale: one map-side-combinable per-type "
    "aggregate (3 BIGINTs), broadcast back over one co-partitioned "
    "join; per-sample output is corpus-linear by construction and "
    "the DOUBLE-exactness bound (|n*q| < 2^53) is stated in the "
    "module constant. Ref parity: beyond-reference RL-training "
    "layer.",
)
def grpo_advantage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    base = ev.select(
        "event_id",
        "event_type",
        F.expr("CAST(FLOOR(value * 100) AS BIGINT)").alias("cents"),
    )
    g = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.expr("cents * cents")).cast("long").alias("q"),
    )
    return base.join(F.broadcast(g), "event_type").select(
        "event_id",
        "event_type",
        F.col("cents").alias("reward_cents"),
        F.expr(_GRPO_ADV).alias("advantage_milli"),
        F.col("n").cast("long").alias("group_n"),
    )


# ------------------------------------------ DPO/IPO pair-loss stats

# VERDICT r10 task 7's named candidate: pair-loss statistics atop
# preference_pairs_assemble. The reward link is Bradley-Terry with
# IDENTITY strengths (p(chosen beats rejected) = s_c / (s_c + s_r))
# rather than the exp/sigmoid link: the scores are already integers,
# the BT log-loss then reduces to ln((s_c+s_r)/s_c) — computable with
# functions/portable_math.ln_rational, bit-identical on both engines,
# where a sigmoid would need exp(), a transcendental the r10 psi_drift
# 1-ulp incident showed cannot be oracle-pinned through libm. The IPO
# quadratic uses tau = 1/(2*beta) = 5 nats (beta = 0.1) against the
# log-strength margin h = ln(s_c/s_r), squared in exact micro-nat
# INTEGER arithmetic. Strengths are the pair scores shifted affinely
# to >= 1 (BT requires positive strengths; the shift is the global
# min over pair scores, one broadcast scalar).

_DPO_TAU_MICRO = 5_000_000  # tau = 5 nats = 1/(2*0.1)


def _dpo_oracle() -> str:
    from ..functions.portable_math import ln_micro_rational
    from .catalog import CATALOG

    pairs_sql = CATALOG["preference_pairs_assemble"].oracle
    bt = ln_micro_rational("sc + sr", "sc", "duckdb")
    h = ln_micro_rational("sc", "sr", "duckdb")
    return f"""
    WITH pairs AS ({pairs_sql}),
    s AS (
        SELECT lang, source, chosen_doc, rejected_doc, margin,
               chosen_score
                 - (SELECT MIN(LEAST(chosen_score, rejected_score))
                      FROM pairs) + 1 AS sc,
               rejected_score
                 - (SELECT MIN(LEAST(chosen_score, rejected_score))
                      FROM pairs) + 1 AS sr
        FROM pairs
    ),
    losses AS (
        SELECT lang, source, chosen_doc, rejected_doc, margin,
               {bt} AS bt_nll_micro,
               {h} AS h_micro,
               CAST(CASE WHEN margin > 0 THEN 1 ELSE 0 END AS BIGINT)
                   AS correct
        FROM s
    )
    SELECT lang, source, chosen_doc, rejected_doc, margin,
           bt_nll_micro, h_micro,
           CAST(((h_micro - {_DPO_TAU_MICRO})
                 * (h_micro - {_DPO_TAU_MICRO})) // 1000000 AS BIGINT)
               AS ipo_loss_micro,
           correct
    FROM losses
    """


@register(
    "dpo_pair_loss_stats",
    oracle=_dpo_oracle(),
    tags=("ml", "eval"),
    doc="DPO/IPO pair-loss statistics over the assembled preference "
    "pairs (reuses preference_pairs_assemble verbatim as its input "
    "relation on BOTH engines): per pair, the Bradley-Terry NLL "
    "under identity strengths -ln(s_c / (s_c + s_r)) = "
    "ln((s_c+s_r)/s_c), the log-strength margin h = ln(s_c/s_r), "
    "and the IPO quadratic (h - tau)^2 at tau = 1/(2 beta) = 5 nats "
    "— all in micro-nat integers through the portable bit-length "
    "range-reduced ln (no libm anywhere; the identity link replaces "
    "the sigmoid exactly so NO exp() is needed), the square taken in "
    "exact BIGINT micro arithmetic. Strengths are pair scores "
    "shifted by the global min to >= 1 (one broadcast scalar). "
    "Scale: pair table is 2 rows per (lang, source) group; the shift "
    "is a 1-row broadcast crossJoin; everything else is map-side "
    "arithmetic. Ref parity: beyond-reference eval layer.",
)
def dpo_pair_loss_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.portable_math import ln_micro_rational

    pairs = preference_pairs_assemble(spark, sf_dir).localCheckpoint(
        eager=False
    )
    smin = pairs.agg(
        F.min(F.least("chosen_score", "rejected_score")).alias("smin")
    )
    s = pairs.crossJoin(F.broadcast(smin)).select(
        "lang",
        "source",
        "chosen_doc",
        "rejected_doc",
        "margin",
        (F.col("chosen_score") - F.col("smin") + 1).alias("sc"),
        (F.col("rejected_score") - F.col("smin") + 1).alias("sr"),
    )
    losses = s.select(
        "lang",
        "source",
        "chosen_doc",
        "rejected_doc",
        "margin",
        F.expr(ln_micro_rational("sc + sr", "sc", "spark")).alias(
            "bt_nll_micro"
        ),
        F.expr(ln_micro_rational("sc", "sr", "spark")).alias("h_micro"),
        F.when(F.col("margin") > 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("correct"),
    )
    return losses.select(
        "lang",
        "source",
        "chosen_doc",
        "rejected_doc",
        "margin",
        "bt_nll_micro",
        "h_micro",
        F.expr(
            f"CAST(((h_micro - {_DPO_TAU_MICRO})"
            f" * (h_micro - {_DPO_TAU_MICRO})) DIV 1000000 AS BIGINT)"
        ).alias("ipo_loss_micro"),
        "correct",
    )


# --------------------------------- successive halving (tournament)

# The Hyperband/ASHA building block as a data operator: a tournament
# over candidates where each rung doubles the evaluation budget and
# halves the field — here suppliers compete on CUMULATIVE 1996
# revenue through month r (rung r sees r months of evidence), and
# the top ceil(n/2) by (revenue, suppkey) survive to the next rung.
# Decimal-exact cents, deterministic tie-breaks; the rank windows run
# over the SUPPLIER dimension (bounded by construction — the same
# bounded-dim argument as the tracking ops).

_SH_RUNGS = 4


def _sh_oracle() -> str:
    parts = []
    for r in range(1, _SH_RUNGS + 1):
        parts.append(f"""cum{r} AS (
        SELECT p.s,
               COALESCE(SUM(CASE WHEN m.m <= {r} THEN m.c END), 0)
                   AS cum
        FROM sup{r - 1} p LEFT JOIN mrev m ON m.s = p.s
        GROUP BY p.s
    ),
    rk{r} AS (
        SELECT s, cum,
               ROW_NUMBER() OVER (ORDER BY cum DESC, s) AS rn,
               COUNT(*) OVER () AS n
        FROM cum{r}
    ),
    sup{r} AS (SELECT s FROM rk{r} WHERE rn <= (n + 1) // 2)""")
    rounds = ",\n    ".join(parts)
    rows = "\n        UNION ALL\n        ".join(
        f"""SELECT CAST({r} AS BIGINT) AS rung,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM sup{r - 1})
                   AS n_in,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM sup{r})
                   AS n_kept,
               (SELECT CAST(MIN(cum) AS BIGINT) FROM rk{r}
                 WHERE rn <= (n + 1) // 2) AS min_kept_cents"""
        for r in range(1, _SH_RUNGS + 1)
    )
    return f"""
    WITH sup0 AS (SELECT DISTINCT l_suppkey AS s FROM lineitem),
    mrev AS (
        SELECT l_suppkey AS s, month(l_shipdate) AS m,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100)
                    AS BIGINT) AS c
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate < DATE '1996-05-01'
        GROUP BY l_suppkey, month(l_shipdate)
    ),
    {rounds}
    SELECT * FROM (
        {rows}
    ) ORDER BY rung
    """


@register(
    "successive_halving_suppliers",
    oracle=_sh_oracle(),
    tags=("ml", "iterative", "window"),
    doc="Successive halving (the Hyperband/ASHA rung loop) as a data "
    "tournament: rung r ranks the surviving suppliers on cumulative "
    "1996 revenue through month r (each rung doubles the evidence) "
    "and keeps the top ceil(n/2) by (revenue DESC, suppkey) — exact "
    "decimal cents, deterministic ties, per-rung "
    "(n_in, n_kept, min_kept_cents) trace oracle-pinned rung by "
    "rung. Scale: the monthly revenue table is one fact shuffle "
    "keyed by (supplier, month); every rung is a rank window over "
    "the SUPPLIER dimension (bounded by construction — the "
    "tracking-dim argument) + a semi-join survivor filter. Ref "
    "parity: beyond-reference ML-infra layer (the eval-scheduling "
    "primitive next to pass_at_k/best_of_n).",
)
def successive_halving_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    sup = li.select(
        F.col("l_suppkey").alias("s")
    ).distinct().localCheckpoint(eager=False)
    mrev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-05-01").cast("timestamp"))
        )
        .groupBy(
            F.col("l_suppkey").alias("s"),
            F.month("l_shipdate").alias("m"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)") * 100
            )
            .cast("long")
            .alias("c")
        )
        .localCheckpoint(eager=False)
    )
    out = None
    survivors = sup
    for r in range(1, _SH_RUNGS + 1):
        cum = (
            survivors.join(mrev, "s", "left")
            .groupBy("s")
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("m") <= r, F.col("c"))), F.lit(0)
                )
                .cast("long")
                .alias("cum")
            )
        )
        w = W.orderBy(F.desc("cum"), F.col("s"))
        rk = cum.select(
            "s",
            "cum",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
        ).localCheckpoint(eager=False)
        kept = rk.where(F.col("rn") <= F.expr("(n + 1) DIV 2"))
        stats = (
            rk.agg(
                F.lit(r).cast("long").alias("rung"),
                F.max("n").cast("long").alias("n_in"),
            )
            .crossJoin(
                F.broadcast(
                    kept.agg(
                        F.count(F.lit(1)).cast("long").alias("n_kept"),
                        F.min("cum").cast("long").alias(
                            "min_kept_cents"
                        ),
                    )
                )
            )
            .select("rung", "n_in", "n_kept", "min_kept_cents")
        )
        out = stats if out is None else out.unionByName(stats)
        survivors = kept.select("s").localCheckpoint(eager=False)
    return out.orderBy("rung")
