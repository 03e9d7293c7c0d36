"""Corpus-preparation operators — the training-data-pipeline surface
beyond per-document text analysis (textops.py): deterministic dataset
splitting, stratified sampling, benchmark decontamination, PII
scrubbing, and the chained corpus-prep flagship.

All operators are pure column expressions / hash-bucketed joins — no
Python UDFs, no cross joins, no driver-side loops. The split and
sampling decisions hash the document id (engine-portable polynomial
hash, functions/hashing.py) so they are deterministic across runs,
engines, and cluster sizes — re-running the pipeline on a grown corpus
never reassigns an existing document to a different split.

Scale notes:
- Split/sample/PII are map-only (no shuffle) — they scale linearly and
  partition-pruned reads pass straight through.
- Decontamination broadcasts the *benchmark* n-gram set (benchmarks
  are tiny — MBs — vs a 100 TB corpus), so the corpus is scanned once
  with a map-side semi join: no corpus shuffle at all.
- The e2e chain shuffles only twice (exact-dedup hash groupBy and the
  final tiny aggregate); everything else is map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import duckdb_charhash, spark_charhash
from ..sources.registry import load_table
from .catalog import register

# ---------------------------------------------------------------- split

# bucket in [0, 100) from the engine-portable hash of the doc id digits;
# 90/5/5 split. Hash-of-id (not row order, not rand()) means assignment
# is stable under corpus growth and reprocessing.
_SPARK_BUCKET = f"{spark_charhash('cast(doc_id as string)')} % 100"
_DUCK_BUCKET = f"{duckdb_charhash('CAST(doc_id AS VARCHAR)')} % 100"


@register(
    "train_val_test_split",
    oracle=f"""
    SELECT doc_id, bucket,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, {_DUCK_BUCKET} AS bucket FROM documents)
    """,
    tags=("corpus",),
    doc="Deterministic train/val/test assignment (90/5/5) by portable "
    "hash of doc_id — stable across runs, engines, and corpus growth "
    "(unlike rand() or row-order splits). Map-only, no shuffle.",
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    bucket = F.expr(_SPARK_BUCKET)
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return docs.select(
        "doc_id", bucket.cast("long").alias("bucket"), split.alias("split")
    )


@register(
    "stratified_sample_docs",
    oracle=f"""
    SELECT doc_id, lang, bucket
    FROM (SELECT doc_id, lang, {_DUCK_BUCKET} AS bucket FROM documents)
    WHERE bucket < CASE WHEN lang = 'en' THEN 20 ELSE 50 END
    """,
    tags=("corpus",),
    doc="Stratified downsampling with per-stratum rates (en 20%, other "
    "languages 50%) — the language-rebalancing step of corpus prep. "
    "Deterministic hash-bucket sampling, not rand(): the sample is "
    "reproducible and monotone under corpus growth (a kept doc stays "
    "kept). Map-only; rates live in a CASE expression (broadcast a "
    "rate dim instead when strata are data-driven).",
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    bucket = F.expr(_SPARK_BUCKET).cast("long")
    rate = F.when(F.col("lang") == "en", 20).otherwise(50)
    return (
        docs.select("doc_id", "lang", bucket.alias("bucket"))
        .where(F.col("bucket") < rate)
    )


# ------------------------------------------------------ decontamination

# word-3-gram overlap vs a held-out benchmark set (doc_id % 50 == 0 is
# the benchmark stand-in). n=3 is sized to the synthetic vocabulary;
# real decontamination uses 8-13-gram overlap — same plan, longer grams.
_NGRAM_SPARK = (
    "transform(sequence(1, greatest(size(tokens) - 2, 0)), "
    "i -> concat(tokens[i-1], ' ', tokens[i], ' ', tokens[i+1]))"
)


def _doc_ngrams(docs: DataFrame) -> DataFrame:
    # per-doc gram dedup is local — array_distinct BEFORE explode keeps
    # the whole gram build map-side (a .distinct() after explode would
    # shuffle the full corpus gram set, which at 100 TB dwarfs the data).
    # toy-SF single-file scans serialize this map stage; split first
    # (free at real scale where the scan is already multi-file)
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    toks = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("tokens"))
    # explode_outer, not explode: plain explode synthesizes a
    # size(...) > 0 filter that evaluates the whole gram transform a
    # second time (and pushes it below the repartition, serializing it
    # at toy SF); gram elements are token concats, never null, so the
    # notnull filter reproduces explode's row set exactly
    return (
        toks.select(
            "doc_id",
            F.explode_outer(F.array_distinct(F.expr(_NGRAM_SPARK))).alias("g"),
        )
        .where(F.col("g").isNotNull())
    )


_NGRAM_DUCK = """
    SELECT DISTINCT doc_id,
           unnest(list_transform(
               range(1, greatest(len(tokens) - 2, 0) + 1),
               i -> tokens[CAST(i AS INT)] || ' ' ||
                    tokens[CAST(i AS INT) + 1] || ' ' ||
                    tokens[CAST(i AS INT) + 2])) AS g
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tokens
          FROM documents)
"""


@register(
    "decontaminate_ngrams",
    oracle=f"""
    WITH grams AS ({_NGRAM_DUCK}),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0)
    SELECT doc_id, COUNT(*) AS n_shared_grams
    FROM (SELECT * FROM grams WHERE doc_id % 50 != 0) corpus
    JOIN bench USING (g)
    GROUP BY doc_id
    """,
    tags=("corpus", "dedup"),
    doc="Benchmark decontamination: corpus documents sharing any word "
    "n-gram with the held-out benchmark set, with the shared-gram "
    "count as evidence. The benchmark gram set is broadcast (eval "
    "sets are MBs vs a 100 TB corpus) so the corpus is scanned once "
    "map-side — no corpus shuffle. Mirrors the n-gram-overlap "
    "decontamination used for pre-training data hygiene.",
)
def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    grams = _doc_ngrams(docs)
    bench = (
        grams.where(F.col("doc_id") % 50 == 0).select("g").distinct()
    )
    corpus = grams.where(F.col("doc_id") % 50 != 0)
    return (
        corpus.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


# ------------------------------------------------------------ PII scrub

# The synthetic corpus carries no PII, so the query plants deterministic
# email/phone strings first (doc_id-keyed) and then proves the scrub:
# match counts plus a portable hash of the scrubbed text, so the oracle
# verifies the exact post-replacement bytes, not just the counts.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\d{3}-\d{3}-\d{4}"


@register(
    "pii_scrub",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 7 = 0
                       THEN ' contact user' || doc_id || '@example.com now'
                       ELSE '' END
               || CASE WHEN doc_id % 11 = 0
                       THEN ' call 555-123-4567' ELSE '' END AS text
        FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones,
           {duckdb_charhash(
               f"regexp_replace(regexp_replace(text, '{_EMAIL_RE}', "
               f"'[EMAIL]', 'g'), '{_PHONE_RE}', '[PHONE]', 'g')"
           )} AS scrubbed_hash
    FROM aug
    """,
    tags=("corpus", "text"),
    doc="PII scrubbing: count and mask email/phone patterns via "
    "regexp_replace (codegen'd, map-only). The test corpus is "
    "PII-free, so deterministic doc_id-keyed PII is planted first; "
    "the scrubbed text is verified byte-exactly via the portable "
    "hash, not just by match counts. DuckDB regexp_replace needs the "
    "'g' flag for parity with Spark's replace-all default.",
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        ).otherwise(""),
        F.when(F.col("doc_id") % 11 == 0, " call 555-123-4567").otherwise(""),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(aug, _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    d = docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(aug, F.lit(_EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(aug, F.lit(_PHONE_RE), F.lit(0))).alias(
            "n_phones"
        ),
        scrubbed.alias("scrubbed"),
    )
    return d.select(
        "doc_id",
        "n_emails",
        "n_phones",
        F.expr(spark_charhash("scrubbed")).alias("scrubbed_hash"),
    )


# ------------------------------------------------------------- flagship

@register(
    "corpus_prep_e2e",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, text,
               LEAST(len(tokens) * 4, 400)
               + LEAST(len(list_filter(tokens,
                     x -> x IN ('the','a','and','of','to','in','is'))) * 2000
                     // len(tokens), 400)
               + CASE WHEN length(text) BETWEEN 50 AND 5000
                      THEN 200 ELSE 0 END AS q_milli,
               len(tokens) AS n_tokens
        FROM (SELECT doc_id, text,
                     regexp_split_to_array(trim(text), '\\s+') AS tokens
              FROM documents
              WHERE doc_id % 50 != 0)
    ),
    kept AS (SELECT * FROM scored WHERE q_milli >= 500),
    dedup AS (
        SELECT * FROM (
            SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
            FROM kept
        ) WHERE doc_id = keeper
    ),
    grams AS ({_NGRAM_DUCK}),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
    contaminated AS (
        SELECT DISTINCT doc_id FROM grams JOIN bench USING (g)
        WHERE doc_id % 50 != 0
    ),
    clean AS (
        SELECT * FROM dedup
        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    )
    SELECT CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM (SELECT *, {_DUCK_BUCKET} AS bucket FROM clean)
    GROUP BY 1
    """,
    tags=("corpus", "e2e"),
    doc="Chained corpus preparation — quality filter >= 0.5, exact "
    "dedup (min-doc_id keeper per content hash), benchmark n-gram "
    "decontamination (broadcast anti join), deterministic 90/5/5 "
    "split — reduced to per-split doc and token totals. Two shuffles "
    "total at any scale: the dedup hash groupBy and the 3-row final "
    "aggregate; filter, decontamination, and split are all map-side.",
)
def corpus_prep_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    corpus = docs.where(F.col("doc_id") % 50 != 0)
    toks = corpus.withColumn("tokens", F.split(F.trim("text"), r"\s+"))
    n_tokens = F.size("tokens")
    # milli-scaled all-integer quality score: no float boundary ties at
    # the q >= 0.5 cut (the quality_filter_chain idiom)
    q_milli = (
        F.least(n_tokens * 4, F.lit(400))
        + F.least(
            F.expr("size(filter(tokens, x -> x IN "
                   "('the','a','and','of','to','in','is'))) * 2000 "
                   "DIV size(tokens)"),
            F.lit(400),
        )
        + F.when(F.length("text").between(50, 5000), 200).otherwise(0)
    )
    kept = toks.select(
        "doc_id", "text", n_tokens.alias("n_tokens"), q_milli.alias("q_milli")
    ).where(F.col("q_milli") >= 500)

    from pyspark.sql import Window as W

    keeper = F.min("doc_id").over(W.partitionBy(F.md5(F.col("text"))))
    dedup = (
        kept.withColumn("keeper", keeper)
        .where(F.col("doc_id") == F.col("keeper"))
        .drop("keeper")
    )

    grams = _doc_ngrams(docs)
    bench = grams.where(F.col("doc_id") % 50 == 0).select("g").distinct()
    contaminated = (
        grams.where(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(bench), "g")
        .select("doc_id")
        .distinct()
    )
    clean = dedup.join(contaminated, "doc_id", "left_anti")

    bucket = F.expr(_SPARK_BUCKET)
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        clean.select(split.alias("split"), "n_tokens")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


# --------------------------------------------------- intra-doc cleaning

# C4-style within-document repetition removal. The synthetic corpus has
# no newlines, so the "line" unit is a fixed 2-token chunk; a real
# pipeline splits on '\n' — same plan, different delimiter. All per-doc:
# chunking, first-occurrence dedup (array_distinct preserves encounter
# order), and rejoin are local array expressions — zero shuffle.
_CHUNK = 2
_CHUNK_SPARK = (
    f"transform(sequence(0, cast(ceil(size(tokens) / {_CHUNK}.0) as int) - 1), "
    f"j -> concat_ws(' ', slice(tokens, j * {_CHUNK} + 1, {_CHUNK})))"
)


@register(
    "intra_doc_dedup",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents
    ),
    chunks AS (
        SELECT doc_id, j,
               list_aggregate(t[CAST(j * {_CHUNK} + 1 AS INT):
                                CAST(j * {_CHUNK} + {_CHUNK} AS INT)],
                              'string_agg', ' ') AS c
        FROM toks, LATERAL (
            SELECT unnest(range(0,
                CAST(ceil(len(t) / {_CHUNK}.0) AS BIGINT))) AS j)
    ),
    firsts AS (
        SELECT doc_id, c, MIN(j) AS fj FROM chunks GROUP BY doc_id, c
    )
    SELECT f.doc_id,
           n.n_chunks,
           COUNT(*) AS n_unique_chunks,
           {duckdb_charhash("string_agg(f.c, ' ' ORDER BY f.fj)")}
               AS cleaned_hash
    FROM firsts f
    JOIN (SELECT doc_id, COUNT(*) AS n_chunks FROM chunks GROUP BY doc_id) n
      USING (doc_id)
    GROUP BY f.doc_id, n.n_chunks
    """,
    tags=("corpus", "text", "dedup"),
    doc="Within-document repetition removal (C4-style line dedup): "
    "chunk the document, drop repeated chunks keeping first "
    "occurrence, rejoin — verified byte-exactly via the portable hash "
    "of the cleaned text. Entirely per-document array expressions "
    "(array_distinct preserves encounter order): map-only, zero "
    "shuffle, embarrassingly parallel at any corpus size.",
)
def intra_doc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    d = docs.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("tokens")
    ).withColumn("chunks", F.expr(_CHUNK_SPARK))
    uniq = F.array_distinct("chunks")
    d = d.select(
        "doc_id",
        F.size("chunks").alias("n_chunks"),
        F.size(uniq).alias("n_unique_chunks"),
        F.concat_ws(" ", uniq).alias("cleaned"),
    )
    return d.select(
        "doc_id",
        "n_chunks",
        "n_unique_chunks",
        F.expr(spark_charhash("cleaned")).alias("cleaned_hash"),
    )


# ------------------------------------------- cross-document dedup

@register(
    "cross_doc_paragraph_dedup",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents
    ),
    chunks AS (
        SELECT doc_id, j,
               list_aggregate(t[CAST(j * {_CHUNK} + 1 AS INT):
                                CAST(j * {_CHUNK} + {_CHUNK} AS INT)],
                              'string_agg', ' ') AS c
        FROM toks, LATERAL (
            SELECT unnest(range(0,
                CAST(ceil(len(t) / {_CHUNK}.0) AS BIGINT))) AS j)
    ),
    ranked AS (
        SELECT doc_id, j, c,
               row_number() OVER (PARTITION BY c ORDER BY doc_id, j) AS rn
        FROM chunks
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept_chunks,
           {duckdb_charhash(
               "COALESCE(string_agg(CASE WHEN rn = 1 THEN c END, "
               "' ' ORDER BY j), '')"
           )} AS cleaned_hash
    FROM ranked GROUP BY doc_id
    """,
    tags=("corpus", "text", "dedup"),
    doc="Cross-document paragraph dedup (the RefinedWeb/CCNet exact "
    "substring-dedup shape): every chunk is kept only at its globally "
    "first occurrence — ordered by (doc_id, position) — and each "
    "document is reassembled from its surviving chunks, verified via "
    "the portable hash of the cleaned text. Two shuffles at any "
    "scale: one window partitioned by chunk content (cardinality = "
    "distinct chunks, the same key exact_dedup shuffles on) and one "
    "doc_id regroup; no joins back to the corpus. Boilerplate "
    "sentences collapse corpus-wide, not just within a document "
    "(compare `intra_doc_dedup`, the zero-shuffle per-doc variant).",
)
def cross_doc_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    # posexplode_outer + notnull: plain posexplode synthesizes a
    # size()>0 filter that re-evaluates the chunk transform in the
    # scan stage; chunk strings are concat_ws results, never null
    ch = (
        docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("tokens"))
        .withColumn("chunks", F.expr(_CHUNK_SPARK))
        .select("doc_id", F.posexplode_outer("chunks").alias("j", "c"))
        .where(F.col("c").isNotNull())
    )
    first = F.min(F.struct("doc_id", "j")).over(W.partitionBy("c"))
    tagged = ch.withColumn(
        "_keep",
        (F.col("doc_id") == first.getField("doc_id"))
        & (F.col("j") == first.getField("j")),
    )
    kept_struct = F.when(F.col("_keep"), F.struct("j", "c"))
    agg = tagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("_keep"), 1).otherwise(0)).alias("n_kept_chunks"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda x: x.getField("c"),
            ),
        ).alias("cleaned"),
    )
    return agg.select(
        "doc_id",
        "n_chunks",
        "n_kept_chunks",
        F.expr(spark_charhash("cleaned")).alias("cleaned_hash"),
    )


# ----------------------------------------------- mixture resampling

@register(
    "mixture_resample",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok
        FROM documents
    ),
    per_lang AS (
        SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS lang_tok
        FROM d GROUP BY lang
    ),
    tot AS (
        SELECT CAST(SUM(lang_tok) AS BIGINT) AS tot_tok,
               COUNT(*) AS n_langs
        FROM per_lang
    ),
    rates AS (
        SELECT lang,
               LEAST(1000000,
                     CAST((tot_tok // n_langs) * 1000000 // lang_tok
                          AS BIGINT)) AS rate_ppm
        FROM per_lang CROSS JOIN tot
    ),
    kept AS (
        SELECT d.lang, d.n_tok, r.rate_ppm
        FROM d JOIN rates r USING (lang)
        WHERE {duckdb_charhash("'mix:' || CAST(doc_id AS VARCHAR)")}
              % 1000000 < r.rate_ppm
    )
    SELECT lang, rate_ppm,
           COUNT(*) AS n_docs_kept,
           CAST(SUM(n_tok) AS BIGINT) AS kept_tokens
    FROM kept GROUP BY lang, rate_ppm
    """,
    tags=("corpus",),
    doc="Deterministic mixture resampling toward a uniform per-language "
    "token share (the domain-weighting step before training, DoReMi/"
    "Pile-style with fixed targets): per-language keep rates in "
    "integer ppm from one tiny stats aggregate, selection by portable "
    "hash of doc_id against the ppm threshold — reproducible across "
    "runs/engines/cluster sizes, no rand(), no float boundaries. Two "
    "corpus scans (stats, then map-only selection with broadcast "
    "rates) and two lang-sized shuffles; languages above target "
    "downsample, those at/below keep everything (rate caps at 1e6 "
    "ppm). At 100 TB swap the uniform target for a broadcast weights "
    "dim — same plan.",
)
def mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    d = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok"),
    )
    per_lang = d.groupBy("lang").agg(F.sum("n_tok").alias("lang_tok"))
    tot = per_lang.agg(
        F.sum("lang_tok").alias("tot_tok"), F.count(F.lit(1)).alias("n_langs")
    )
    rates = per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.least(
            F.lit(1_000_000),
            F.expr("(tot_tok DIV n_langs) * 1000000 DIV lang_tok"),
        ).alias("rate_ppm"),
    )
    hash_expr = spark_charhash("concat('mix:', cast(doc_id as string))")
    sel = F.expr(f"{hash_expr} % 1000000")
    kept = d.join(F.broadcast(rates), "lang").where(sel < F.col("rate_ppm"))
    return kept.groupBy("lang", "rate_ppm").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tok").alias("kept_tokens"),
    )


# ------------------------------------------------- composition report

@register(
    "corpus_composition_report",
    oracle="""
    WITH d AS (
        SELECT lang, source,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok,
               n_chars
        FROM documents
    ),
    tot AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS tot_tok FROM d)
    SELECT COALESCE(lang, 'ALL') AS lang,
           COALESCE(source, 'ALL') AS source,
           GROUPING(lang, source) AS gid,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(CAST(SUM(n_tok) AS BIGINT) * 1000000
                // ANY_VALUE(tot_tok) AS BIGINT) AS tokens_ppm
    FROM d CROSS JOIN tot
    GROUP BY CUBE (lang, source)
    """,
    tags=("corpus", "aggregate"),
    doc="Corpus composition report — the mixture-accounting step every "
    "training pipeline runs before sampling weights are chosen: doc / "
    "token / char totals and token share at every (lang x source) "
    "grouping-set level in ONE pass (CUBE = map-side partial aggs into "
    "a single tiny shuffle; the grand total is a broadcast 1-row cross "
    "join, the scalar-subquery shape). grouping_id disambiguates "
    "subtotal rows from real 'ALL' values.",
)
def corpus_composition_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    d = docs.select(
        "lang",
        "source",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok"),
        "n_chars",
    )
    tot = d.agg(F.sum("n_tok").alias("tot_tok"))
    return (
        d.crossJoin(F.broadcast(tot))
        .cube("lang", "source")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("n_chars").alias("total_chars"),
            # integer parts-per-million token share: engine-exact, no
            # round(double) boundary ambiguity in the hashed output
            F.expr(
                "sum(n_tok) * 1000000 DIV first(tot_tok)"
            ).alias("tokens_ppm"),
        )
        .select(
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            F.coalesce("source", F.lit("ALL")).alias("source"),
            "gid",
            "n_docs",
            "n_tokens",
            "total_chars",
            "tokens_ppm",
        )
    )


# ---------------------------------------------------- shard packing

# Greedy sequential packing: a document goes to shard
# floor(prev_cumulative_tokens / budget) within its language stratum.
# Shard boundaries are a pure function of (ordering, token counts), so
# the layout is reproducible and append-only under corpus growth at the
# tail. Reference capability generalized: the writer-side file sizing
# of lake.py (maxRecordsPerFile) lifted to token-budget semantics.
_PACK_BUDGET = 1_000  # tokens per shard at oracle scale; 100M+ in prod


@register(
    "token_budget_packing",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT lang, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS prev
        FROM d
    )
    SELECT lang, CAST(prev // {_PACK_BUDGET} AS BIGINT) AS shard_id,
           COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
    FROM c
    GROUP BY lang, shard_id
    """,
    tags=("corpus",),
    doc="Token-budget shard packing: documents are packed into "
    "fixed-token-budget training shards per language stratum "
    "(shard = exclusive-prefix-sum DIV budget), reduced to per-shard "
    "doc/token totals. The window is PARTITIONed by stratum so "
    "strata pack in parallel; at 100 TB pack per (lang, "
    "hash-bucket) instead — same plan, bounded per-task state — "
    "then one tiny groupBy. Deterministic: no rand(), no row-order "
    "dependence beyond the declared doc_id ordering.",
)
def token_budget_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    d = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
    )
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        d.withColumn("prev", prev)
        .select(
            "lang",
            F.expr(f"prev DIV {_PACK_BUDGET}").alias("shard_id"),
            "n_tokens",
        )
        .groupBy("lang", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
        )
    )


# ------------------------------------------------ deterministic shuffle

@register(
    "deterministic_shuffle",
    oracle=f"""
    WITH h AS (
        SELECT doc_id,
               {duckdb_charhash("'shuf:' || CAST(doc_id AS VARCHAR)")} AS hk
        FROM documents
    )
    SELECT doc_id, hk % 64 AS bucket,
           ROW_NUMBER() OVER (PARTITION BY hk % 64 ORDER BY hk, doc_id)
               AS pos
    FROM h
    """,
    tags=("corpus",),
    doc="Deterministic global corpus shuffle for training-order "
    "randomization: portable seeded hash of doc_id gives a "
    "pseudo-random sort key; a two-level (bucket, position-in-bucket) "
    "layout replaces a single global sort so every bucket ranks "
    "independently — 64 parallel windows, no global single-partition "
    "ordering. Reproducible across runs, engines, and cluster sizes, "
    "unlike orderBy(rand()).",
)
def deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    h = docs.select(
        "doc_id",
        F.expr(
            spark_charhash("concat('shuf:', cast(doc_id as string))")
        ).alias("hk"),
    )
    bucket = (F.col("hk") % 64).alias("bucket")
    w = W.partitionBy(F.col("hk") % 64).orderBy("hk", "doc_id")
    return h.select(
        "doc_id", bucket, F.row_number().over(w).alias("pos")
    )


# ------------------------------------------------- quality filter chain

# Gopher-style rule chain, all-integer signals so the verdict is
# bit-identical on every engine (no float boundary ties):
#   R1 length:      10 <= n_tokens <= 100000
#   R2 word length: mean token length in [2, 8] chars (centi-scaled int)
#   R3 stopwords:   >= 2 stopword occurrences
#   R4 repetition:  most frequent token <= 20% of tokens (freq*5 <= n)
_STOPWORDS = "('the','a','and','of','to','in','is')"


@register(
    "quality_filter_chain",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents
    ),
    sig AS (
        SELECT doc_id,
               len(toks) AS n_tokens,
               CAST(list_sum(list_transform(toks, x -> length(x))) * 100
                   // len(toks) AS BIGINT) AS mean_wlen_centi,
               len(list_filter(toks, x -> x IN {_STOPWORDS})) AS stop_n,
               list_max(list_transform(list_distinct(toks),
                   x -> len(list_filter(toks, y -> y = x)))) AS max_freq
        FROM t
    )
    SELECT doc_id, n_tokens, mean_wlen_centi, stop_n, max_freq,
           CASE WHEN n_tokens BETWEEN 10 AND 100000
                 AND mean_wlen_centi BETWEEN 200 AND 800
                 AND stop_n >= 2
                 AND max_freq * 5 <= n_tokens
                THEN 1 ELSE 0 END AS keep,
           CASE WHEN n_tokens NOT BETWEEN 10 AND 100000 THEN 'length'
                WHEN mean_wlen_centi NOT BETWEEN 200 AND 800
                    THEN 'word_length'
                WHEN stop_n < 2 THEN 'stopwords'
                WHEN max_freq * 5 > n_tokens THEN 'repetition'
                ELSE 'pass' END AS reason
    FROM sig
    """,
    tags=("corpus", "text"),
    doc="Gopher-style quality filter chain: document length, mean "
    "word length, stopword presence, and single-token repetition "
    "rules composed into a keep/drop verdict with the first failing "
    "rule as the drop reason. All signals are integer-valued "
    "(centi-scaled mean) so verdicts have no float boundary ties. "
    "Per-document array expressions only: map-side, zero shuffle, "
    "embarrassingly parallel at any corpus size.",
)
def quality_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    t = docs.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("toks")
    )
    sig = t.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.expr(
            "aggregate(toks, 0L, (acc, x) -> acc + length(x)) * 100"
        ).alias("sum_len_centi"),
        F.size(
            F.expr(f"filter(toks, x -> x IN {_STOPWORDS})")
        ).alias("stop_n"),
        F.expr(
            "array_max(transform(array_distinct(toks), "
            "x -> size(filter(toks, y -> y = x))))"
        ).alias("max_freq"),
    ).select(
        "doc_id",
        "n_tokens",
        F.expr("sum_len_centi DIV n_tokens").alias("mean_wlen_centi"),
        "stop_n",
        "max_freq",
    )
    ok = (
        F.col("n_tokens").between(10, 100000)
        & F.col("mean_wlen_centi").between(200, 800)
        & (F.col("stop_n") >= 2)
        & (F.col("max_freq") * 5 <= F.col("n_tokens"))
    )
    reason = (
        F.when(~F.col("n_tokens").between(10, 100000), "length")
        .when(~F.col("mean_wlen_centi").between(200, 800), "word_length")
        .when(F.col("stop_n") < 2, "stopwords")
        .when(F.col("max_freq") * 5 > F.col("n_tokens"), "repetition")
        .otherwise("pass")
    )
    return sig.select(
        "doc_id",
        "n_tokens",
        "mean_wlen_centi",
        "stop_n",
        "max_freq",
        ok.cast("int").alias("keep"),
        reason.alias("reason"),
    )


# ------------------------------------------------ boilerplate detection

@register(
    "boilerplate_ngrams",
    oracle=f"""
    WITH grams AS ({_NGRAM_DUCK}),
    tot AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT g, COUNT(*) AS df
    FROM grams CROSS JOIN tot
    GROUP BY g, n_docs
    HAVING COUNT(*) * 100 >= n_docs
    """,
    tags=("corpus", "dedup"),
    doc="Boilerplate n-gram detection: word 3-grams whose document "
    "frequency is >= 1% of the corpus (headers, footers, license "
    "blurbs — text that repeats across documents without the "
    "documents being near-duplicates). Per-doc grams are "
    "array_distinct'd BEFORE explode (map-side), so the shuffle "
    "carries one row per (doc, distinct gram); the count is a "
    "map-side-combinable document-frequency agg, and the 5% threshold "
    "is integer arithmetic (df*100 >= N). At 100 TB swap the exact "
    "count for a count-min sketch only if the gram set outgrows the "
    "shuffle — the agg shape stays the same.",
)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    grams = _doc_ngrams(docs)
    return (
        grams.crossJoin(F.broadcast(n_docs))
        .groupBy("g", "n_docs")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") * 100 >= F.col("n_docs"))
        .select("g", "df")
    )


# ------------------------------------- hashed-gram decontamination

@register(
    "decontaminate_hashed_ngrams",
    oracle=f"""
    WITH grams AS ({_NGRAM_DUCK}),
    hashed AS (
        SELECT doc_id, {duckdb_charhash("g")} AS gh FROM grams
    ),
    bench AS (SELECT DISTINCT gh FROM hashed WHERE doc_id % 50 = 0)
    SELECT doc_id, COUNT(*) AS n_shared_grams
    FROM (SELECT * FROM hashed WHERE doc_id % 50 != 0) corpus
    JOIN bench USING (gh)
    GROUP BY doc_id
    """,
    tags=("corpus", "dedup"),
    doc="Hashed-gram benchmark decontamination — the 100 TB variant of "
    "decontaminate_ngrams: grams are collapsed to fixed-width integer "
    "hashes map-side BEFORE the join, so the broadcast benchmark set "
    "and every join row carry 8 bytes instead of a gram string (for "
    "8-13-token grams that is a 10x+ shuffle/broadcast cut). Same "
    "portable polynomial hash on both engines, so collisions (FP "
    "matches) are identical and the oracle still hash-matches; prod "
    "would widen to a 64-bit space for negligible FP rate.",
)
def decontaminate_hashed_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    # coalesce marks the join key provably non-null, so the join does
    # NOT infer an isnotnull(<whole hash fold>) filter that would
    # re-evaluate the polynomial hash per row; the fold itself never
    # returns null for non-null g, so values are unchanged
    hashed = _doc_ngrams(docs).select(
        "doc_id",
        F.coalesce(F.expr(spark_charhash("g")), F.lit(0)).alias("gh"),
    )
    bench = hashed.where(F.col("doc_id") % 50 == 0).select("gh").distinct()
    corpus = hashed.where(F.col("doc_id") % 50 != 0)
    return (
        corpus.join(F.broadcast(bench), "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


# --------------------------------------------- incremental ingestion

@register(
    "incremental_exact_dedup",
    oracle="""
    WITH hist AS (
        SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 3 != 0
    ),
    batch AS (
        SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 3 = 0
    ),
    in_batch_first AS (
        SELECT doc_id, h,
               MIN(doc_id) OVER (PARTITION BY h) AS keeper
        FROM batch
    )
    SELECT b.doc_id,
           CASE WHEN b.doc_id != b.keeper THEN 'dup_in_batch'
                WHEN hist.h IS NOT NULL THEN 'dup_vs_corpus'
                ELSE 'new' END AS status
    FROM in_batch_first b LEFT JOIN hist ON b.h = hist.h
    """,
    tags=("corpus", "dedup"),
    doc="Incremental exact dedup — the daily-ingest shape: a new batch "
    "is deduplicated within itself (min-id keeper per content hash) "
    "and against the historical corpus via its content-hash index, "
    "classifying every batch doc as new / dup_in_batch / "
    "dup_vs_corpus. Only 16-byte hashes join, never document "
    "payloads; at 100 TB the history index is hash-bucketed so the "
    "daily join shuffles just the (tiny) batch side against a "
    "co-partitioned index — the full corpus is never rescanned.",
)
def incremental_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    hashed = docs.select("doc_id", F.md5("text").alias("h"))
    hist = (
        hashed.where(F.col("doc_id") % 3 != 0).select("h").distinct()
        .withColumn("in_hist", F.lit(1))
    )
    batch = hashed.where(F.col("doc_id") % 3 == 0)
    keeper = F.min("doc_id").over(W.partitionBy("h"))
    return (
        batch.withColumn("keeper", keeper)
        .join(hist, "h", "left")
        .select(
            "doc_id",
            F.when(F.col("doc_id") != F.col("keeper"), "dup_in_batch")
            .when(F.col("in_hist").isNotNull(), "dup_vs_corpus")
            .otherwise("new")
            .alias("status"),
        )
    )


# ------------------------------------- temperature mixture sampling

@register(
    "temperature_mixture_sample",
    oracle=f"""
    WITH per_src AS (
        SELECT source, COUNT(*) AS c_docs FROM documents GROUP BY source
    ),
    scaled AS (
        SELECT source, c_docs,
               CAST(ROUND(sqrt(c_docs) * 1000000) AS BIGINT) AS s_micro
        FROM per_src
    ),
    tot AS (
        SELECT CAST(SUM(s_micro) AS BIGINT) AS s_sum,
               CAST(SUM(c_docs) AS BIGINT) AS n_total
        FROM scaled
    ),
    rates AS (
        SELECT source, c_docs,
               LEAST(1000000,
                     CAST(s_micro * (n_total // 2) * 1000000
                          // (s_sum * c_docs) AS BIGINT)) AS rate_ppm
        FROM scaled CROSS JOIN tot
    )
    SELECT r.source, r.c_docs, r.rate_ppm,
           COUNT(CASE WHEN {duckdb_charhash("'temp:' || CAST(doc_id AS VARCHAR)")}
                      % 1000000 < r.rate_ppm THEN 1 END) AS n_kept
    FROM documents d JOIN rates r USING (source)
    GROUP BY r.source, r.c_docs, r.rate_ppm
    """,
    tags=("corpus",),
    doc="Temperature-based mixture sampling (the multilingual alpha-"
    "sampling recipe, alpha = 0.5): sampling weight q_i proportional "
    "to count_i^alpha, so low-resource sources are upweighted relative "
    "to their share — the standard fix for head domains drowning the "
    "tail. sqrt(count) is rounded once to integer micro-units and "
    "every downstream step (normalization, per-source keep rate "
    "toward an n_total/2 target, threshold compare against the "
    "portable doc hash) is identical integer arithmetic on both "
    "engines. One tiny per-source aggregate broadcast back + one "
    "map-side selection; at petabyte counts the rate product moves to "
    "DECIMAL(38,0) — same plan. Distinct from mixture_resample, which "
    "targets UNIFORM per-language token share with fixed targets.",
)
def temperature_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    per_src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("c_docs"))
    scaled = per_src.select(
        "source",
        "c_docs",
        F.round(F.sqrt("c_docs") * 1_000_000).cast("long").alias("s_micro"),
    )
    tot = scaled.agg(
        F.sum("s_micro").alias("s_sum"), F.sum("c_docs").alias("n_total")
    )
    rates = scaled.crossJoin(F.broadcast(tot)).select(
        "source",
        "c_docs",
        F.least(
            F.lit(1_000_000).cast("long"),
            F.expr("s_micro * (n_total DIV 2) * 1000000 DIV (s_sum * c_docs)"),
        ).alias("rate_ppm"),
    )
    hash_expr = spark_charhash("concat('temp:', cast(doc_id as string))")
    kept = F.count(F.when(F.expr(f"{hash_expr} % 1000000") < F.col("rate_ppm"), 1))
    return (
        docs.join(F.broadcast(rates), "source")
        .groupBy("source", "c_docs", "rate_ppm")
        .agg(kept.alias("n_kept"))
    )


# -------------------------------------------- content-defined chunking

# A word opens a new chunk when its content hash lands in the break
# band: P(break) = 1/_CDC_DIV, so chunks average _CDC_DIV words. The
# boundary depends only on the word itself — inserting text early in a
# document does NOT shift later chunk boundaries (the CDC property
# fixed-size windows lack), so cross-document duplicated passages land
# in identical chunks and hash-dedup finds them.
_CDC_DIV = 8


@register(
    "content_defined_chunks",
    oracle=f"""
    WITH toksrc AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tokens
        FROM documents
    ),
    words AS (
        SELECT doc_id, u.pos AS pos, u.w AS word FROM (
            SELECT doc_id, unnest(list_transform(
                range(1, len(tokens) + 1),
                i -> {{'pos': i, 'w': tokens[CAST(i AS INT)]}})) AS u
            FROM toksrc
        ) WHERE u.w <> ''
    ),
    flagged AS (
        SELECT doc_id, pos, word,
               SUM(CASE WHEN {duckdb_charhash('word')} % {_CDC_DIV} = 0
                        THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS UNBOUNDED PRECEDING) AS chunk_id
        FROM words
    ),
    chunks AS (
        SELECT doc_id, chunk_id,
               string_agg(word, ' ' ORDER BY pos) AS chunk_text
        FROM flagged GROUP BY doc_id, chunk_id
    ),
    hashed AS (
        SELECT doc_id, length(chunk_text) AS n_chars,
               {duckdb_charhash('chunk_text')} AS chunk_hash
        FROM chunks
    ),
    freq AS (
        SELECT chunk_hash, COUNT(DISTINCT doc_id) AS nd
        FROM hashed GROUP BY chunk_hash
    )
    SELECT h.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           ROUND(CAST(SUM(CASE WHEN f.nd >= 2 THEN h.n_chars ELSE 0 END) AS DOUBLE)
                 / SUM(h.n_chars), 6) AS dup_char_frac
    FROM hashed h JOIN freq f USING (chunk_hash)
    GROUP BY h.doc_id
    """,
    tags=("corpus", "dedup", "text"),
    doc="Content-defined chunking + cross-document chunk dedup (the "
    "scalable stand-in for suffix-array ExactSubstr dedup, Lee et al. "
    "2022): documents split into variable-size chunks whose "
    f"boundaries are decided by a word-content hash (avg {_CDC_DIV} "
    "words/chunk), so a passage duplicated across documents chunks "
    "identically regardless of surrounding edits; chunk hashes are "
    "grouped corpus-wide and each document reports how many of its "
    "chunks — and what fraction of its characters — are shared with "
    "at least one other document. Plan: map-side tokenize/flag, one "
    "window per doc partition for the running chunk id, one shuffle "
    "on (doc, chunk) to assemble chunk text, one shuffle on "
    "chunk_hash for the frequency table — no pairwise joins and no "
    "corpus-sized broadcast; the hash join back to per-doc stats "
    "rides the same chunk_hash partitioning. At 100 TB the chunk "
    "relation is ~corpus_words/8 rows of (hash, doc, len) — linear, "
    "with the heavy text column dropped before any exchange except "
    "the (doc,chunk) assembly, which production engines fold into "
    "the tokenizer via a streaming re-chunk (mapPartitions) when "
    "documents fit an executor.",
)
def content_defined_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..sources.registry import load_table_split

    # per-word charhash folds: split the single-file scan (registry
    # docstring) so the map stage uses every core
    docs = load_table_split(spark, "documents", sf_dir)
    words = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "word"),
        )
        .where(F.col("word") != "")
    )
    w = W.partitionBy("doc_id").orderBy("pos").rowsBetween(
        W.unboundedPreceding, 0
    )
    flagged = words.withColumn(
        "chunk_id",
        F.sum(
            F.when(
                F.expr(spark_charhash("word")) % _CDC_DIV == 0, 1
            ).otherwise(0)
        ).over(w),
    )
    chunks = flagged.groupBy("doc_id", "chunk_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda s: s["word"],
            ),
            " ",
        ).alias("chunk_text")
    )
    # coalesce: provably-non-null join key, so the hash-frequency join
    # does not infer an isnotnull(<hash fold>) filter that would
    # re-evaluate the charhash per chunk (fold is never null anyway)
    hashed = chunks.select(
        "doc_id",
        F.length("chunk_text").alias("n_chars"),
        F.coalesce(
            F.expr(spark_charhash("chunk_text")), F.lit(0)
        ).alias("chunk_hash"),
    )
    freq = hashed.groupBy("chunk_hash").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    dup = F.when(F.col("nd") >= 2, 1).otherwise(0)
    return (
        hashed.join(freq, "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(dup).cast("bigint").alias("n_dup_chunks"),
            F.round(
                F.sum(dup * F.col("n_chars")).cast("double")
                / F.sum("n_chars"),
                6,
            ).alias("dup_char_frac"),
        )
    )


# --------------------------------------------- per-group reservoir


_RES_K = 5  # sample size per group


@register(
    "reservoir_group_sample",
    oracle=f"""
    WITH hashed AS (
        SELECT source, doc_id,
               {duckdb_charhash("CAST(doc_id AS VARCHAR)", seed=11)} AS h
        FROM documents
    ),
    ranked AS (
        SELECT source, doc_id,
               row_number() OVER (PARTITION BY source
                   ORDER BY h, doc_id) AS rank
        FROM hashed
    )
    SELECT source, doc_id, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {_RES_K}
    """,
    tags=("corpus", "topk"),
    doc=f"Deterministic per-group reservoir sample (k={_RES_K} per "
    "source): rank every document by the engine-portable polynomial "
    "hash of its id and keep the k smallest per group — equivalent in "
    "distribution to uniform sampling, but reproducible across runs, "
    "engines, and cluster sizes (no RNG state, no seed file). The "
    "downsampling primitive for building balanced eval slices from a "
    "skewed corpus. Scale: hash is map-side; the per-group top-k is a "
    "bounded-heap aggregate in principle — here a window partitioned "
    "by group, which shuffles once on the group key; output is "
    "k*groups rows regardless of corpus size.",
)
def reservoir_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    hashed = docs.select(
        "source",
        "doc_id",
        F.expr(
            spark_charhash("CAST(doc_id AS STRING)", seed=11)
        ).alias("h"),
    )
    w = W.partitionBy("source").orderBy("h", "doc_id")
    return (
        hashed.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _RES_K)
        .select("source", "doc_id", F.col("rank").cast("int").alias("rank"))
    )


_PRI_K = 5  # weighted sample size per group
_PRI_SEED = 23  # independent of the uniform reservoir's seed


@register(
    "priority_sample_weighted",
    oracle=f"""
    WITH keyed AS (
        SELECT source, doc_id, n_chars + 1 AS w,
               {duckdb_charhash("CAST(doc_id AS VARCHAR)", seed=_PRI_SEED)} AS h
        FROM documents
    ),
    ranked AS (
        SELECT source, doc_id, CAST(w AS BIGINT) AS weight,
               row_number() OVER (PARTITION BY source
                   ORDER BY CAST(w * 1000000007 AS DOUBLE) / (h + 1) DESC,
                            doc_id) AS rank
        FROM keyed
    )
    SELECT source, doc_id, weight, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {_PRI_K}
    """,
    tags=("corpus", "topk"),
    doc=f"Weighted priority sample (Duffield-Lund-Thorup), k={_PRI_K} "
    "per source: each document draws a deterministic uniform u from "
    "the portable polynomial hash of its id and gets priority w/u "
    "(w = n_chars + 1); the k largest priorities per group are the "
    "sample — inclusion probability rises with weight, and the "
    "(k+1)-th priority is the Horvitz-Thompson threshold if unbiased "
    "size estimates are needed downstream. Determinism across "
    "engines: the priority is ONE integer multiply (exact in BIGINT) "
    "and ONE IEEE double division — both correctly rounded, so Spark "
    "and DuckDB order identically bit for bit; no libm "
    "transcendentals (an exp/log-based exponential-clock key would "
    "NOT be portable). Scale: map-side keying + one shuffle on the "
    "group key; output is k*groups rows regardless of corpus size.",
)
def priority_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    keyed = docs.select(
        "source",
        "doc_id",
        # explicit long: an INT n_chars would make w * 10^9 overflow
        # 32-bit under ANSI mode
        (F.col("n_chars").cast("long") + 1).alias("w"),
        F.expr(
            spark_charhash("CAST(doc_id AS STRING)", seed=_PRI_SEED)
        ).alias("h"),
    )
    win = W.partitionBy("source").orderBy(
        ((F.col("w") * F.lit(1_000_000_007)).cast("double") / (F.col("h") + 1)).desc(),
        "doc_id",
    )
    return (
        keyed.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= _PRI_K)
        .select(
            "source",
            "doc_id",
            F.col("w").cast("long").alias("weight"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


# --------------------------------------- greedy max-coverage select

_COV_K = 3  # selection rounds unrolled on both engines

_COV_SH_DUCK = """
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, greatest(len(tokens) - 2, 0) + 1),
                   i -> tokens[CAST(i AS INT)] || ' ' ||
                        tokens[CAST(i AS INT) + 1] || ' ' ||
                        tokens[CAST(i AS INT) + 2])) AS shingle
        FROM (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tokens
            FROM documents
        )
    )
"""


def _cov_rounds_duck(k: int) -> str:
    parts = []
    for r in range(k):
        not_cov = (
            f"AND shingle NOT IN (SELECT shingle FROM cov{r - 1}) " if r else ""
        )
        not_sel = (
            "AND doc_id NOT IN ("
            + " UNION ALL ".join(f"SELECT doc_id FROM p{j}" for j in range(r))
            + ") "
            if r
            else ""
        )
        cov_prev = f"SELECT shingle FROM cov{r - 1} UNION " if r else ""
        parts.append(f"""g{r} AS (
        SELECT doc_id, COUNT(*) AS gain FROM sh
        WHERE 1=1 {not_cov}{not_sel}GROUP BY doc_id
    ),
    p{r} AS (SELECT doc_id, gain FROM g{r} ORDER BY gain DESC, doc_id LIMIT 1),
    cov{r} AS (
        {cov_prev}SELECT DISTINCT shingle FROM sh JOIN p{r} USING (doc_id)
    )""")
    return ",\n    ".join(parts)


@register(
    "greedy_max_coverage",
    oracle=f"""
    WITH sh AS ({_COV_SH_DUCK}),
    {_cov_rounds_duck(_COV_K)}
    {" UNION ALL ".join(
        f"SELECT {r} AS pick_round, doc_id, CAST(gain AS BIGINT) AS gain FROM p{r}"
        for r in range(_COV_K)
    )}
    """,
    tags=("corpus", "iterative", "dedup"),
    doc=f"Greedy maximum-coverage document selection ({_COV_K} rounds "
    "unrolled): each round picks the document covering the most "
    "word-3-gram shingles not yet covered by earlier picks "
    "(deterministic gain-then-doc_id tie-break) — the classic "
    "(1-1/e)-approximate coverage-based subset selection a training "
    "pipeline uses to seed a diverse corpus sample or pick "
    "representative documents per cluster. Scale: per round one "
    "anti-join of the (doc, shingle) table against the covered set "
    "plus one aggregate and a 1-row argmax broadcast; the covered set "
    "is bounded by the selected documents' shingles (k * doc length, "
    "NOT corpus-sized), so every round is corpus-linear and the "
    "selection state stays broadcastable at any corpus size.",
)
def greedy_max_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import with_shingles

    docs = load_table(spark, "documents", sf_dir)
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    sh = (
        with_shingles(docs.select("doc_id", "text"), "text")
        .select("doc_id", F.explode_outer("shingles").alias("shingle"))
        .where(F.col("shingle").isNotNull())
        .localCheckpoint(eager=False)
    )
    covered = None
    selected = None
    picks = []
    for r in range(_COV_K):
        remaining = sh
        if covered is not None:
            remaining = remaining.join(covered, "shingle", "left_anti")
        if selected is not None:
            remaining = remaining.join(selected, "doc_id", "left_anti")
        gain = remaining.groupBy("doc_id").agg(F.count(F.lit(1)).alias("gain"))
        best = gain.orderBy(F.desc("gain"), "doc_id").limit(1)
        best = best.localCheckpoint(eager=False)
        picks.append(
            best.select(
                F.lit(r).alias("pick_round"), "doc_id",
                F.col("gain").cast("long").alias("gain"),
            )
        )
        new_cov = (
            sh.join(best.select("doc_id"), "doc_id", "left_semi")
            .select("shingle")
            .distinct()
        )
        covered = (
            new_cov if covered is None
            else covered.unionByName(new_cov).distinct()
        ).localCheckpoint(eager=False)
        sel_ids = best.select("doc_id")
        selected = (
            sel_ids if selected is None
            else selected.unionByName(sel_ids)
        ).localCheckpoint(eager=False)
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out


# -------------------------------------- interleaved training shards

_IMS_SHARDS = 8


@register(
    "interleave_mixture_shards",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, source,
               {duckdb_charhash("'shard:' || CAST(doc_id AS VARCHAR)")}
                   AS hk
        FROM documents
    ),
    assigned AS (
        SELECT source, doc_id,
               (ROW_NUMBER() OVER (
                    PARTITION BY source ORDER BY hk, doc_id
                ) - 1) % {_IMS_SHARDS} AS shard
        FROM h
    ),
    cell AS (
        SELECT shard, source,
               COUNT(*) AS n_docs,
               SUM(doc_id) AS id_checksum
        FROM assigned GROUP BY shard, source
    ),
    tot AS (
        SELECT shard, SUM(n_docs) AS shard_total FROM cell GROUP BY shard
    ),
    spread AS (
        SELECT source,
               MAX(n_docs) - MIN(n_docs) AS source_spread
        FROM cell GROUP BY source
    )
    SELECT CAST(c.shard AS BIGINT) AS shard,
           c.source,
           CAST(c.n_docs AS BIGINT) AS n_docs,
           CAST(t.shard_total AS BIGINT) AS shard_total,
           CAST(1000000 * c.n_docs // t.shard_total AS BIGINT)
               AS share_ppm,
           CAST(c.id_checksum AS BIGINT) AS id_checksum,
           CAST(s.source_spread AS BIGINT) AS source_spread
    FROM cell c
    JOIN tot t ON t.shard = c.shard
    JOIN spread s ON s.source = c.source
    """,
    tags=("corpus", "mixture", "training"),
    doc="Deterministic round-robin shard assembly for distributed "
    "training: within each source, order docs by a portable seeded "
    "hash (the deterministic_shuffle idiom — reproducible across "
    "runs, engines, and cluster sizes, unlike rand()) and deal them "
    "round-robin into N shards, so every shard receives an "
    "identically-mixed, pseudo-randomly-ordered slice of every "
    "source — the property data loaders need so each worker's shard "
    "is an unbiased sample of the mixture. Reports the (shard, "
    "source) composition matrix: doc counts, within-shard source "
    "share (ppm), an id checksum per cell (cheap cross-run shard-"
    "content equality check), and each source's max-min doc-count "
    "spread across shards (round-robin guarantees <= 1 — the audit "
    "asserts the balance rather than assuming it). Scale: the "
    "per-source row_number is a range-partitioned sort (linear, "
    "parallel across sources); everything downstream operates on "
    "the bounded shards x sources cell table. Ref parity: beyond-"
    "reference training-data assembly.",
)
def interleave_mixture_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    h = docs.select(
        "doc_id",
        "source",
        F.expr(
            spark_charhash("concat('shard:', cast(doc_id as string))")
        ).alias("hk"),
    )
    w = W.partitionBy("source").orderBy("hk", "doc_id")
    assigned = h.select(
        "source",
        "doc_id",
        ((F.row_number().over(w) - 1) % _IMS_SHARDS).alias("shard"),
    )
    cell = assigned.groupBy("shard", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
    ).localCheckpoint(eager=False)
    tot = cell.groupBy("shard").agg(
        F.sum("n_docs").cast("long").alias("shard_total")
    )
    spread = cell.groupBy("source").agg(
        (F.max("n_docs") - F.min("n_docs"))
        .cast("long")
        .alias("source_spread")
    )
    return (
        cell.join(F.broadcast(tot), "shard")
        .join(F.broadcast(spread), "source")
        .select(
            F.col("shard").cast("long").alias("shard"),
            "source",
            "n_docs",
            "shard_total",
            F.expr(
                "CAST(1000000 * n_docs DIV shard_total AS BIGINT)"
            ).alias("share_ppm"),
            "id_checksum",
            "source_spread",
        )
    )


# -------------------------------------------- token budget water-fill

_WF_MAX_EPOCHS = 4  # per-domain repetition cap
_WF_BUDGET_EPOCHS = 2  # global budget = 2x the total available tokens


@register(
    "token_budget_waterfill",
    oracle=f"""
    WITH toks AS (
        SELECT source,
               CAST(LENGTH(trim(text))
                    - LENGTH(REPLACE(trim(text), ' ', '')) + 1 AS BIGINT)
                   AS n_tok
        FROM documents
    ),
    doms AS (
        SELECT source, CAST(SUM(n_tok) AS BIGINT) AS a,
               CAST({_WF_MAX_EPOCHS} * SUM(n_tok) AS BIGINT) AS cap
        FROM toks GROUP BY source
    ),
    tot AS (
        SELECT COUNT(*) AS n,
               CAST({_WF_BUDGET_EPOCHS} * SUM(a) AS BIGINT) AS b
        FROM doms
    ),
    ranked AS (
        SELECT source, a, cap,
               ROW_NUMBER() OVER (ORDER BY cap, source) AS rn,
               SUM(cap) OVER (ORDER BY cap, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM doms
    ),
    cand AS (
        SELECT r.*, t.n, t.b,
               (t.b - (r.cum - r.cap)) // (t.n - r.rn + 1) AS lvl
        FROM ranked r CROSS JOIN tot t
    ),
    lev AS (
        SELECT COALESCE(
                   (SELECT MIN(lvl) FROM cand WHERE lvl < cap
                    AND rn = (SELECT MIN(rn) FROM cand WHERE lvl < cap)),
                   (SELECT MAX(cap) FROM doms)
               ) AS level
    ),
    alloc AS (
        SELECT c.source, c.a, c.cap, c.b,
               LEAST(c.cap, l.level) AS alloc, l.level
        FROM cand c CROSS JOIN lev l
    )
    SELECT source,
           a AS avail_tokens,
           cap AS cap_tokens,
           CAST(alloc AS BIGINT) AS alloc_tokens,
           CAST(1000 * alloc // a AS BIGINT) AS epochs_milli,
           CAST(level AS BIGINT) AS level_tokens,
           b AS budget_tokens,
           CAST(b - SUM(alloc) OVER () AS BIGINT) AS leftover_tokens
    FROM alloc
    """,
    tags=("corpus", "mixture", "training"),
    doc="Token-budget water-filling across domains — the allocation "
    "step of training-mixture design: each domain offers avail "
    "tokens and may be repeated up to 4 epochs (cap = 4x avail); a "
    "global budget of 2x the total available tokens is distributed "
    "as alloc_d = min(cap_d, level) with the water level chosen as "
    "the largest integer keeping the total inside budget — small "
    "domains cap out at max epochs, large domains share the level, "
    "exactly the up-sample-the-tail / cap-the-epochs policy of "
    "published LLM data recipes. Everything is exact integer "
    "arithmetic on the BOUNDED domain table (level from one sorted "
    "window + truncating division — identical on both engines); the "
    "corpus is touched once for per-domain token counts (the "
    "space-count idiom, no explode). Reports per domain: available/ "
    "cap/allocated tokens, epochs (milli), the water level, and the "
    "global leftover. Ref parity: beyond-reference mixture design.",
)
def token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "source",
        (
            F.length(F.trim("text"))
            - F.length(F.replace(F.trim("text"), F.lit(" "), F.lit("")))
            + 1
        )
        .cast("long")
        .alias("n_tok"),
    )
    doms = toks.groupBy("source").agg(
        F.sum("n_tok").cast("long").alias("a"),
        (F.lit(_WF_MAX_EPOCHS) * F.sum("n_tok")).cast("long").alias("cap"),
    )
    # doms feeds three lineages (ranked -> cand, tot -> cand, the
    # fallback max-cap aggregate), so a localCheckpoint looks right —
    # but it measured SLOWER at sf0.1 (r13 A/B, 3 alternations: old
    # minima 1.14/1.62/1.63 vs checkpointed 1.50/2.58/1.64): the
    # space-count scan is cheap and the parallel branches overlap,
    # while the checkpoint serializes a blocking materialization job.
    # Tried and reverted; re-try only if the per-domain scan itself
    # becomes the measured bottleneck.
    tot = doms.agg(
        F.count(F.lit(1)).alias("n"),
        (F.lit(_WF_BUDGET_EPOCHS) * F.sum("a")).cast("long").alias("b"),
    )
    wo = W.orderBy("cap", "source")
    ranked = doms.select(
        "source",
        "a",
        "cap",
        F.row_number().over(wo).alias("rn"),
        F.sum("cap")
        .over(wo.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum"),
    )
    cand = ranked.crossJoin(F.broadcast(tot)).withColumn(
        "lvl", F.expr("(b - (cum - cap)) DIV (n - rn + 1)")
    ).localCheckpoint(eager=False)
    first_valid = (
        cand.where(F.col("lvl") < F.col("cap"))
        .agg(F.min(F.struct("rn", "lvl")).alias("s"))
        .select(F.col("s.lvl").alias("level"))
    )
    fallback = doms.agg(F.max("cap").alias("level"))
    lev = first_valid.crossJoin(F.broadcast(fallback.withColumnRenamed("level", "fb"))).select(
        F.coalesce(F.col("level"), F.col("fb")).alias("level")
    )
    alloc = cand.crossJoin(F.broadcast(lev)).select(
        "source",
        "a",
        "cap",
        "b",
        F.least(F.col("cap"), F.col("level")).alias("alloc"),
        "level",
    )
    return alloc.select(
        "source",
        F.col("a").alias("avail_tokens"),
        F.col("cap").alias("cap_tokens"),
        F.col("alloc").cast("long").alias("alloc_tokens"),
        F.expr("CAST(1000 * alloc DIV a AS BIGINT)").alias("epochs_milli"),
        F.col("level").cast("long").alias("level_tokens"),
        F.col("b").alias("budget_tokens"),
        F.expr("CAST(b - SUM(alloc) OVER () AS BIGINT)").alias(
            "leftover_tokens"
        ),
    )
