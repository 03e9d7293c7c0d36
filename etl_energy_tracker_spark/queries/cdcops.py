"""Change-data-capture and temporal-dimension operators — the
table-maintenance layer a lakehouse engine needs around its MERGE
path (lake.py's keep-last upsert sink is the storage half; these are
the query-shape half).

The event stream doubles as a deterministic changelog: signup = Insert,
view/click/purchase = Update, error = Delete, sequenced by event_id.

- ``cdc_apply_changes``       — collapse a changelog to final table
  state: last operation per key wins, a trailing Delete removes the
  key. The core of MERGE-from-changelog ingestion (Debezium -> lake).
- ``scd2_point_in_time_join`` — build an SCD2 validity interval table
  from the changelog (valid_from = change ts, valid_to = next change
  ts) and join facts to the version valid AT event time — the
  correct-join-against-history primitive (a plain dim join would
  leak future attribute values into past facts).

Scale notes: cdc_apply_changes is one window (key-partitioned
keep-last) — the same shape as lake.py's upsert dedup, bucketable on
the key. The SCD2 build is one lead() window per key; the
point-in-time join is an interval join keyed on the entity id, so the
range condition only scans within one entity's versions, never across
entities (band-join by key, not a cross product).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.hashing import duckdb_charhash, spark_charhash
from ..sources.registry import load_table
from .catalog import register

_OP = (
    "CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' "
    "ELSE 'U' END"
)


@register(
    "cdc_apply_changes",
    oracle=f"""
    WITH log AS (
        SELECT user_id, event_id AS seq, value, {_OP} AS op
        FROM events
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY seq DESC) AS rn
        FROM log
    )
    SELECT user_id, seq AS last_seq, value AS last_value, op AS last_op
    FROM ranked
    WHERE rn = 1 AND op != 'D'
    """,
    tags=("cdc",),
    doc="Changelog collapse to final state: the highest-sequence "
    "operation per key wins and a trailing Delete removes the key — "
    "MERGE-from-changelog semantics (Debezium-style I/U/D with a "
    "monotonic sequence). One key-partitioned keep-last window, the "
    "same shape as the processed-zone upsert sink (lake.py), so at "
    "100 TB it runs bucketed on the key with no extra exchange.",
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    log = ev.select(
        "user_id",
        F.col("event_id").alias("seq"),
        "value",
        F.expr(_OP).alias("op"),
    )
    w = W.partitionBy("user_id").orderBy(F.desc("seq"))
    return (
        log.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "user_id",
            F.col("seq").alias("last_seq"),
            F.col("value").alias("last_value"),
            F.col("op").alias("last_op"),
        )
    )


@register(
    "scd2_point_in_time_join",
    oracle=f"""
    WITH log AS (
        SELECT user_id, event_id AS seq, ts, value, {_OP} AS op
        FROM events
    ),
    versions AS (
        SELECT user_id, seq, ts AS valid_from, value,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, seq)
                   AS valid_to
        FROM log WHERE op IN ('I', 'U')
    ),
    facts AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase'
    )
    SELECT f.event_id, f.user_id, v.seq AS version_seq,
           v.value AS version_value
    FROM facts f
    JOIN versions v
      ON f.user_id = v.user_id
     AND f.ts >= v.valid_from
     AND (v.valid_to IS NULL OR f.ts < v.valid_to)
    """,
    tags=("cdc",),
    doc="Point-in-time join against SCD2 history: versions get "
    "[valid_from, valid_to) intervals via lead() per entity, and each "
    "fact joins the version valid AT its event time — a plain dim "
    "join would leak future attributes into past facts. The interval "
    "condition is keyed on the entity id, so the range scan stays "
    "within one entity's versions (a key-equi join with a residual "
    "range predicate, not a cross product). Note purchases are both "
    "facts AND Update changes here, so a purchase always matches its "
    "own version — intentional: it pins the inclusive-start boundary "
    "semantics in the oracle.",
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    log = ev.select(
        "user_id",
        F.col("event_id").alias("seq"),
        "ts",
        "value",
        F.expr(_OP).alias("op"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "seq")
    versions = (
        log.where(F.col("op").isin("I", "U"))
        .select(
            "user_id",
            "seq",
            F.col("ts").alias("valid_from"),
            "value",
            F.lead("ts").over(w.orderBy("ts", "seq")).alias("valid_to"),
        )
    )
    facts = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return (
        facts.join(
            versions,
            (facts.user_id == versions.user_id)
            & (facts.ts >= versions.valid_from)
            & (versions.valid_to.isNull() | (facts.ts < versions.valid_to)),
        )
        .select(
            "event_id",
            facts.user_id,
            F.col("seq").alias("version_seq"),
            F.col("value").alias("version_value"),
        )
    )


_PROFILE_NUM = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_PROFILE_STR = ("l_returnflag", "l_linestatus")


@register(
    "table_profile_stats",
    oracle=f"""
    WITH src AS (SELECT * FROM lineitem)
    {" UNION ALL ".join(
        f'''SELECT '{c}' AS col, COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS DOUBLE) AS min_num,
               CAST(MAX({c}) AS DOUBLE) AS max_num,
               CAST(NULL AS VARCHAR) AS min_str,
               CAST(NULL AS VARCHAR) AS max_str
        FROM src''' for c in _PROFILE_NUM
    )}
    UNION ALL
    {" UNION ALL ".join(
        f'''SELECT '{c}' AS col, COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(NULL AS DOUBLE) AS min_num,
               CAST(NULL AS DOUBLE) AS max_num,
               MIN({c}) AS min_str,
               MAX({c}) AS max_str
        FROM src''' for c in _PROFILE_STR
    )}
    """,
    tags=("profile",),
    doc="Column-profile statistics (ANALYZE TABLE shape): per column "
    "the row count, null count, exact distinct count, and min/max — "
    "the numbers a cost-based optimizer and a data-quality monitor "
    "both need. Exact distincts (not approx) so both engines agree "
    "bit-for-bit; at 100 TB you'd swap in HLL sketches per column "
    "and this exact form is their audit oracle. One scan per column "
    "group here; the all-columns-one-pass variant uses a single "
    "aggregate with per-column expressions.",
)
def table_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    outs = []
    for c in _PROFILE_NUM:
        outs.append(
            li.agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
                F.min(c).cast("double").alias("min_num"),
                F.max(c).cast("double").alias("max_num"),
            ).select(
                F.lit(c).alias("col"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                "min_num",
                "max_num",
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            )
        )
    for c in _PROFILE_STR:
        outs.append(
            li.agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
                F.min(c).alias("min_str"),
                F.max(c).alias("max_str"),
            ).select(
                F.lit(c).alias("col"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                "min_str",
                "max_str",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


_IVM_CUT = "TIMESTAMP '2024-01-08 00:00:00'"


@register(
    "incremental_agg_maintenance",
    oracle=f"""
    WITH base AS (
        SELECT user_id, COUNT(*) AS n,
               SUM(CAST(value AS DECIMAL(38,6))) AS s
        FROM events WHERE ts < {_IVM_CUT} GROUP BY user_id
    ),
    delta AS (
        SELECT user_id, COUNT(*) AS n,
               SUM(CAST(value AS DECIMAL(38,6))) AS s
        FROM events WHERE ts >= {_IVM_CUT} GROUP BY user_id
    )
    SELECT COALESCE(b.user_id, d.user_id) AS user_id,
           COALESCE(b.n, 0) AS n_base,
           COALESCE(d.n, 0) AS n_delta,
           COALESCE(b.n, 0) + COALESCE(d.n, 0) AS n_events,
           CAST(COALESCE(b.s, 0) + COALESCE(d.s, 0) AS DOUBLE) AS sum_value
    FROM base b FULL OUTER JOIN delta d ON b.user_id = d.user_id
    """,
    tags=("cdc", "aggregate"),
    doc="Incremental view maintenance: a per-user aggregate snapshot "
    "(events before the cut) merged with the partial aggregate of the "
    "newly-arrived delta partition — COUNTs add, DECIMAL-exact sums "
    "add, no rescan of the base data. The merge result provably "
    "equals the full recompute (pinned in pytest), which is the whole "
    "IVM contract: at 100 TB you maintain the materialized aggregate "
    "by folding in each day's partition instead of re-aggregating "
    "history. Decimal accumulation keeps the merge exact and "
    "order-independent (functions/stable.py rationale).",
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    cut = F.expr(_IVM_CUT)

    def partial(side: DataFrame) -> DataFrame:
        return side.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("s"),
        )

    base = partial(ev.where(F.col("ts") < cut)).alias("b")
    delta = partial(ev.where(F.col("ts") >= cut)).alias("d")
    return (
        base.join(delta, F.col("b.user_id") == F.col("d.user_id"), "full_outer")
        .select(
            F.coalesce("b.user_id", "d.user_id").alias("user_id"),
            F.coalesce("b.n", F.lit(0)).alias("n_base"),
            F.coalesce("d.n", F.lit(0)).alias("n_delta"),
            (F.coalesce("b.n", F.lit(0)) + F.coalesce("d.n", F.lit(0))).alias(
                "n_events"
            ),
            (
                F.coalesce(F.col("b.s"), F.lit(0).cast("decimal(38,6)"))
                + F.coalesce(F.col("d.s"), F.lit(0).cast("decimal(38,6)"))
            )
            .cast("double")
            .alias("sum_value"),
        )
    )


# --------------------------------------- data-quality expectations

@register(
    "dq_expectations_report",
    oracle="""
    WITH m AS (
        SELECT COUNT(*) AS n_rows,
               COUNT(o_custkey) AS n_custkey,
               COUNT(DISTINCT o_orderkey) AS n_orderkey_distinct,
               COUNT(CASE WHEN o_totalprice > 0 THEN 1 END) AS n_price_pos,
               COUNT(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 END)
                   AS n_status_ok
        FROM orders
    )
    SELECT * FROM (
        SELECT 'row_count_min_100' AS constraint_name,
               n_rows AS metric, n_rows >= 100 AS passed FROM m
        UNION ALL
        SELECT 'custkey_complete',
               n_custkey * 1000000 // n_rows,
               n_custkey = n_rows FROM m
        UNION ALL
        SELECT 'orderkey_unique',
               n_orderkey_distinct * 1000000 // n_rows,
               n_orderkey_distinct = n_rows FROM m
        UNION ALL
        SELECT 'totalprice_positive',
               n_price_pos * 1000000 // n_rows,
               n_price_pos = n_rows FROM m
        UNION ALL
        SELECT 'status_in_domain',
               n_status_ok * 1000000 // n_rows,
               n_status_ok = n_rows FROM m
    )
    """,
    tags=("profile", "quality"),
    doc="Declared data-quality expectations evaluated in ONE pass "
    "(Deequ / Great Expectations shape): row-count floor, "
    "completeness(o_custkey), uniqueness(o_orderkey), range "
    "(o_totalprice > 0), and domain membership (o_orderstatus), each "
    "reported as (constraint, metric, passed). All five metrics come "
    "from a single aggregate over the table — the point of a "
    "constraint engine is that adding expectations adds columns to "
    "one scan, not scans. Ratios are integer micro-units "
    "(n*1000000 DIV total), exact on both engines. At 100 TB the "
    "exact distinct becomes the HLL register sketch "
    "(hll_distinct_audit) with a tolerance-based uniqueness check.",
)
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    m = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("n_custkey"),
        F.countDistinct("o_orderkey").alias("n_orderkey_distinct"),
        F.count(F.when(F.col("o_totalprice") > 0, 1)).alias("n_price_pos"),
        F.count(
            F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("n_status_ok"),
    )
    rows = [
        ("row_count_min_100", F.col("n_rows"), F.col("n_rows") >= 100),
        (
            "custkey_complete",
            F.expr("n_custkey * 1000000 DIV n_rows"),
            F.col("n_custkey") == F.col("n_rows"),
        ),
        (
            "orderkey_unique",
            F.expr("n_orderkey_distinct * 1000000 DIV n_rows"),
            F.col("n_orderkey_distinct") == F.col("n_rows"),
        ),
        (
            "totalprice_positive",
            F.expr("n_price_pos * 1000000 DIV n_rows"),
            F.col("n_price_pos") == F.col("n_rows"),
        ),
        (
            "status_in_domain",
            F.expr("n_status_ok * 1000000 DIV n_rows"),
            F.col("n_status_ok") == F.col("n_rows"),
        ),
    ]
    # one explode over the single aggregate row — NOT a union of five
    # re-aggregations (a union would rescan the table per constraint,
    # defeating the one-pass design)
    report = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("constraint_name"),
                    metric.cast("long").alias("metric"),
                    passed.alias("passed"),
                )
                for name, metric, passed in rows
            ]
        )
    ).alias("r")
    return m.select(report).select("r.constraint_name", "r.metric", "r.passed")


# ------------------------------------------------------- snapshot diff

# Snapshot B is derived deterministically from the documents table so
# the diff has known ground truth on any SF: ~1/13 of rows removed,
# ~1/10 of the remainder edited, and ~1/17 re-inserted under a new id.
_DIFF_REMOVED = "doc_id % 13 = 1"
_DIFF_CHANGED = "doc_id % 10 = 0"
_DIFF_ADDED = "doc_id % 17 = 2"
_DIFF_ID_OFFSET = 1_000_000_000


@register(
    "dataset_snapshot_diff",
    oracle=f"""
    WITH snap_b AS (
        SELECT doc_id,
               CASE WHEN {_DIFF_CHANGED} THEN upper(text) ELSE text END AS text,
               lang, source
        FROM documents WHERE NOT ({_DIFF_REMOVED})
        UNION ALL
        SELECT doc_id + {_DIFF_ID_OFFSET}, text, lang, source
        FROM documents WHERE {_DIFF_ADDED}
    ),
    joined AS (
        SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
               CASE
                 WHEN a.doc_id IS NULL THEN 'added'
                 WHEN b.doc_id IS NULL THEN 'removed'
                 WHEN a.text IS DISTINCT FROM b.text
                   OR a.lang IS DISTINCT FROM b.lang
                   OR a.source IS DISTINCT FROM b.source THEN 'changed'
                 ELSE 'unchanged'
               END AS change_type
        FROM documents a FULL OUTER JOIN snap_b b ON a.doc_id = b.doc_id
    )
    SELECT doc_id, change_type FROM joined WHERE change_type != 'unchanged'
    """,
    tags=("cdc", "diff"),
    doc="Dataset snapshot diff (the data-versioning audit primitive): "
    "two table versions are full-outer joined on the primary key and "
    "each row classified added / removed / changed by null-safe column "
    "comparison; unchanged rows are dropped so the output is bounded "
    "by the churn, not the corpus. Presence is decided by join-side "
    "key nullity (the key itself is never NULL in either snapshot), "
    "matching the merge-indicator pattern. At 100 TB both snapshots "
    "hash-partition on the key — co-located when the lake buckets by "
    "primary key, in which case the exchange disappears entirely; "
    "the wide text comparison happens only inside matched pairs, and "
    "a stored per-row fingerprint column would reduce it to a long "
    "compare without changing this plan's shape.",
)
def dataset_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "text", "lang", "source"
    )
    kept = docs.where(f"NOT ({_DIFF_REMOVED})").select(
        "doc_id",
        F.when(F.expr(_DIFF_CHANGED), F.upper("text"))
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
        "source",
    )
    added = docs.where(_DIFF_ADDED).select(
        (F.col("doc_id") + _DIFF_ID_OFFSET).alias("doc_id"),
        "text", "lang", "source",
    )
    snap_b = kept.unionByName(added)
    a = docs.alias("a")
    b = snap_b.alias("b")
    joined = a.join(b, F.col("a.doc_id") == F.col("b.doc_id"), "full_outer")
    differs = (
        ~F.col("a.text").eqNullSafe(F.col("b.text"))
        | ~F.col("a.lang").eqNullSafe(F.col("b.lang"))
        | ~F.col("a.source").eqNullSafe(F.col("b.source"))
    )
    change = (
        F.when(F.col("a.doc_id").isNull(), "added")
        .when(F.col("b.doc_id").isNull(), "removed")
        .when(differs, "changed")
        .otherwise("unchanged")
    )
    return (
        joined.select(
            F.coalesce(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_id"),
            change.alias("change_type"),
        )
        .where(F.col("change_type") != "unchanged")
    )


# ------------------------------------- Merkle-bucket table reconcile

_CK_BUCKETS = 64
_CK_DRIFT_MOD = 97  # keys with o_orderkey % 97 == 0 drift in replica B


@register(
    "table_checksum_diff",
    oracle=f"""
    WITH rows_c AS (
        SELECT o_orderkey AS k,
               CAST(CAST(o_totalprice AS DECIMAL(38,2)) * 100 AS BIGINT)
                   AS price_centi,
               o_orderstatus AS st
        FROM orders
    ),
    a AS (
        SELECT k % {_CK_BUCKETS} AS bucket,
               {duckdb_charhash(
                   "CAST(k AS VARCHAR) || ':' || CAST(price_centi AS VARCHAR)"
                   " || ':' || st")} AS rh
        FROM rows_c
    ),
    b AS (
        SELECT k % {_CK_BUCKETS} AS bucket,
               {duckdb_charhash(
                   "CAST(k AS VARCHAR) || ':' || CAST(price_centi"
                   f" + CASE WHEN k % {_CK_DRIFT_MOD} = 0 THEN 1 ELSE 0 END"
                   " AS VARCHAR) || ':' || st")} AS rh
        FROM rows_c
    ),
    da AS (SELECT bucket, COUNT(*) AS n_a, CAST(SUM(rh) AS BIGINT) AS sum_a
           FROM a GROUP BY bucket),
    db AS (SELECT bucket, COUNT(*) AS n_b, CAST(SUM(rh) AS BIGINT) AS sum_b
           FROM b GROUP BY bucket)
    SELECT da.bucket AS bucket, n_a, n_b, sum_a, sum_b,
           CASE WHEN n_a = n_b AND sum_a = sum_b THEN 1 ELSE 0 END AS in_sync
    FROM da JOIN db ON da.bucket = db.bucket
    """,
    tags=("cdc", "hash", "dq"),
    doc=f"Merkle-style bucket-checksum table reconciliation — the "
    "anti-entropy primitive for verifying a replicated/CDC-mirrored "
    "table without shipping rows (Cassandra repair / pipeline "
    "verification shape): every row folds to an engine-portable "
    f"polynomial hash, rows bucket by key % {_CK_BUCKETS}, and each "
    "side ships only (count, hash-sum) per bucket; unequal digests "
    "localize the diff to a bucket, so row-level drill-down touches "
    "1/buckets of the table. Replica B is the same table with a "
    f"deterministic planted drift (+1 centi-unit on keys % "
    f"{_CK_DRIFT_MOD} == 0), so exactly the buckets containing those "
    "keys report out of sync. Scale: two map-side hash projections + "
    "two {buckets}-row aggregates + a {buckets}-row join — network "
    "cost is O(buckets), independent of table size; the hash-sum is "
    "commutative so partial aggregation pushes map-side.",
)
def table_checksum_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    rows_c = orders.select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_totalprice").cast("decimal(38,2)") * 100)
        .cast("bigint")
        .alias("price_centi"),
        F.col("o_orderstatus").alias("st"),
    )
    def digest(price_expr: str, side: str) -> DataFrame:
        rh = spark_charhash(
            f"CAST(k AS STRING) || ':' || CAST({price_expr} AS STRING)"
            " || ':' || st"
        )
        return (
            rows_c.select(
                (F.col("k") % _CK_BUCKETS).alias("bucket"),
                F.expr(rh).alias("rh"),
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias(f"n_{side}"),
                F.sum("rh").alias(f"sum_{side}"),
            )
        )
    da = digest("price_centi", "a")
    db = digest(
        f"price_centi + CASE WHEN k % {_CK_DRIFT_MOD} = 0 THEN 1 ELSE 0 END",
        "b",
    )
    return da.join(db, "bucket").select(
        "bucket", "n_a", "n_b", "sum_a", "sum_b",
        F.when(
            (F.col("n_a") == F.col("n_b")) & (F.col("sum_a") == F.col("sum_b")),
            1,
        ).otherwise(0).alias("in_sync"),
    )
