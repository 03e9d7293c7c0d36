"""Behavioral analytics over the event stream — the product-analytics
query family (funnels, retention) expressed as joins/aggregates that
scale: no per-user collect, no UDFs, state bounded per user.

``funnel_conversion`` is the ordered-funnel primitive: for each user,
the first 'view', the first 'click' strictly after that view, and the
first 'purchase' strictly after that click. Per-user stage row plus
timestamps; the ordering constraint is what distinguishes a funnel
from three independent existence checks.

Scale notes: three filtered min-aggregates on user_id (map-side
partial min, one shuffle each on the same key — co-partitioned in one
exchange under AQE) and two user-keyed joins. At 100 TB user_id is
the natural bucketing/partition key for the whole events table, which
turns all three aggregations and both joins into co-located work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .catalog import register


@register(
    "funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS ts_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS ts_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.ts_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS ts_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.ts_click
        GROUP BY e.user_id
    )
    SELECT v.user_id, v.ts_view, c.ts_click, p.ts_purchase,
           CASE WHEN p.user_id IS NOT NULL THEN 'purchase'
                WHEN c.user_id IS NOT NULL THEN 'click'
                ELSE 'view' END AS stage
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON v.user_id = p.user_id
    """,
    tags=("events",),
    doc="Ordered funnel (view -> click -> purchase): per user the "
    "first view, the first click strictly after it, and the first "
    "purchase strictly after that click — the ordering constraint is "
    "what makes it a funnel rather than three existence checks. "
    "Filtered min-aggregates + user-keyed left joins, all on the one "
    "key the events table would be bucketed by at 100 TB.",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("ts_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("ts_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "ts_view",
            "ts_click",
            "ts_purchase",
            F.when(F.col("ts_purchase").isNotNull(), "purchase")
            .when(F.col("ts_click").isNotNull(), "click")
            .otherwise("view")
            .alias("stage"),
        )
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH first_day AS (
        SELECT user_id,
               CAST(datediff('day', DATE '2024-01-01', CAST(MIN(ts) AS DATE)) AS BIGINT) AS cohort_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
               CAST(datediff('day', DATE '2024-01-01', CAST(e.ts AS DATE)) AS BIGINT)
                   - f.cohort_day AS age_days
        FROM events e JOIN first_day f ON e.user_id = f.user_id
    )
    SELECT cohort_day, age_days, COUNT(*) AS active_users
    FROM activity
    WHERE age_days <= 7
    GROUP BY cohort_day, age_days
    """,
    tags=("events",),
    doc="Retention cohort matrix: users grouped by first-seen day, "
    "counted on each subsequent active day (day-age 0..7) — the "
    "classic triangle retention table. One min-aggregate on user_id, "
    "one user-keyed join back, one distinct + count. Day arithmetic "
    "is pure integer date-diff, portable across engines.",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    day = F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).cast(
        "long"
    )
    first = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    first = first.select(
        "user_id",
        F.datediff(F.col("first_ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("cohort_day"),
    )
    activity = (
        ev.join(first, "user_id")
        .select("user_id", "cohort_day", (day - F.col("cohort_day")).alias("age_days"))
        .distinct()
    )
    return (
        activity.where(F.col("age_days") <= 7)
        .groupBy("cohort_day", "age_days")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


# ------------------------------------------------ robust outliers

# 1.4826 ~ 1/Phi^-1(3/4): scales MAD to the stddev of a normal, the
# standard robust-z constant. Parity rests on both engines computing
# the same double and ROUNDing it to 6 dp BEFORE the threshold
# compare (not on integer micro-units — the score itself is a double).
_MAD_K = 1.4826
_ROBUST_Z_CUT = 3.0


@register(
    "value_outlier_mad",
    oracle=f"""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    mad AS (
        SELECT e.event_type,
               quantile_cont(ABS(e.value - m.med), 0.5) AS mad
        FROM events e JOIN med m USING (event_type)
        GROUP BY e.event_type
    ),
    scored AS (
        -- mad = 0 (a majority-constant group) has no meaningful robust
        -- z; excluded on BOTH engines (Spark would raise ANSI
        -- divide-by-zero, DuckDB would emit inf)
        SELECT e.event_id, e.event_type, e.value,
               ROUND(ABS(e.value - m.med) / ({_MAD_K} * d.mad), 6) AS robust_z
        FROM events e JOIN med m USING (event_type) JOIN mad d USING (event_type)
        WHERE d.mad > 0
    )
    SELECT event_id, event_type, value, robust_z
    FROM scored WHERE robust_z > {_ROBUST_Z_CUT}
    """,
    tags=("stats", "quality"),
    doc="Robust outlier detection per event_type: median + MAD (median "
    "absolute deviation), robust z = |v - med| / (1.4826 * MAD), flag "
    "z > 3 — the data-quality screen that, unlike mean/stddev z-scores, "
    "is not dragged by the outliers it is hunting. Two median "
    "aggregations per group (exact here for oracle parity; at 100 TB "
    "both become approx_percentile sketches — mergeable, one pass) and "
    "one broadcast-size stats table joined back map-side; the filter "
    "compares the 6-dp-rounded score both engines compute identically.",
)
def value_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    )
    # mad = 0 groups are excluded (see oracle note): no meaningful
    # robust z, and the division would raise under ANSI
    stats = med.join(mad.where(F.col("mad") > 0), "event_type")
    z = F.round(
        F.abs(F.col("value") - F.col("med")) / (_MAD_K * F.col("mad")), 6
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("robust_z", z)
        .where(F.col("robust_z") > _ROBUST_Z_CUT)
        .select("event_id", "event_type", "value", "robust_z")
    )


# -------------------------------------------- event pattern match

# view, then any signups/clicks, then purchase — the MATCH_RECOGNIZE
# shape expressed over a per-user ordered event-initial string
_CEP_PATTERN = "v[sc]*p"


@register(
    "event_pattern_match",
    oracle=f"""
    WITH seqs AS (
        SELECT user_id,
               string_agg(substring(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS seq
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS seq_len,
           CAST(len(regexp_extract_all(seq, '{_CEP_PATTERN}')) AS BIGINT)
               AS n_matches
    FROM seqs
    WHERE len(regexp_extract_all(seq, '{_CEP_PATTERN}')) > 0
    """,
    tags=("behavior", "pattern"),
    doc="Complex-event-processing pattern match (MATCH_RECOGNIZE "
    "shape): each user's events collapse to an ordered initial string "
    "(deterministic (ts, event_id) order), and the pattern "
    "'view, then any signups/clicks, then purchase' is counted as "
    "leftmost non-overlapping regex matches — identical greedy "
    "semantics in Java regex and RE2. One groupBy per user (the "
    "sequence is session-bounded in practice — at 100 TB you window "
    "the sequence per session, not per lifetime, exactly like "
    "sessionization upstream) and a map-side regex; no joins, no "
    "state machine UDF.",
)
def event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    seqs = (
        ev.select(
            "user_id",
            F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("c")).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "", F.expr("transform(array_sort(collect_list(s)), x -> x.c)")
            ).alias("seq")
        )
    )
    n = F.size(F.expr(f"regexp_extract_all(seq, '{_CEP_PATTERN}', 0)"))
    return (
        seqs.select(
            "user_id",
            F.length("seq").cast("long").alias("seq_len"),
            n.cast("long").alias("n_matches"),
        )
        .where(F.col("n_matches") > 0)
    )


# ------------------------------------------------------------ RFM

@register(
    "rfm_segmentation",
    oracle="""
    WITH anchor AS (SELECT MAX(ts) AS max_ts FROM events),
    base AS (
        SELECT user_id,
               CAST(date_diff('day', MAX(ts), (SELECT max_ts FROM anchor))
                    AS BIGINT) AS recency_days,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS monetary
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    )
    SELECT user_id, recency_days, frequency, monetary,
           ntile(5) OVER (ORDER BY recency_days DESC, user_id) AS r_score,
           ntile(5) OVER (ORDER BY frequency ASC, user_id) AS f_score,
           ntile(5) OVER (ORDER BY monetary ASC, user_id) AS m_score
    FROM base
    """,
    tags=("behavior", "window", "aggregate"),
    doc="RFM customer segmentation (recency / frequency / monetary): "
    "one aggregation over purchase events per user, then three "
    "quintile scores via ntile over the USER-level relation — which "
    "is orders of magnitude smaller than the event log (the heavy "
    "scan is the purchase filter + per-user agg, shuffled once on "
    "user_id; the global ntile sorts only users). Ties are broken by "
    "user_id so bucket assignment is deterministic on both engines. "
    "At 100 TB of events the user relation is still single-digit "
    "billions at most; if even that outgrows a global sort, the "
    "standard swap is percentile_approx cutoffs + a when-chain, "
    "trading exact quintiles for a fully parallel score — the "
    "aggregation shape (the expensive part) is unchanged. Monetary "
    "totals use exact decimal accumulation (order-independent), the "
    "recency anchor is the corpus max timestamp (a broadcast "
    "scalar).",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    anchor = ev.agg(F.max("ts").alias("max_ts"))
    base = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff(F.to_date("max_ts"), F.to_date("last_ts"))
            .cast("bigint")
            .alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    return base.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(5)
        .over(W.orderBy(F.desc("recency_days"), "user_id"))
        .alias("r_score"),
        F.ntile(5)
        .over(W.orderBy(F.asc("frequency"), "user_id"))
        .alias("f_score"),
        F.ntile(5)
        .over(W.orderBy(F.asc("monetary"), "user_id"))
        .alias("m_score"),
    )


# ------------------------------------------------- transition matrix

@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS from_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        FROM events
    ),
    trans AS (
        SELECT from_type, to_type, COUNT(*) AS n
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY from_type), 6) AS p
    FROM trans
    """,
    tags=("behavior", "window", "aggregate"),
    doc="First-order Markov transition matrix over user journeys: "
    "consecutive event pairs per user (one lead() window, partitioned "
    "by user), counted globally, and normalized into row-stochastic "
    "transition probabilities with a window sum over the tiny "
    "(state x state) matrix. The heavy work is the user-partitioned "
    "sequence window and one shuffle on the (from, to) pair — the "
    "matrix itself is bounded by the event-type vocabulary squared, "
    "so the normalization window costs nothing at any corpus size. "
    "This is the input to funnel simulation, next-action prediction "
    "baselines, and journey anomaly scoring.",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    trans = (
        seq.where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_src = W.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(w_src), 6
        ).alias("p"),
    )


# -------------------------------------------------- sequence support

_SEQ_TOP = 10


@register(
    "sequence_support_topk",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type AS s1,
               lead(event_type, 1) OVER w AS s2,
               lead(event_type, 2) OVER w AS s3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sup AS (
        SELECT s1, s2, s3,
               COUNT(DISTINCT user_id) AS support_users,
               COUNT(*) AS n_occurrences
        FROM seq WHERE s3 IS NOT NULL
        GROUP BY s1, s2, s3
    )
    SELECT s1, s2, s3, support_users, n_occurrences FROM (
        SELECT *, row_number() OVER (
            ORDER BY support_users DESC, s1, s2, s3) AS rn
        FROM sup
    ) WHERE rn <= {_SEQ_TOP}
    """,
    tags=("behavior", "window", "aggregate"),
    doc="Sequential pattern support (PrefixSpan's contiguous-3-gram "
    "special case): every consecutive 3-step event sequence per user "
    "(two lead() columns over one user-partitioned window — a single "
    "sort per partition), supported by the number of DISTINCT users "
    "exhibiting it, which is the support metric frequent-sequence "
    "mining ranks by (occurrence counts overweight one hyperactive "
    "user). The pattern vocabulary is event-types-cubed, so the "
    "support aggregate and the global top-k both run over a bounded "
    "relation; the only corpus-sized work is the sequence window, "
    "shared with every other per-user journey operator.",
)
def sequence_support_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("s1"),
        F.lead("event_type", 1).over(w).alias("s2"),
        F.lead("event_type", 2).over(w).alias("s3"),
    ).where(F.col("s3").isNotNull())
    sup = seq.groupBy("s1", "s2", "s3").agg(
        F.count_distinct("user_id").alias("support_users"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )
    w_rank = W.orderBy(F.desc("support_users"), "s1", "s2", "s3")
    return (
        sup.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") <= _SEQ_TOP)
        .select("s1", "s2", "s3", "support_users", "n_occurrences")
    )


# ---------------------------------------------- position attribution

# U-shaped (position-based) credit in exact ppm integers: 40% first
# touch, 40% last touch, 20% split over middles by integer division
# with the remainder assigned to the LAST middle (deterministic).
_ATTR_FIRST = 400_000
_ATTR_LAST = 400_000
_ATTR_MID_POOL = 200_000


@register(
    "attribution_u_shaped",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, event_type,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS seg
        FROM events
    ),
    purchases AS (
        SELECT user_id, COALESCE(seg, 0) AS seg,
               event_id AS purchase_id
        FROM seq WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT user_id, COALESCE(seg, 0) AS seg, event_id AS click_id,
               row_number() OVER (PARTITION BY user_id, COALESCE(seg, 0)
                                  ORDER BY event_id) AS pos,
               COUNT(*) OVER (PARTITION BY user_id, COALESCE(seg, 0)) AS n
        FROM seq WHERE event_type = 'click'
    )
    SELECT c.click_id, p.purchase_id,
           CAST(CASE
             WHEN c.n = 1 THEN 1000000
             WHEN c.n = 2 AND c.pos = 1 THEN 500000
             WHEN c.n = 2 THEN 500000
             WHEN c.pos = 1 THEN {_ATTR_FIRST}
             WHEN c.pos = c.n THEN {_ATTR_LAST}
             WHEN c.pos = c.n - 1 THEN
               {_ATTR_MID_POOL} // (c.n - 2)
               + {_ATTR_MID_POOL} % (c.n - 2)
             ELSE {_ATTR_MID_POOL} // (c.n - 2)
           END AS BIGINT) AS credit_ppm
    FROM clicks c JOIN purchases p
      ON p.user_id = c.user_id AND p.seg = c.seg
    """,
    tags=("behavior", "window", "join"),
    doc="U-shaped multi-touch attribution: each purchase's credit is "
    "distributed over the clicks in its journey segment (everything "
    "since the user's previous purchase) — 40% to the first touch, "
    "40% to the last, 20% split across middles. Segment ids come "
    "from a running purchase count over the user's event sequence "
    "(one window), click positions from one more window over "
    "(user, segment), and the purchase joins on the same segment key "
    "— three operations sharing a single user_id hash partitioning. "
    "Credits are exact parts-per-million integers: the middle pool "
    "uses integer division with the remainder pinned to the last "
    "middle, so every journey's credits sum to exactly 1,000,000 and "
    "both engines agree bit-for-bit (a float 0.2/(n-2) here would "
    "not). Degenerate journeys (1 or 2 clicks) collapse to 100% or "
    "50/50 by rule.",
)
def attribution_u_shaped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    w_seq = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    seq = ev.select(
        "user_id", "event_id", "event_type",
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).over(w_seq),
            F.lit(0),
        ).alias("seg"),
    )
    purchases = seq.where(F.col("event_type") == "purchase").select(
        "user_id", "seg", F.col("event_id").alias("purchase_id")
    )
    w_pos = W.partitionBy("user_id", "seg").orderBy("event_id")
    w_cnt = W.partitionBy("user_id", "seg")
    clicks = seq.where(F.col("event_type") == "click").select(
        "user_id", "seg", F.col("event_id").alias("click_id"),
        F.row_number().over(w_pos).alias("pos"),
        F.count(F.lit(1)).over(w_cnt).alias("n"),
    )
    mid = F.expr(f"{_ATTR_MID_POOL} DIV (n - 2)")
    credit = (
        F.when(F.col("n") == 1, 1_000_000)
        .when(F.col("n") == 2, 500_000)
        .when(F.col("pos") == 1, _ATTR_FIRST)
        .when(F.col("pos") == F.col("n"), _ATTR_LAST)
        .when(
            F.col("pos") == F.col("n") - 1,
            mid + F.expr(f"{_ATTR_MID_POOL} % (n - 2)"),
        )
        .otherwise(mid)
    )
    return clicks.join(purchases, ["user_id", "seg"]).select(
        "click_id",
        "purchase_id",
        credit.cast("bigint").alias("credit_ppm"),
    )


# ------------------------------------------------- time to convert

@register(
    "time_to_convert_cohorts",
    oracle="""
    WITH signup AS (
        SELECT user_id, MIN(ts) AS s_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    first_purchase AS (
        SELECT user_id, MIN(ts) AS p_ts FROM events
        WHERE event_type = 'purchase' GROUP BY user_id
    ),
    ttc AS (
        SELECT s.user_id,
               CAST(date_trunc('month', s.s_ts) AS DATE) AS cohort,
               epoch_us(p.p_ts - s.s_ts) // 1000000 AS ttc_s
        FROM signup s JOIN first_purchase p USING (user_id)
        WHERE p.p_ts >= s.s_ts
    ),
    ranked AS (
        SELECT cohort, ttc_s,
               row_number() OVER (PARTITION BY cohort
                   ORDER BY ttc_s, user_id) AS rk,
               COUNT(*) OVER (PARTITION BY cohort) AS n
        FROM ttc
    )
    SELECT cohort,
           MAX(n) AS n_converted,
           MAX(CASE WHEN rk = (n + 1) // 2 THEN ttc_s END) AS median_ttc_s,
           MAX(CASE WHEN rk = (n * 9 + 9) // 10 THEN ttc_s END) AS p90_ttc_s
    FROM ranked GROUP BY cohort
    """,
    tags=("behavior", "window", "aggregate"),
    doc="Time-to-convert cohort quantiles: each user's seconds from "
    "signup to first purchase, grouped by signup-month cohort, with "
    "EXACT median and p90 selected by integer rank ((n+1) div 2 and "
    "ceil(0.9 n) over the (ttc, user_id)-ordered cohort) — the "
    "deterministic percentile_disc formulation, immune to the "
    "cross-engine interpolation differences of percentile_cont and "
    "to float rank arithmetic. Two tiny per-user aggregates, one "
    "join, one cohort-partitioned rank window; nothing is "
    "corpus-sized after the first aggregate. At extreme cohort "
    "cardinality the exact rank selection swaps for the engine's "
    "histogram-sketch quantile operator (histogram_quantile_estimate) "
    "with visible error bounds — both live in this catalog, which is "
    "the point: exact where feasible, sketched where not, measured "
    "either way.",
)
def time_to_convert_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    signup = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    purchase = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    ttc = (
        signup.join(purchase, "user_id")
        .where(F.col("p_ts") >= F.col("s_ts"))
        .select(
            "user_id",
            F.to_date(F.date_trunc("month", "s_ts")).alias("cohort"),
            # exact integer floor (duck // semantics); float /1e6 +
            # cast truncates through a double on odd-micro timestamps
            F.expr(
                "(unix_micros(p_ts) - unix_micros(s_ts)) DIV 1000000"
            ).alias("ttc_s"),
        )
    )
    w_rank = W.partitionBy("cohort").orderBy("ttc_s", "user_id")
    w_n = W.partitionBy("cohort")
    ranked = ttc.select(
        "cohort", "ttc_s",
        F.row_number().over(w_rank).alias("rk"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    return ranked.groupBy("cohort").agg(
        F.max("n").alias("n_converted"),
        F.max(
            F.when(F.col("rk") == F.expr("(n + 1) DIV 2"), F.col("ttc_s"))
        ).alias("median_ttc_s"),
        F.max(
            F.when(F.col("rk") == F.expr("(n * 9 + 9) DIV 10"), F.col("ttc_s"))
        ).alias("p90_ttc_s"),
    )


# ------------------------------------------- winsorized statistics

_WINSOR_PCT = 5  # clamp below p05 / above p95 (rank-based, exact)


@register(
    "winsorized_robust_stats",
    oracle=f"""
    WITH v AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(38,2)) * 100 AS BIGINT) AS vc,
               event_id
        FROM events
    ),
    ranked AS (
        SELECT event_type, vc,
               row_number() OVER (PARTITION BY event_type
                   ORDER BY vc, event_id) AS r_asc,
               row_number() OVER (PARTITION BY event_type
                   ORDER BY vc DESC, event_id DESC) AS r_desc,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM v
    ),
    cuts AS (
        SELECT event_type,
               MAX(CASE WHEN r_asc = GREATEST(1, n * {_WINSOR_PCT} // 100)
                        THEN vc END) AS lo_centi,
               MAX(CASE WHEN r_desc = GREATEST(1, n * {_WINSOR_PCT} // 100)
                        THEN vc END) AS hi_centi,
               MAX(n) AS n
        FROM ranked GROUP BY event_type
    )
    SELECT r.event_type, CAST(c.n AS BIGINT) AS n,
           c.lo_centi, c.hi_centi,
           CAST(SUM(LEAST(GREATEST(r.vc, c.lo_centi), c.hi_centi))
                // c.n AS BIGINT) AS winsor_mean_centi
    FROM ranked r JOIN cuts c USING (event_type)
    GROUP BY r.event_type, c.n, c.lo_centi, c.hi_centi
    """,
    tags=("stats", "quality", "aggregate"),
    doc="Winsorized per-group statistics: clamp each group's values at "
    "its exact rank-based 5th/95th cut (the value at row_number "
    "n*5//100 from each end — no approximate percentile, so the cuts "
    "are identical on every engine and cluster size) and report the "
    "clamped mean in exact centi-units. The robust aggregate for "
    "heavy-tailed telemetry where a plain mean follows the outliers "
    "and a median discards too much — value_outlier_mad flags the "
    "tails, this measures the center with the tails contained. "
    "Scale: two window passes + one aggregate, all partitioned by the "
    "group key; cut rows are one per group (broadcast-size join).",
)
def winsorized_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    v = ev.select(
        "event_type",
        (F.col("value").cast("decimal(38,2)") * 100).cast("bigint").alias("vc"),
        "event_id",
    )
    p = W.partitionBy("event_type")
    ranked = v.select(
        "event_type",
        "vc",
        F.row_number().over(p.orderBy("vc", "event_id")).alias("r_asc"),
        F.row_number()
        .over(p.orderBy(F.desc("vc"), F.desc("event_id")))
        .alias("r_desc"),
        F.count(F.lit(1)).over(p).alias("n"),
    )
    k = F.greatest(F.lit(1), F.expr(f"n * {_WINSOR_PCT} DIV 100"))
    cuts = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("r_asc") == k, F.col("vc"))).alias("lo_centi"),
        F.max(F.when(F.col("r_desc") == k, F.col("vc"))).alias("hi_centi"),
        F.max("n").alias("n"),
    )
    clamped = ranked.select("event_type", "vc").join(
        F.broadcast(cuts), "event_type"
    )
    return clamped.groupBy(
        "event_type", "n", "lo_centi", "hi_centi"
    ).agg(
        F.expr(
            "CAST(SUM(LEAST(GREATEST(vc, lo_centi), hi_centi)) DIV n AS BIGINT)"
        ).alias("winsor_mean_centi")
    ).select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        "lo_centi",
        "hi_centi",
        "winsor_mean_centi",
    )


# ------------------------------------- Nelson-Aalen cumulative hazard


@register(
    "nelson_aalen_hazard",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'purchase'
                   THEN epoch_us(ts) END) AS conv_us,
               MIN(epoch_us(ts)) AS first_us,
               MAX(epoch_us(ts)) AS last_us
        FROM events GROUP BY user_id
    ),
    durs AS (
        SELECT CASE WHEN conv_us IS NOT NULL
                    THEN (conv_us - first_us) // 3600000000
                    ELSE (last_us - first_us) // 3600000000
               END AS t_hours,
               CASE WHEN conv_us IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM per_user
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM durs),
    hist AS (
        SELECT t_hours, CAST(SUM(ev) AS BIGINT) AS d,
               CAST(COUNT(*) AS BIGINT) AS leave_n
        FROM durs GROUP BY t_hours
    ),
    risk AS (
        SELECT t_hours, d,
               t.n_total - CAST(COALESCE(SUM(leave_n) OVER (
                   ORDER BY t_hours
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS n_risk
        FROM hist CROSS JOIN tot t
    )
    SELECT t_hours, n_risk, d AS d_events,
           CAST(1000000 * d // n_risk AS BIGINT) AS hazard_ppm,
           CAST(SUM(1000000 * d // n_risk) OVER (
               ORDER BY t_hours
           ) AS BIGINT) AS cum_hazard_ppm
    FROM risk WHERE d > 0
    """,
    tags=("events", "stats", "eval"),
    doc="Nelson-Aalen cumulative-hazard estimator for time-to-"
    "conversion: each user's duration runs from their first event to "
    "their first purchase, right-CENSORED at their last event when "
    "they never convert — the survival-analysis readout (hazard per "
    "hour-bucket and its cumulative sum) that funnel conversion "
    "rates misstate when observation windows differ per user. "
    "Nelson-Aalen is the estimator that stays pure-ADDITIVE integer "
    "(H(t) = sum of d/n_risk terms, each an exact truncating ppm "
    "division of non-negative counts) — the Kaplan-Meier product "
    "form would need a float cumulative product across the engine "
    "boundary; NA is its first-order equivalent and the standard "
    "large-sample choice. Scale: one per-user aggregate collapses "
    "the stream; the duration histogram is bounded by the "
    "observation span in hours, and the risk-set suffix counts plus "
    "both windows run on that bounded grid (total-count broadcast "
    "scalar). Ref parity: beyond-reference survival layer (companion "
    "to time_to_convert_cohorts, which buckets means; this estimates "
    "the hazard function itself, censoring-correct).",
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.expr(
            "MIN(CASE WHEN event_type = 'purchase'"
            " THEN unix_micros(ts) END)"
        ).alias("conv_us"),
        F.expr("MIN(unix_micros(ts))").alias("first_us"),
        F.expr("MAX(unix_micros(ts))").alias("last_us"),
    )
    durs = per_user.select(
        F.expr(
            "CASE WHEN conv_us IS NOT NULL"
            " THEN (conv_us - first_us) DIV 3600000000"
            " ELSE (last_us - first_us) DIV 3600000000 END"
        ).alias("t_hours"),
        F.expr(
            "CASE WHEN conv_us IS NOT NULL THEN 1 ELSE 0 END"
        ).alias("ev"),
    )
    tot = durs.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    hist = durs.groupBy("t_hours").agg(
        F.sum("ev").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("leave_n"),
    )
    risk = (
        hist.crossJoin(F.broadcast(tot))
        .withColumn(
            "n_risk",
            F.col("n_total")
            - F.coalesce(
                F.sum("leave_n").over(
                    W.orderBy("t_hours").rowsBetween(
                        W.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).cast("long"),
        )
    )
    return (
        risk.where("d > 0")
        .select(
            "t_hours",
            "n_risk",
            F.col("d").alias("d_events"),
            F.expr("CAST(1000000 * d DIV n_risk AS BIGINT)").alias(
                "hazard_ppm"
            ),
        )
        .withColumn(
            "cum_hazard_ppm",
            F.sum("hazard_ppm")
            .over(W.orderBy("t_hours"))
            .cast("long"),
        )
    )
