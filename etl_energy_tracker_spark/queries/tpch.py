"""Headline analytical queries (TPC-H-shaped) over the testdata star
schema. These exercise the engine's core relational path: scan →
pushdown filter → (broadcast) join → hash aggregate → order/limit.

Scale notes (100 TB): every query here is expressed declaratively so
Catalyst pushes filters/projections into the parquet scan; dimension
joins (region/nation/supplier/customer at TPC-H proportions) are
explicitly broadcast; fact-fact joins shuffle on the join key and
benefit from AQE skew handling. No driver-side collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stable import stable_avg, stable_avg_expr, stable_sum, stable_sum_expr
from ..sources.registry import load_table
from .catalog import register


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {stable_sum_expr('l_quantity')} AS sum_qty,
           {stable_sum_expr('l_extendedprice')} AS sum_base_price,
           {stable_sum_expr('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {stable_sum_expr('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {stable_avg_expr('l_quantity')} AS avg_qty,
           {stable_avg_expr('l_extendedprice')} AS avg_price,
           {stable_avg_expr('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("tpch", "aggregate"),
    doc="TPC-H Q1 pricing summary: 2-key hash agg with 8 aggregates. SURVEY §2.4 A1/A2 analog.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            stable_sum("l_quantity", "sum_qty"),
            stable_sum("l_extendedprice", "sum_base_price"),
            stable_sum(disc_price, "sum_disc_price"),
            stable_sum(charge, "sum_charge"),
            stable_avg("l_quantity", "avg_qty"),
            stable_avg("l_extendedprice", "avg_price"),
            stable_avg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {stable_sum_expr('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    tags=("tpch", "join", "topk"),
    doc="TPC-H Q3: fact-fact join + broadcast customer filter + top-10. SURVEY §2.3 J10 analog.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir).where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, "lineitem", sf_dir).where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # customer scales with SF (no explicit broadcast — AQE broadcasts
    # it when it fits); orders⋈lineitem is fact-fact and shuffles on
    # orderkey — the scale-correct shape.
    filtered_orders = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return (
        li.join(filtered_orders, li.l_orderkey == filtered_orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(stable_sum(disc_price, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {stable_sum_expr('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("tpch", "join"),
    doc="TPC-H Q5: 6-way join with broadcast dims + agg. SURVEY §2.3 J1/J9 analog.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).where(F.col("r_name") == "ASIA")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # nation/region are constant-size dims → always broadcast; orders/
    # customer/supplier scale with SF → shuffle joins, with AQE free to
    # demote to broadcast at small SF. Date filter on orders prunes the
    # fact side before the big shuffle.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(stable_sum(disc_price, "revenue"))
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {stable_sum_expr('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "filter"),
    doc="TPC-H Q6: pure pushdown-filter scan + scalar agg (tests predicate pushdown to parquet).",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(stable_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {stable_sum_expr('l_extendedprice * (1 - l_discount)')} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch", "join", "topk"),
    doc="TPC-H Q10 returned-item reporting: 4-way join, quarter filter, "
    "top-20 by revenue with deterministic tie-break.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir).where(F.col("l_returnflag") == "R")
    nation = load_table(spark, "nation", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(stable_sum(disc_price, "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT ROUND(100.00 *
           {stable_sum_expr("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
           / {stable_sum_expr('l_extendedprice * (1 - l_discount)')}, 6) AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    tags=("tpch", "join", "aggregate"),
    doc="TPC-H Q14 promotion effect: conditional aggregate over a "
    "fact-dim join (part broadcasts), ratio of exact-decimal sums.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, "part", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), disc_price).otherwise(F.lit(0))
    # part scales with SF: no explicit broadcast (AQE decides)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0 * stable_sum(promo) / stable_sum(disc_price), 6
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q18_large_volume_customers",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 150
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           {stable_sum_expr('l_quantity')} AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    """,
    tags=("tpch", "join", "aggregate"),
    doc="TPC-H Q18 large-volume customers: HAVING-filtered aggregate as "
    "a left-semi join back onto the facts (no correlated subquery "
    "re-evaluation).",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .where(F.col("_q") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(stable_sum("l_quantity", "total_qty"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH avg_qty AS (
        SELECT l_partkey AS pk, 0.5 * AVG(l_quantity) AS threshold
        FROM lineitem GROUP BY l_partkey
    )
    SELECT {stable_sum_expr('l_extendedprice')} AS total_price,
           COUNT(*) AS n_rows
    FROM lineitem JOIN avg_qty ON l_partkey = pk
    WHERE l_quantity < threshold
    """,
    tags=("tpch", "join", "subquery"),
    doc="TPC-H Q17 shape (small-quantity orders): correlated scalar "
    "subquery avg(l_quantity) per part, decorrelated into an aggregate "
    "+ self-join — the plan Catalyst produces for the correlated form, "
    "written explicitly.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.5 * F.avg("l_quantity")).alias("threshold")
    )
    return (
        li.join(avg_qty, li.l_partkey == avg_qty.pk)
        .where(F.col("l_quantity") < F.col("threshold"))
        .agg(
            stable_sum("l_extendedprice", "total_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q22_global_sales_opportunity",
    oracle=f"""
    WITH avg_bal AS (
        SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey,
           COUNT(*) AS n_custs,
           {stable_sum_expr('c_acctbal')} AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT a FROM avg_bal)
      AND c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
    tags=("tpch", "join", "subquery"),
    doc="TPC-H Q22 shape: scalar subquery threshold + NOT EXISTS "
    "(anti-join) + aggregate. The scalar subquery broadcasts a 1-row "
    "result; the anti-join shuffles on custkey.",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(
            orders.where(
                F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
            ).select("o_custkey"),
            cust.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            stable_sum("c_acctbal", "total_bal"),
        )
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
        SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
               MIN(s_acctbal) OVER (PARTITION BY p_partkey) AS min_bal
        FROM part
        JOIN supplier ON p_partkey % 10 = s_suppkey % 10
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_size <= 15
    )
    SELECT p_partkey, s_suppkey, s_name, ROUND(s_acctbal, 2) AS s_acctbal, n_name
    FROM costs WHERE s_acctbal = min_bal
    """,
    tags=("tpch", "join", "subquery", "window"),
    doc="TPC-H Q2 shape (min-cost supplier per part): the correlated "
    "min() subquery as a window-min + equality filter — one pass, no "
    "re-aggregation join. (partsupp doesn't exist in the testdata "
    "star; the part↔supplier association is synthesised by key hash.)",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    part = load_table(spark, "part", sf_dir).where(F.col("p_size") <= 15)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    joined = (
        part.join(supp, part.p_partkey % 10 == supp.s_suppkey % 10)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    w = W.partitionBy("p_partkey")
    return (
        joined.withColumn("min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "n_name",
        )
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    """,
    tags=("tpch", "join", "subquery"),
    doc="TPC-H Q4 shape (order priority checking): correlated EXISTS as "
    "a left-semi join on the pre-filtered fact (the decorrelation "
    "Catalyst performs, written explicitly; ship>order+30d stands in "
    "for the commit<receipt predicate absent from this star).",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT {stable_sum_expr('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
    tags=("tpch", "join", "filter"),
    doc="TPC-H Q19 (discounted revenue): disjunctive multi-attribute "
    "predicates spanning both join sides — the classic case where the "
    "optimizer must extract the common join key and push the residual "
    "OR below/into the join.",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    # part scales with SF: no explicit broadcast (AQE decides)
    j = li.join(part, li.l_partkey == part.p_partkey)
    pred = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 50) & F.col("l_quantity").between(20, 40))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.where(pred).agg(stable_sum(disc_price, "revenue"))


@register(
    "q21_waiting_orders",
    oracle="""
    WITH li AS (
        SELECT l_orderkey, l_suppkey,
               l_shipdate > o_orderdate + INTERVAL 60 DAY AS is_late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM li l1 JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE l1.is_late
      AND EXISTS (SELECT 1 FROM li l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM li l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.is_late)
    GROUP BY s_name
    """,
    tags=("tpch", "join", "subquery", "window"),
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): the "
    "EXISTS / NOT-EXISTS pair decorrelated into per-order window "
    "counts (distinct suppliers, distinct late suppliers) — one "
    "shuffle on orderkey replaces two correlated self-joins. Oracle "
    "keeps the EXISTS formulation, so two independent shapes must "
    "agree. Lateness = shipped >60 days after order date (no "
    "commit/receipt dates in this star).",
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).where(F.col("o_orderstatus") == "F")
    supp = load_table(spark, "supplier", sf_dir)
    base = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")).alias(
            "is_late"
        ),
    )
    w = W.partitionBy("l_orderkey")
    flagged = base.withColumn(
        "n_supps", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "n_late_supps",
        F.size(
            F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)
        ),
    )
    culprits = flagged.where(
        F.col("is_late") & (F.col("n_supps") > 1) & (F.col("n_late_supps") == 1)
    )
    # supplier scales with SF: no explicit broadcast (AQE decides)
    return (
        culprits.join(supp, culprits.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(year FROM l_shipdate) AS l_year,
           {stable_sum_expr('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1997-12-31 23:59:59'
    GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l_shipdate)
    """,
    tags=("tpch", "join", "aggregate"),
    doc="TPC-H Q7 volume shipping: bidirectional nation-pair trade "
    "volume by year — double nation dim join with a disjunctive "
    "cross-side predicate.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).where(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1997-12-31 23:59:59").cast("timestamp"),
        )
    )
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(stable_sum(disc_price, "revenue"))
    )


@register(
    "q8_market_share",
    oracle=f"""
    WITH base AS (
        SELECT EXTRACT(year FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n1.n_name AS supp_nation
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region   ON n2.n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                              AND TIMESTAMP '1997-12-31 23:59:59'
    )
    SELECT o_year,
           ROUND({stable_sum_expr("CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END")}
                 / {stable_sum_expr('volume')}, 6) AS mkt_share
    FROM base GROUP BY o_year
    """,
    tags=("tpch", "join", "aggregate"),
    doc="TPC-H Q8 national market share: a chosen supplier nation's "
    "fraction of region revenue per year — conditional-sum ratio over "
    "a 7-way join.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1997-12-31 23:59:59").cast("timestamp"),
        )
    )
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).where(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation5 = F.when(F.col("supp_nation") == "NATION_5", volume).otherwise(F.lit(0))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_region") == region.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(stable_sum(nation5) / stable_sum(volume), 6).alias("mkt_share"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
    WITH counts AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
             AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM counts GROUP BY c_count
    """,
    tags=("tpch", "join", "aggregate"),
    doc="TPC-H Q13 customer distribution: LEFT OUTER join keeping "
    "zero-order customers (COUNT of a nullable column), then a "
    "histogram group-on-the-aggregate.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    counts = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return counts.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {stable_sum_expr('l_extendedprice * (1 - l_discount)')} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("tpch", "join", "subquery"),
    doc="TPC-H Q15 top supplier: revenue view + scalar-max subquery — "
    "the max broadcasts as a 1-row frame, no global sort.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    supp = load_table(spark, "supplier", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        stable_sum(disc_price, "total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("_mx"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)  # supplier scales with SF; AQE decides
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (9, 14, 19, 23, 36, 45, 49, 3)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("tpch", "join", "aggregate"),
    doc="TPC-H Q16 shape: negated predicates (<>, NOT LIKE, NOT IN "
    "anti-join) + COUNT DISTINCT per 3-key group (lineitem stands in "
    "for the absent partsupp).",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir).where(
        (F.col("p_brand") != "Brand#45")
        & (~F.col("p_type").like("MEDIUM%"))
        & F.col("p_size").isin(9, 14, 19, 23, 36, 45, 49, 3)
    )
    li = load_table(spark, "lineitem", sf_dir)
    bad_supp = load_table(spark, "supplier", sf_dir).where(F.col("s_acctbal") < 0)
    return (
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)  # part scales with SF; AQE decides
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_potential_promotion",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE '%re%'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 100
    )
    AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
    """,
    tags=("tpch", "join", "subquery"),
    doc="TPC-H Q20 shape: nested IN-subqueries (supplier shipped >100 "
    "units of name-matched parts in the year, within a region) as chained "
    "left-semi joins — no correlated re-execution.",
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, "supplier", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, "part", sf_dir).where(F.col("p_name").like("%re%"))
    nation = load_table(spark, "nation", sf_dir).where(F.col("n_regionkey") == 0)
    qualified = (
        # part scales with SF; AQE decides
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .where(F.col("_q") > 100)
        .select("l_suppkey")
    )
    return (
        supp.join(qualified, supp.s_suppkey == qualified.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation,
           EXTRACT(year FROM o_orderdate) AS o_year,
           {stable_sum_expr('l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.01')}
               AS sum_profit
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    """,
    tags=("tpch", "join", "aggregate"),
    doc="TPC-H Q9 shape (product-type profit by nation/year): 5-way join "
    "with a name-pattern part filter and a revenue-minus-cost "
    "expression (retail price × qty stands in for the absent "
    "partsupp.supplycost).",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    part = load_table(spark, "part", sf_dir).where(F.col("p_name").like("%red%"))
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.01
    )
    return (
        # part scales with SF; AQE decides
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(stable_sum(profit, "sum_profit"))
    )


# partsupp does not exist in the testdata star; q11 synthesises it the
# same way q2 does — part↔supplier associated by key hash, with
# availqty/supplycost as pure integer key arithmetic so Spark and
# DuckDB derive bit-identical values (no float, no engine RNG).
_PS_JOIN = "p_partkey % 10 = s_suppkey % 10"
_PS_QTY = "((p_partkey * 7 + s_suppkey * 3) % 1000 + 1)"
_PS_COST = "((p_partkey + s_suppkey * 11) % 900 + 100)"


@register(
    "q11_important_stock",
    oracle=f"""
    WITH ps AS (
        SELECT p_partkey,
               CAST({_PS_QTY} AS BIGINT) * CAST({_PS_COST} AS BIGINT) AS value
        FROM part
        JOIN supplier ON {_PS_JOIN}
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_7', 'NATION_8')
    ),
    tot AS (SELECT CAST(SUM(value) AS BIGINT) AS t FROM ps)
    SELECT p_partkey, CAST(SUM(value) AS BIGINT) AS value
    FROM ps
    GROUP BY p_partkey
    HAVING CAST(SUM(value) AS BIGINT) * 1000 > (SELECT t FROM tot)
    """,
    tags=("tpch", "join", "subquery", "aggregate"),
    doc="TPC-H Q11 shape (important stock identification): per-part "
    "inventory value within a nation group, kept only when it exceeds "
    "a fraction of the GLOBAL total — the scalar-subquery-threshold "
    "pattern. The global total is a 1-row broadcast; the HAVING "
    "comparison is integer-exact (value*1000 > total, no float "
    "fraction). partsupp synthesised by key hash (q2 precedent).",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir).where(
        F.col("n_name").isin("NATION_7", "NATION_8")
    )
    ps = (
        part.join(supp, F.expr(_PS_JOIN))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select(
            "p_partkey",
            (
                F.expr(_PS_QTY).cast("long") * F.expr(_PS_COST).cast("long")
            ).alias("value"),
        )
    )
    per_part = ps.groupBy("p_partkey").agg(F.sum("value").alias("value"))
    tot = per_part.agg(F.sum("value").alias("t"))
    return (
        per_part.crossJoin(F.broadcast(tot))
        .where(F.col("value") * 1000 > F.col("t"))
        .select("p_partkey", "value")
    )


# lineitem carries no shipmode/commitdate/receiptdate; q12 synthesises
# them from (l_orderkey, l_linenumber) with integer arithmetic both
# engines evaluate identically — the aggregation shape on top is the
# genuine Q12 late-shipment priority correlation.
_Q12_MODE = (
    "CASE (l_orderkey * 7 + l_linenumber) % 5 "
    "WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' WHEN 2 THEN 'TRUCK' "
    "WHEN 3 THEN 'AIR' ELSE 'RAIL' END"
)
_Q12_COMMIT_OFF = "((l_orderkey + 3 * l_linenumber) % 60 - 30)"
_Q12_RECEIPT_OFF = "((l_orderkey * 3 + l_linenumber) % 45)"


@register(
    "q12_shipping_modes",
    oracle=f"""
    SELECT l_shipmode,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM (
        SELECT l_orderkey,
               {_Q12_MODE} AS l_shipmode,
               CAST(l_shipdate AS DATE) + CAST({_Q12_COMMIT_OFF} AS INT) AS l_commitdate,
               CAST(l_shipdate AS DATE) + CAST({_Q12_RECEIPT_OFF} AS INT) AS l_receiptdate,
               CAST(l_shipdate AS DATE) AS l_shipdate_d
        FROM lineitem
    )
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipmode IN ('MAIL', 'SHIP')
      AND l_commitdate < l_receiptdate
      AND l_shipdate_d < l_commitdate
      AND l_receiptdate >= DATE '1996-01-01'
      AND l_receiptdate <  DATE '1997-01-01'
    GROUP BY l_shipmode
    """,
    tags=("tpch", "join", "aggregate"),
    doc="TPC-H Q12 shape (shipping modes / late-shipment priority "
    "correlation): mode-filtered late lines joined to orders, counting "
    "high- vs low-priority lines per mode. Ship/commit/receipt "
    "synthesised from key arithmetic (no such columns in testdata); "
    "the join is fact-fact on orderkey and the counts are integers — "
    "no float determinism risk.",
)
def q12_shipping_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey",
        F.expr(_Q12_MODE).alias("l_shipmode"),
        F.date_add(F.to_date("l_shipdate"), F.expr(_Q12_COMMIT_OFF).cast("int")).alias(
            "l_commitdate"
        ),
        F.date_add(F.to_date("l_shipdate"), F.expr(_Q12_RECEIPT_OFF).cast("int")).alias(
            "l_receiptdate"
        ),
        F.to_date("l_shipdate").alias("l_shipdate_d"),
    )
    orders = load_table(spark, "orders", sf_dir)
    late = li.where(
        F.col("l_shipmode").isin("MAIL", "SHIP")
        & (F.col("l_commitdate") < F.col("l_receiptdate"))
        & (F.col("l_shipdate_d") < F.col("l_commitdate"))
        & (F.col("l_receiptdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_receiptdate") < F.lit("1997-01-01").cast("date"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        late.join(orders, late.l_orderkey == orders.o_orderkey)
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
    )
