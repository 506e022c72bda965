"""Relational operator coverage over the TPC-H-ish driver tables.

Exercises the join/aggregate/window/sort surface of SURVEY.md §2.5-2.9
(J1 equi-joins, A1-A8 hash aggregates, T1-T6 sorts/top-k, §2.9 windows)
on the provided star schema.  Plans are Catalyst-first: dimension joins
are explicitly broadcast, aggregates are partial-agg friendly built-ins,
windows are per-group (never a global single-task sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from archvisier_spark.ops.io_util import read_table

    return read_table(spark, sf_dir, name)


# --- Q1-style pricing summary: the canonical partial-aggregate scan ---

def q_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                             AS sum_qty,
       round(sum(l_extendedprice), 2)                        AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)     AS sum_disc_price,
       round(avg(l_quantity), 4)                             AS avg_qty,
       round(avg(l_discount), 4)                             AS avg_disc,
       count(*)                                              AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- Q3-style shipping priority: fact-fact join + top-k ---

def q_top_revenue_orders(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # customer is fact-sized (15M+ rows at 100×) — no broadcast hint; AQE
    # still picks broadcast at small SF and falls back to shuffle join at
    # scale instead of OOMing executors.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_TOP_REVENUE_SQL = """
SELECT l_orderkey, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --- Q5-style snowflake join through broadcast dims ---

def q_nation_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        # r07 (guide §3.1): the planner broadcast the 1.5M-row orders side
        # of the lineitem join — a single-threaded driver-side hash build
        # that dominated the query (~1 s at sf1.0).  Orders is fact-sized,
        # so the deliberate strategy is a SHUFFLED HASH join: both sides
        # exchange by orderkey and the hash builds per-partition, in
        # parallel, with per-partition build memory bounded by the
        # partition count (orders is always the smaller fact side).
        # Measured 1.9 s -> 1.1 s at sf1.0, flat at sf0.1.  Explicit
        # projections shrink the exchanges to the joined/aggregated
        # columns (§2.3 "project before the exchange").
        li.select("l_orderkey", "l_extendedprice", "l_discount")
        .join(
            orders.select("o_orderkey", "o_custkey").hint("shuffle_hash"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        # customer scales with the fact tables — broadcast only true dims
        # (nation/region); AQE decides for customer at runtime.
        .join(cust.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
             F.count("*").alias("n_items"))
    )


_NATION_REVENUE_SQL = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey  = o_orderkey
JOIN customer ON o_custkey   = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# --- semi/anti join (set-membership predicates, §2.8) ---

def q_orders_with_returns(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    returned = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total_price"))
    )


_ORDERS_WITH_RETURNS_SQL = """
SELECT o_orderpriority, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q_customers_without_orders(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


_CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# --- window functions: per-group rank / running sequence (A2, T2) ---

def q_top3_orders_per_customer(spark, sf_dir):
    # r07: the orders file has 1-2 row groups, so the window's pre-shuffle
    # Sort + partial WindowGroupLimit ran as two 750k-row single-core
    # sorts.  Repartitioning by the window key FIRST satisfies the
    # window's required distribution with the same single Exchange, and
    # the sort then runs on defaultParallelism tasks of ~n/cores rows
    # (guide §2.4: two operations keyed the same way share one exchange).
    # Measured 1.4 s -> 0.65 s at sf1.0; row_number over the full orderBy
    # is deterministic, so results are unchanged.
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    ).repartition(spark.sparkContext.defaultParallelism, "o_custkey")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "rk",
                F.round("o_totalprice", 2).alias("totalprice"))
    )


_TOP3_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, rk, round(o_totalprice, 2) AS totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
) WHERE rk <= 3
"""


def q_counter_rownum(spark, sf_dir):
    """A2 counter semantics: dense per-mode sequence in deterministic order
    (the reference's ``counters[mode] += 1`` over a sorted scan)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    return (
        orders.withColumn("lp", F.row_number().over(w))
        .groupBy("o_orderpriority")
        .agg(F.max("lp").alias("final_counter"), F.count("*").alias("n"))
    )


_COUNTER_ROWNUM_SQL = """
SELECT o_orderpriority, max(lp) AS final_counter, count(*) AS n
FROM (
  SELECT o_orderpriority,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS lp
  FROM orders
)
GROUP BY o_orderpriority
"""


def q_counter_display(spark, sf_dir):
    """A2 year-scoped counter parity at scale: the reference keys session
    counters ``"{mode}/{year}"`` (gui/pdf_processor_app.py:596-616) and
    renders TYPE_PATTERNS display strings (gui/constants.py:9-13).  The
    Spark form runs the two-phase dense-rank numbering
    (pipeline.numbering.with_sequence — no single-task global sort)
    partitioned by (mode, year); this oracle proves it row-for-row equal
    to a plain windowed row_number."""
    from archvisier_spark.pipeline.numbering import with_sequence

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    base = orders.select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("yr")
    ).withColumn("work_mode", F.lit("KP"))
    numbered = with_sequence(
        base, order_col="o_orderkey", partition_cols=("work_mode", "yr"),
        out_col="lp_year",
    )
    return numbered.select(
        "o_orderkey",
        "yr",
        "lp_year",
        F.concat(
            F.lit("KP/"), F.col("lp_year").cast("string"),
            F.lit("/"), F.col("yr").cast("string"),
        ).alias("display_number"),
    )


_COUNTER_DISPLAY_SQL = """
SELECT o_orderkey, yr, lp_year,
       'KP/' || CAST(lp_year AS VARCHAR) || '/' || CAST(yr AS VARCHAR) AS display_number
FROM (
  SELECT o_orderkey,
         extract(year FROM o_orderdate) AS yr,
         row_number() OVER (PARTITION BY extract(year FROM o_orderdate)
                            ORDER BY o_orderkey) AS lp_year
  FROM orders WHERE o_orderkey < 2000
)
"""


# --- argmax/argmin (T3/T4: max_by / min_by) ---

def q_cheapest_part_per_order(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.groupBy("l_orderkey").agg(
        F.expr("min_by(l_partkey, struct(l_extendedprice, l_partkey))").alias("cheapest_part"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
    )


_CHEAPEST_PART_SQL = """
SELECT l_orderkey,
       min(CASE WHEN rn = 1 THEN l_partkey END) AS cheapest_part,
       round(min(l_extendedprice), 2) AS min_price
FROM (
  SELECT l_orderkey, l_partkey, l_extendedprice,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_extendedprice ASC, l_partkey ASC) AS rn
  FROM lineitem WHERE l_orderkey <= 1000
)
GROUP BY l_orderkey
"""


# --- sort + limit (T5) ---

def q_latest_orders(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_orderdate"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                F.round("o_totalprice", 2).alias("totalprice"))
    )


_LATEST_ORDERS_SQL = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o_totalprice, 2) AS totalprice
FROM orders
ORDER BY o_orderdate DESC, o_orderkey ASC
LIMIT 10
"""


# --- K3: built-in levenshtein over a small cross join ---

def q_nation_name_distances(spark, sf_dir):
    nation = _t(spark, sf_dir, "nation").select("n_name")
    region = _t(spark, sf_dir, "region").select("r_name")
    return (
        nation.crossJoin(F.broadcast(region))
        .select("n_name", "r_name", F.levenshtein("n_name", "r_name").alias("edit_distance"))
        .filter(F.col("edit_distance") <= 8)
    )


_NATION_DISTANCES_SQL = """
SELECT n_name, r_name, levenshtein(n_name, r_name) AS edit_distance
FROM nation CROSS JOIN region
WHERE levenshtein(n_name, r_name) <= 8
"""


# --- rollup (hierarchical aggregate; beyond the reference's flat aggs;
# retired from the driver window in round 6 to make room for
# extract_raster_ocr — grouped-agg evidence stays live via
# tpch_pricing_summary/nation_revenue, and this oracle keeps running in
# tests/test_ops_retired.py) ---

def q_revenue_rollup(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
             F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "total_price", "n",
        )
    )


_REVENUE_ROLLUP_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(sum(l_extendedprice), 2) AS total_price,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --- relational set ops (§2.8 extension: UNION / EXCEPT) ---

def q_customer_supplier_nations(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    only_customers = cust.distinct().exceptAll(supp.distinct()).withColumn("side", F.lit("customer_only"))
    both = cust.intersect(supp).withColumn("side", F.lit("both"))
    return only_customers.unionByName(both).groupBy("side").agg(F.count("*").alias("n_nations"))


_SET_OPS_SQL = """
WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier),
     sides AS (
       SELECT 'customer_only' AS side FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
       UNION ALL
       SELECT 'both' AS side FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
     )
SELECT side, count(*) AS n_nations FROM sides GROUP BY side
"""


# --- exact percentiles (distribution stats tier) ---

def q_price_percentiles(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
    )


_PRICE_PERCENTILES_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 4)  AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
FROM lineitem GROUP BY l_returnflag
"""


# Retired from the driver registry in round 4 (the harness records only
# the first 50 queries, and 53 were registered — round-3 verdict #1); the
# functions stay implemented, plan-tested and oracle-tested in pytest
# (tests/test_ops_retired.py), their SURVEY §2 rows covered by the
# remaining entries:
#   tpch_top_revenue_orders    — join+sort+limit ≡ tpch_latest_orders (T5)
#                                + tpch_nation_revenue (join-agg)
#   tpch_cheapest_part_per_order — min_by argmin ≡ events_argmax_event (T3/T4)
#                                + tpch_top3_orders_per_customer (window)
#   tpch_counter_rownum        — A2 counters ≡ a2_counter_display (the
#                                richer 2000-row {mode}/{year}+SA oracle)
RETIRED_QUERIES = {
    "tpch_revenue_rollup": q_revenue_rollup,
    "tpch_top_revenue_orders": q_top_revenue_orders,
    "tpch_cheapest_part_per_order": q_cheapest_part_per_order,
    "tpch_counter_rownum": q_counter_rownum,
}

QUERIES = {
    "tpch_pricing_summary": q_pricing_summary,
    "tpch_set_ops_nations": q_customer_supplier_nations,
    "tpch_price_percentiles": q_price_percentiles,
    "tpch_nation_revenue": q_nation_revenue,
    "tpch_orders_with_returns": q_orders_with_returns,
    "tpch_customers_without_orders": q_customers_without_orders,
    "tpch_top3_orders_per_customer": q_top3_orders_per_customer,
    "a2_counter_display": q_counter_display,
    "tpch_latest_orders": q_latest_orders,
    "tpch_nation_name_distances": q_nation_name_distances,
}

RETIRED_ORACLES = {
    "tpch_revenue_rollup": _REVENUE_ROLLUP_SQL,
    "tpch_top_revenue_orders": _TOP_REVENUE_SQL,
    "tpch_cheapest_part_per_order": _CHEAPEST_PART_SQL,
    "tpch_counter_rownum": _COUNTER_ROWNUM_SQL,
}

ORACLES = {
    "tpch_pricing_summary": _PRICING_SQL,
    "tpch_set_ops_nations": _SET_OPS_SQL,
    "tpch_price_percentiles": _PRICE_PERCENTILES_SQL,
    "tpch_nation_revenue": _NATION_REVENUE_SQL,
    "tpch_orders_with_returns": _ORDERS_WITH_RETURNS_SQL,
    "tpch_customers_without_orders": _CUSTOMERS_WITHOUT_ORDERS_SQL,
    "tpch_top3_orders_per_customer": _TOP3_ORDERS_SQL,
    "a2_counter_display": _COUNTER_DISPLAY_SQL,
    "tpch_latest_orders": _LATEST_ORDERS_SQL,
    "tpch_nation_name_distances": _NATION_DISTANCES_SQL,
}
