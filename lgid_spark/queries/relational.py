"""Relational operator coverage: scans, projections/filters (SURVEY §2.2),
joins J1/J4/J5 (§2.3), aggregations A1-A10 (§2.4), sorts/top-k O1-O4 (§2.6).

Plans (verified via .explain): dimension joins broadcast; Q1-style agg is
partial-agg (map-side combine) → single shuffle on the 6-value group key;
top-k uses TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import dec, dsum, t, us

QUERIES = {}
ORACLE_SQL = {}


def _q(name):
    def reg(fn):
        QUERIES[name] = fn
        return fn
    return reg


# ---------------------------------------------------------------------------
# q1_pricing_summary — TPC-H Q1 shape: scan-filter-agg with map-side combine.
# Covers A7/A9-style aggregate semantics (avg/count per group).
# ---------------------------------------------------------------------------

@_q("q1_pricing_summary")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice", 12, 2) * (F.lit(1).cast("decimal(3,2)") - dec("l_discount", 3, 2))
    charge = disc_price * (F.lit(1).cast("decimal(3,2)") + dec("l_tax", 3, 2))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2002-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (dsum("l_quantity") / F.count("*")).alias("avg_qty"),
            (dsum("l_extendedprice") / F.count("*")).alias("avg_price"),
            (dsum("l_discount", 3, 2) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_SQL["q1_pricing_summary"] = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '2002-09-01'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q3_top_revenue — 3-way join + agg + deterministic top-10
# (J4-style fact×fact equi-join; O3 sort; TakeOrderedAndProject).
# ---------------------------------------------------------------------------

@_q("q3_top_revenue")
def q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    revenue = dec("l_extendedprice", 12, 2) * (F.lit(1).cast("decimal(3,2)") - dec("l_discount", 3, 2))
    # join order kept li-first (r6 note): reducing orders by the
    # BUILDING dimension first reads nicely but plans WORSE — a join
    # OUTPUT has no usable size estimate, so the planner then picks
    # the column-pruned lineitem (est ~31 MB) as the broadcast build
    # side: a 6M-row fact hash relation (measured 2.1 s → 3.9 s at
    # sf1-like scale). As written, orders (under the threshold) is the
    # build side and lineitem is never shuffled; at 100× both sides
    # exceed the threshold and it degrades to a plain sort-merge join.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", us("o_orderdate").alias("o_orderdate_us"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


ORACLE_SQL["q3_top_revenue"] = """
SELECT o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate_us
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# region_rollup — snowflake broadcast-join chain (J1/J5 dimension joins).
# ---------------------------------------------------------------------------

@_q("region_rollup")
def region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )


ORACLE_SQL["region_rollup"] = """
SELECT r_name AS region_name,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# ---------------------------------------------------------------------------
# mistake_histogram — A10: count per (real, pred) pair sorted desc
# (main.py:393-415 semantics) expressed over orders: status × priority.
# ---------------------------------------------------------------------------

@_q("mistake_histogram")
def mistake_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.col("o_orderstatus").alias("real_label"),
            F.col("o_orderpriority").alias("pred_label"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("real_label"), F.asc("pred_label"))
    )


ORACLE_SQL["mistake_histogram"] = """
SELECT o_orderstatus AS real_label, o_orderpriority AS pred_label, COUNT(*) AS n
FROM orders
GROUP BY o_orderstatus, o_orderpriority
ORDER BY n DESC, real_label ASC, pred_label ASC
"""


# ---------------------------------------------------------------------------
# common_code_discovery — A4 semantics (util.py:205-243 find_common_codes):
# explode multi-valued key, count, keep argmax per name with deterministic
# ties. Expressed over lineitem: most common returnflag per suppkey bucket.
# ---------------------------------------------------------------------------

@_q("common_code_discovery")
def common_code_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    counts = (
        li.groupBy("l_suppkey", "l_returnflag")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("l_suppkey").orderBy(F.desc("n"), F.asc("l_returnflag"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("l_suppkey", F.col("l_returnflag").alias("common_flag"), "n")
    )


ORACLE_SQL["common_code_discovery"] = """
SELECT l_suppkey, common_flag, n FROM (
  SELECT l_suppkey, l_returnflag AS common_flag, COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY COUNT(*) DESC, l_returnflag ASC) AS rk
  FROM lineitem
  GROUP BY l_suppkey, l_returnflag
) WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# accuracy_join — J4 + A7: join "predictions" to "gold" and compute accuracy
# per group (main.py:374-423 semantics) over orders-vs-lineitem status.
# ---------------------------------------------------------------------------

@_q("accuracy_join")
def accuracy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    match = (F.col("l_linestatus") == F.col("o_orderstatus")).cast("int")
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("total"),
            F.sum(match).alias("n_right"),
            (F.sum(match) / F.count("*")).alias("accuracy"),
        )
    )


ORACLE_SQL["accuracy_join"] = """
SELECT l_returnflag,
       COUNT(*) AS total,
       CAST(SUM(CASE WHEN l_linestatus = o_orderstatus THEN 1 ELSE 0 END) AS BIGINT) AS n_right,
       CAST(SUM(CASE WHEN l_linestatus = o_orderstatus THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS accuracy
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
"""
