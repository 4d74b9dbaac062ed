"""Headline analytic queries (SURVEY §7 M0 flagship; operators S1/J1/J2/P2/A2/A4/O1).

These are the "BI mart consumer" queries of the engine: multi-way joins +
derived decimal measures + grouped aggregation, expressed declaratively so
Catalyst does pushdown/pruning/join-selection.

Scale notes (100 TB):
- lineitem⋈orders is the big join: both sides shuffle on orderkey. On a
  real cluster both tables would be bucketed/cluster-written on the order
  key at ingest so this becomes a co-located join; here AQE picks the
  strategy.
- customer/nation/region/part/supplier are dimension-sized → Spark
  auto-broadcasts (≤10 MB); we hint `F.broadcast` explicitly so the plan
  survives stats being absent.
- Aggregations are exact DECIMAL: reproducible under any partitioning
  (float SUM is not), and map-side partial aggregation still applies.
- Ratios (avg_*) are computed as double(exact-decimal-sum)/count — the
  one deterministic cross-engine form for division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import typed_table


def flagship_revenue_by_month_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order month × market segment.

    Mirrors the reference's mart-consumer shape (fact ⋈ dims ⋈ DimDate →
    grouped measures, `code/SQL_1…sql:1597–1612` + P2 measures
    `code/SQL_1…sql:498–499`).
    """
    lineitem = typed_table(spark, sf_dir, "lineitem")
    orders = typed_table(spark, sf_dir, "orders")
    customer = typed_table(spark, sf_dir, "customer")

    revenue = (F.col("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount")))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "inner")
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"), "inner")
        .groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
        .agg(
            F.sum(revenue).cast("decimal(38,4)").cast("double").alias("revenue"),
            F.sum("l_quantity").cast("decimal(38,2)").cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


FLAGSHIP_ORACLE_SQL = """
SELECT strftime(o_orderdate, '%Y-%m')                        AS order_month,
       c_mktsegment                                          AS mktsegment,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
            AS DOUBLE)                                        AS revenue,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       COUNT(*)                                              AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
"""


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary (A2/A4 battery on exact decimals)."""
    lineitem = typed_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(4,2)") + F.col("l_tax"))
    cnt = F.count(F.lit(1))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("decimal(38,2)").cast("double").alias("sum_qty"),
            F.sum("l_extendedprice").cast("decimal(38,2)").cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("decimal(38,4)").cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(38,6)").cast("double").alias("sum_charge"),
            (F.sum("l_quantity").cast("double") / cnt).alias("avg_qty"),
            (F.sum("l_extendedprice").cast("double") / cnt).alias("avg_price"),
            (F.sum("l_discount").cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


Q1_ORACLE_SQL = """
WITH li AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS DECIMAL(12,2))      AS qty,
         CAST(l_extendedprice AS DECIMAL(14,2)) AS price,
         CAST(l_discount AS DECIMAL(4,2))       AS disc,
         CAST(l_tax AS DECIMAL(4,2))            AS tax
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
)
SELECT l_returnflag, l_linestatus,
       CAST(SUM(qty) AS DOUBLE)                                               AS sum_qty,
       CAST(SUM(price) AS DOUBLE)                                             AS sum_base_price,
       CAST(SUM(price * (CAST(1 AS DECIMAL(4,2)) - disc)) AS DOUBLE)          AS sum_disc_price,
       CAST(SUM(price * (CAST(1 AS DECIMAL(4,2)) - disc)
                      * (CAST(1 AS DECIMAL(4,2)) + tax)) AS DOUBLE)           AS sum_charge,
       CAST(SUM(qty) AS DOUBLE) / COUNT(*)                                    AS avg_qty,
       CAST(SUM(price) AS DOUBLE) / COUNT(*)                                  AS avg_price,
       CAST(SUM(disc) AS DOUBLE) / COUNT(*)                                   AS avg_disc,
       COUNT(*)                                                               AS count_order
FROM li
GROUP BY l_returnflag, l_linestatus
"""


def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped: lineitem⋈orders⋈customer⋈nation⋈region chain.

    The dimension chain (customer→nation→region) is a cascade of
    broadcast joins — only the lineitem⋈orders step shuffles.
    """
    lineitem = typed_table(spark, sf_dir, "lineitem")
    orders = typed_table(spark, sf_dir, "orders")
    customer = typed_table(spark, sf_dir, "customer")
    nation = typed_table(spark, sf_dir, "nation")
    region = typed_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.sum(revenue).cast("decimal(38,4)").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


REVENUE_BY_REGION_SQL = """
SELECT r_name AS region_name, n_name AS nation_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2
"""


def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped: filter both sides pre-join, agg, deterministic top-10."""
    lineitem = typed_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    orders = typed_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(revenue).cast("decimal(38,4)").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


TOP_UNSHIPPED_SQL = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
            AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def order_priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped: EXISTS semi-join (left_semi) — orders having at
    least one returned line, counted per priority. The semi-join sends
    only the join key of the probe side through the shuffle."""
    orders = typed_table(spark, sf_dir, "orders")
    returned = typed_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def distinct_suppliers_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group (Q16-shaped) — Spark expands to a
    two-level aggregate (distinct on (brand, supp) then count), fully
    partial-aggregable."""
    li = typed_table(spark, sf_dir, "lineitem")
    part = typed_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


DISTINCT_SUPPLIERS_SQL = """
SELECT p_brand, COUNT(DISTINCT l_suppkey) AS supplier_cnt, COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped: LEFT OUTER join + two-level aggregation —
    distribution of customers by how many orders they have (including
    zero-order customers, which only the outer join surfaces)."""
    customer = typed_table(spark, sf_dir, "customer")
    orders = typed_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


CUSTOMER_ORDER_DIST_SQL = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
GROUP BY c_count
"""
