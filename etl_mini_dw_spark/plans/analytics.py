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


def min_price_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-shaped correlated subquery: for each part (bounded probe
    set), the supplier(s) that shipped it at the minimum unit price.

    The correlated `MIN` decorrelates into an aggregate + equi-join-back
    — Spark and modern planners do exactly this rewrite; expressing it
    directly keeps the plan two hash joins on l_partkey (no per-row
    subquery execution, which is what kills correlated queries at scale).
    """
    li = typed_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    probe = li.filter(F.col("l_partkey") < 200)
    min_price = probe.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("min_price")
    )
    sup = typed_table(spark, sf_dir, "supplier")
    return (
        probe.join(
            F.broadcast(min_price),
            (probe.l_partkey == min_price.l_partkey)
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .drop(min_price.l_partkey)
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_partkey",
            "s_suppkey",
            "s_name",
            F.col("min_price").cast("double").alias("min_price"),
        )
        .distinct()
    )


MIN_PRICE_SUPPLIER_SQL = """
SELECT DISTINCT l_partkey, s_suppkey, s_name,
       CAST(min_price AS DOUBLE) AS min_price
FROM (
  SELECT l_partkey, l_suppkey,
         CAST(l_extendedprice AS DECIMAL(14,2)) AS price,
         MIN(CAST(l_extendedprice AS DECIMAL(14,2))) OVER (PARTITION BY l_partkey) AS min_price
  FROM lineitem WHERE l_partkey < 200)
JOIN supplier ON l_suppkey = s_suppkey
WHERE price = min_price
"""


def top_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped: revenue lost to returns per customer in a
    quarter, top 20 (deterministic tiebreak on custkey)."""
    li = typed_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = typed_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    customer = typed_table(spark, sf_dir, "customer")
    nation = typed_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).cast("decimal(38,4)").cast("double").alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), "c_custkey")
        .limit(20)
    )


TOP_RETURNED_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
            AS DOUBLE) AS lost_revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3
ORDER BY lost_revenue DESC, c_custkey
LIMIT 20
"""


def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped: promo revenue share per month — conditional
    aggregation (CASE inside SUM), ratio taken on DOUBLEs derived from
    exact DECIMAL sums (both engines divide identical doubles)."""
    li = typed_table(spark, sf_dir, "lineitem")
    part = typed_table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount"))
    promo = F.when(
        F.col("p_type").startswith("PROMO"), revenue.cast("decimal(18,4)")
    ).otherwise(F.lit(0.00).cast("decimal(18,4)"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(promo).cast("decimal(38,4)").cast("double").alias("promo_revenue"),
            F.sum(revenue).cast("decimal(38,4)").cast("double").alias("total_revenue"),
        )
        .withColumn(
            "promo_share",
            F.round(F.col("promo_revenue") / F.col("total_revenue"), 6),
        )
    )


PROMO_REVENUE_SQL = """
SELECT ship_month,
       CAST(promo_rev AS DOUBLE) AS promo_revenue,
       CAST(total_rev AS DOUBLE) AS total_revenue,
       round(CAST(promo_rev AS DOUBLE) / CAST(total_rev AS DOUBLE), 6) AS promo_share
FROM (
  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
         SUM(CASE WHEN p_type LIKE 'PROMO%'
                  THEN CAST(CAST(l_extendedprice AS DECIMAL(14,2))
                            * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                            AS DECIMAL(18,4))
                  ELSE CAST(0.00 AS DECIMAL(18,4)) END) AS promo_rev,
         SUM(CAST(l_extendedprice AS DECIMAL(14,2))
             * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1)
"""


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped: orders whose total quantity clears a threshold
    (GROUP BY + HAVING on the fact), joined back to customer detail —
    the HAVING prunes before the dimension join ever happens."""
    li = typed_table(spark, sf_dir, "lineitem")
    orders = typed_table(spark, sf_dir, "orders")
    customer = typed_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("decimal(38,2)").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


LARGE_VOLUME_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-shaped: per-nation revenue kept only if it exceeds a
    fraction of the GLOBAL total — the scalar subquery is hoisted into a
    1-row broadcast cross join (P12 pattern), never a driver collect."""
    li = typed_table(spark, sf_dir, "lineitem")
    sup = typed_table(spark, sf_dir, "supplier")
    nation = typed_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount"))
    per_nation = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("decimal(38,4)").alias("nation_rev"))
    )
    total = per_nation.agg(F.sum("nation_rev").cast("decimal(38,4)").alias("total_rev"))
    return (
        per_nation.crossJoin(F.broadcast(total))
        .filter(F.col("nation_rev").cast("double") > F.col("total_rev").cast("double") / 30)
        .select(
            "n_name",
            F.col("nation_rev").cast("double").alias("nation_revenue"),
            F.round(
                F.col("nation_rev").cast("double") / F.col("total_rev").cast("double"), 6
            ).alias("revenue_share"),
        )
    )


NATION_REVENUE_SHARE_SQL = """
WITH per_nation AS (
  SELECT n_name,
         SUM(CAST(l_extendedprice AS DECIMAL(14,2))
             * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS nation_rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name),
total AS (SELECT SUM(nation_rev) AS total_rev FROM per_nation)
SELECT n_name,
       CAST(nation_rev AS DOUBLE) AS nation_revenue,
       round(CAST(nation_rev AS DOUBLE) / CAST(total_rev AS DOUBLE), 6) AS revenue_share
FROM per_nation, total
WHERE CAST(nation_rev AS DOUBLE) > CAST(total_rev AS DOUBLE) / 30
"""


def revenue_by_category_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue re-attributed to the customer CATEGORY each customer was in
    at a fixed analysis date — the query point-in-time snapshots exist
    for: "what would this report have said with the dimension as of
    MID?" A current-rows join silently re-states history after every
    attribute change; the as-of join pins it.

    Shape: fact-side lineitem⋈orders shuffle (the one wide join), then a
    broadcast left join against the dim-sized snapshot on the natural
    key. Customers not yet existing at the analysis date fall into
    'N/A' (identical COALESCE both sides). Exact-DECIMAL revenue until
    the final double cast.
    """
    from etl_mini_dw_spark import fixtures_spec as spec
    from etl_mini_dw_spark.operators import scd2

    lineitem = typed_table(spark, sf_dir, "lineitem")
    orders = typed_table(spark, sf_dir, "orders")
    snap = scd2.dim_asof_snapshot(spark, sf_dir, spec.DIMS["customer"], spec.MID)
    revenue = F.col("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(
                snap.select(
                    F.col("customer_nk").alias("cust"),
                    F.col("customer_category_name").alias("cat"),
                )
            ),
            F.col("o_custkey") == F.col("cust"),
            "left",
        )
        .groupBy(F.coalesce(F.col("cat"), F.lit("N/A")).alias("category"))
        .agg(
            F.sum(revenue).cast("decimal(38,4)").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def revenue_by_category_asof_sql(dim_initial_sql: str, mid_ts: str) -> str:
    return f"""
WITH snap AS (
  SELECT * FROM ({dim_initial_sql})
  WHERE active_from <= TIMESTAMP '{mid_ts}' AND active_to > TIMESTAMP '{mid_ts}'
)
SELECT COALESCE(s.customer_category_name, 'N/A') AS category,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
LEFT JOIN snap s ON s.customer_nk = o_custkey
GROUP BY 1
"""


def revenue_by_role_playing_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role-playing date dimension: the SAME generated DimDate joined in
    two roles — order date and ship date — to answer "how does revenue
    placed on weekday X ship across weekdays Y" (the Kimball role-play
    pattern; the reference keeps one DimDate for exactly this reason,
    `code/SQL_1…sql:1057–1062`).

    Both role joins are broadcasts of the dim (date grain, always tiny);
    the only shuffle is the final 7×7-key aggregate.
    """
    from etl_mini_dw_spark.functions.dimdate import build_dim_date
    from etl_mini_dw_spark import fixtures_spec as spec

    lineitem = typed_table(spark, sf_dir, "lineitem")
    orders = typed_table(spark, sf_dir, "orders")
    dd = build_dim_date(spark, spec.DATE_START, spec.DATE_END)
    order_role = dd.select(
        F.col("date_value").alias("o_date"),
        F.col("day_of_week_name").alias("order_day_name"),
    )
    ship_role = dd.select(
        F.col("date_value").alias("s_date"),
        F.col("day_of_week_name").alias("ship_day_name"),
    )
    revenue = F.col("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(order_role), F.to_date("o_orderdate") == F.col("o_date"))
        .join(F.broadcast(ship_role), F.to_date("l_shipdate") == F.col("s_date"))
        .groupBy("order_day_name", "ship_day_name")
        .agg(
            F.sum(revenue).cast("decimal(38,4)").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def revenue_by_role_playing_dates_sql() -> str:
    from etl_mini_dw_spark.functions.dimdate import SWEDISH_DAYS

    day_case = " ".join(f"WHEN {k} THEN '{v[0]}'" for k, v in SWEDISH_DAYS.items())
    return f"""
SELECT CASE isodow(CAST(o_orderdate AS DATE)) {day_case} END AS order_day_name,
       CASE isodow(CAST(l_shipdate AS DATE)) {day_case} END AS ship_day_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""
