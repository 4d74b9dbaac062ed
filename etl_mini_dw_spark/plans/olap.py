"""OLAP operators beyond the reference's surface (Spark-first completeness).

The reference uses no grouping sets / pivot / quantiles / native session
windows (SURVEY §2.5 "not present") — but a user switching to this engine
gets them as first-class, oracle-checked operators. All exact-decimal /
count-based (pivot, rollup) or deterministically rounded (quantiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import typed_table

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) median/p90 per event type.

    Exact ``percentile`` needs a per-group sort — fine for bounded group
    counts; at 100 TB switch to ``percentile_approx`` (t-digest, partial-
    aggregable) when ±ε is acceptable.
    """
    ev = typed_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(CAST(value AS DOUBLE), 0.5)"), 6).alias("median_value"),
        F.round(F.expr("percentile(CAST(value AS DOUBLE), 0.9)"), 6).alias("p90_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


EVENTS_QUANTILES_SQL = """
SELECT event_type,
       round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS median_value,
       round(quantile_cont(CAST(value AS DOUBLE), 0.9), 6) AS p90_value,
       COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


def events_pivot_type_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: daily event counts, one column per event type (explicit
    value list keeps the schema static — required at scale anyway)."""
    ev = typed_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )


EVENTS_PIVOT_SQL = (
    "SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day, "
    + ", ".join(
        f"COUNT(*) FILTER (WHERE event_type = '{t}') AS \"{t}\"" for t in EVENT_TYPES
    )
    + " FROM events GROUP BY 1"
)


def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) with grouping id — subtotal
    levels computed in one pass (partial-aggregable at any scale)."""
    li = typed_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("decimal(38,2)").cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
        F.grouping_id().cast("int").alias("gid"),
    )


SALES_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n,
       CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS INTEGER) AS gid
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""
