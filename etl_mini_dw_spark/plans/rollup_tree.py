"""Multi-granularity rollup tree from ONE staged fine grain (extension).

The materialized-view discipline behind every 100 TB dashboard: the fact
table is aggregated ONCE to the finest stored grain (here: day), and
every coarser grain — month, quarter, year — derives from that staged
frame, never from the raw facts. Exact DECIMAL sums make the re-
aggregation lossless (decimal addition is associative), which is the
property that makes rollup trees *correct*, not just fast — the same
mergeability argument as the HLL sketch rollup (`plans/sketches.py`),
here in its exact form.

Plan: one lineitem⋈orders shuffle + day aggregate (lazily checkpointed =
the stored day table), then three tiny re-aggregates over ~thousands of
day rows, unioned long-form: (grain, period, revenue, n_days).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import typed_table

_REV = "l_extendedprice * (1 - l_discount)"


def rollup_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = typed_table(spark, sf_dir, "lineitem")
    orders = typed_table(spark, sf_dir, "orders")
    day = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.sum(F.expr(_REV)).cast("decimal(38,4)").alias("rev"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .localCheckpoint(eager=False)  # the stored finest grain
    )

    def _grain(name: str, period: F.Column) -> DataFrame:
        return day.groupBy(period.alias("period")).agg(
            F.sum("rev").cast("decimal(38,4)").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_days"),
            F.sum("n_lines").cast("bigint").alias("n_lines"),
        ).select(F.lit(name).alias("grain"), "period", "revenue", "n_days", "n_lines")

    grains = [
        _grain("month", F.date_format("day", "yyyy-MM")),
        _grain(
            "quarter",
            F.concat(F.year("day").cast("string"), F.lit("-Q"), F.quarter("day").cast("string")),
        ),
        _grain("year", F.year("day").cast("string")),
    ]
    return reduce(lambda a, b: a.unionByName(b), grains)


ROLLUP_TREE_SQL = f"""
WITH day AS (
  SELECT o_orderdate AS day,
         CAST(SUM({_REV}) AS DECIMAL(38,4)) AS rev,
         COUNT(*) AS n_lines
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1
),
g AS (
  SELECT 'month' AS grain, strftime(day, '%Y-%m') AS period, rev, n_lines FROM day
  UNION ALL
  SELECT 'quarter', CAST(EXTRACT(year FROM day) AS VARCHAR) || '-Q'
         || CAST(EXTRACT(quarter FROM day) AS VARCHAR), rev, n_lines FROM day
  UNION ALL
  SELECT 'year', CAST(EXTRACT(year FROM day) AS VARCHAR), rev, n_lines FROM day
)
SELECT grain, period,
       CAST(CAST(SUM(rev) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
       COUNT(*) AS n_days,
       CAST(SUM(n_lines) AS BIGINT) AS n_lines
FROM g GROUP BY grain, period
"""
