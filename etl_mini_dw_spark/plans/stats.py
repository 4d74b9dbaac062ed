"""Statistical analytics II: trend slopes and hierarchical shares.

- revenue_trend_slope: per-region least-squares slope of daily revenue
  over time — the trend-detection signal behind "is this segment
  growing". Classic sufficient-statistics shape: the five exact
  aggregates (n, Σx, Σy, Σxy, Σx²) reduce order-free (BIGINT/DECIMAL),
  and the closed-form slope/intercept are evaluated once per group in
  identically-shaped IEEE double, rounded to the repo's 6-dp ratio
  convention (Σxy exceeds 2^53 so its decimal→double cast can differ by
  an ulp between engines — same remedy as the anomaly z-score).
- nation_share_of_region: share-of-parent across the geography
  hierarchy (nation revenue / region revenue) — one aggregate plus a
  window over ≤nations-per-region partitions.

Both: one fact-side shuffle, broadcast dimension chains, bounded
windows. Nothing global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import typed_table

_REV = "l_extendedprice * (1 - l_discount)"
_X_EPOCH = "1992-01-01"  # day index origin


def revenue_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-region OLS slope+intercept of daily revenue vs day index."""
    li = typed_table(spark, sf_dir, "lineitem")
    orders = typed_table(spark, sf_dir, "orders")
    customer = typed_table(spark, sf_dir, "customer")
    nation = typed_table(spark, sf_dir, "nation")
    region = typed_table(spark, sf_dir, "region")
    daily = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("o_orderdate").alias("day"))
        .agg(F.sum(F.expr(_REV)).cast("decimal(18,4)").alias("y"))
        .withColumn("x", F.datediff("day", F.lit(_X_EPOCH).cast("date")).cast("bigint"))
    )
    stats = daily.groupBy("region").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("decimal(38,4)").cast("double").alias("sy"),
        # x as DECIMAL(10,0) keeps the product at (29,4) — a raw
        # bigint×decimal would hit Spark's 38-precision cap and shed scale
        F.sum(F.col("x").cast("decimal(10,0)") * F.col("y"))
        .cast("decimal(38,4)")
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.count(F.lit(1)).alias("n_days"),
    )
    slope = ((F.col("n") * F.col("sxy")) - (F.col("sx") * F.col("sy"))) / (
        (F.col("n") * F.col("sxx")) - (F.col("sx") * F.col("sx"))
    )
    intercept = (F.col("sy") - (slope * F.col("sx"))) / F.col("n")
    return stats.select(
        "region",
        "n_days",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )


REVENUE_TREND_SQL = f"""
WITH daily AS (
  SELECT r_name AS region, o_orderdate AS day,
         CAST(SUM({_REV}) AS DECIMAL(18,4)) AS y
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY 1, 2
),
xy AS (
  SELECT region, y,
         CAST(datediff('day', DATE '{_X_EPOCH}', day) AS BIGINT) AS x
  FROM daily
),
stats AS (
  SELECT region,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(CAST(SUM(y) AS DECIMAL(38,4)) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(x AS DECIMAL(10,0)) * y) AS DECIMAL(38,4)) AS DOUBLE) AS sxy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         COUNT(*) AS n_days
  FROM xy GROUP BY region
)
SELECT region, n_days,
       round(((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx)), 6) AS slope,
       round((sy - (((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx))) * sx) / n, 6)
         AS intercept
FROM stats
"""


def nation_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation with its share of the parent region."""
    li = typed_table(spark, sf_dir, "lineitem")
    orders = typed_table(spark, sf_dir, "orders")
    customer = typed_table(spark, sf_dir, "customer")
    nation = typed_table(spark, sf_dir, "nation")
    region = typed_table(spark, sf_dir, "region")
    per_nation = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(F.expr(_REV)).cast("decimal(38,4)").alias("rev"))
    )
    w = Window.partitionBy("region")
    return per_nation.select(
        "region",
        "nation",
        F.col("rev").cast("double").alias("nation_revenue"),
        F.round(
            F.col("rev").cast("double") / F.sum("rev").over(w).cast("double"), 6
        ).alias("share_of_region"),
    )


NATION_SHARE_SQL = f"""
WITH per_nation AS (
  SELECT r_name AS region, n_name AS nation,
         CAST(SUM({_REV}) AS DECIMAL(38,4)) AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY 1, 2
)
SELECT region, nation,
       CAST(rev AS DOUBLE) AS nation_revenue,
       round(CAST(rev AS DOUBLE)
             / CAST(SUM(rev) OVER (PARTITION BY region) AS DOUBLE), 6)
         AS share_of_region
FROM per_nation
"""


def value_rank_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type rank normalization (percent_rank) of the event measure —
    the distribution-free feature transform (quantile normalization)
    model pipelines apply to heavy-tailed inputs.

    percent_rank assigns tied values the SAME rank, so the output is
    deterministic without a tie-breaker; inputs to the (rank−1)/(n−1)
    division are exact integers ⇒ identical doubles everywhere. Per-type
    sort locally; the 100 TB path pre-buckets by approximate quantiles
    exactly like `curation.quality_deciles`.
    """
    ev = typed_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    w = Window.partitionBy("event_type").orderBy("value")
    return ev.select(
        "event_id",
        "event_type",
        F.col("value").cast("double").alias("value"),
        F.round(F.percent_rank().over(w), 6).alias("value_pr"),
    )


VALUE_RANK_NORM_SQL = """
SELECT event_id, event_type,
       CAST(CAST(value AS DECIMAL(14,2)) AS DOUBLE) AS value,
       round(percent_rank() OVER (PARTITION BY event_type
                                  ORDER BY CAST(value AS DECIMAL(14,2))), 6) AS value_pr
FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
"""
