"""Winsorization / robust scaling of a measure (extension).

The feature-engineering step before any mean-based model sees a
heavy-tailed measure: clip each group's values to its [p05, p95] band
and report the clipped means beside the raw ones.

Exactness trick: the bounds are DISCRETE order statistics (the value AT
rank ⌈p·n⌉, an actual data point) rather than interpolated percentiles —
so the bound is an exact DECIMAL, the clipped value stays an exact
DECIMAL, and the winsorized sums remain reduction-order-free. An
interpolated bound would be a double and poison every downstream sum
(the exact-decimal-then-double contract, CLAUDE.md). Rank arithmetic is
pure integer: k = (p·n + 99) div 100 on both engines.

Scale: the rank window is a per-event_type sort — the exact-order-
statistic cost, bounded by group size (same caveat and same scale swap
as `olap.events_value_quantiles`: `approx_percentile`'s t-digest at
100 TB, identical plan otherwise). Bounds are #groups rows, broadcast
back; clipping and the final aggregate are map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import typed_table

P_LO, P_HI = 5, 95  # winsorization band, in percent


def value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: raw vs winsorized mean + clip counts."""
    ev = typed_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    k_lo = F.expr(f"({P_LO} * n + 99) div 100")
    k_hi = F.expr(f"({P_HI} * n + 99) div 100")
    bounds = ranked.groupBy("event_type").agg(
        F.min(F.when(F.col("rn") == k_lo, F.col("value"))).alias("lo"),
        F.min(F.when(F.col("rn") == k_hi, F.col("value"))).alias("hi"),
    )
    clipped = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "value",
        "lo",
        "hi",
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias("wv"),
    )
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_low"),
        F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_high"),
        F.min("lo").cast("double").alias("p05"),
        F.min("hi").cast("double").alias("p95"),
        (F.sum("value").cast("decimal(38,2)").cast("double") / F.count(F.lit(1)))
        .alias("mean_raw"),
        (F.sum("wv").cast("decimal(38,2)").cast("double") / F.count(F.lit(1)))
        .alias("mean_winsorized"),
    )


VALUE_WINSORIZED_SQL = f"""
WITH ev AS (
  SELECT event_id, event_type, CAST(value AS DECIMAL(14,2)) AS value
  FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
),
ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM ev
),
bounds AS (
  SELECT event_type,
         MIN(CASE WHEN rn = ({P_LO} * n + 99) // 100 THEN value END) AS lo,
         MIN(CASE WHEN rn = ({P_HI} * n + 99) // 100 THEN value END) AS hi
  FROM ranked GROUP BY event_type
),
clipped AS (
  SELECT ev.event_type, value, lo, hi,
         least(greatest(value, lo), hi) AS wv
  FROM ev JOIN bounds USING (event_type)
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
       CAST(SUM(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
       CAST(MIN(lo) AS DOUBLE) AS p05,
       CAST(MIN(hi) AS DOUBLE) AS p95,
       CAST(CAST(SUM(value) AS DECIMAL(38,2)) AS DOUBLE) / COUNT(*) AS mean_raw,
       CAST(CAST(SUM(wv) AS DECIMAL(38,2)) AS DOUBLE) / COUNT(*) AS mean_winsorized
FROM clipped
GROUP BY event_type
"""
