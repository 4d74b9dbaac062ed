"""Statistical anomaly detection over warehouse measures (extension).

Data-quality operators a production warehouse runs beside the Stage-5
validation battery (`plans/validation.py`): instead of structural
invariants (dup keys, orphans), these flag *statistical* breaks — days
whose revenue is an outlier against their month's distribution.

Determinism contract (the repo's exact-decimal-then-double rule): the
sufficient statistics (Σx, Σx², n) are exact DECIMAL/BIGINT aggregates —
reduction-order-independent, so identical on any cluster layout — and
the z-score math happens once at the end in IEEE double with the same
expression shape on both engines (+,−,×,÷,sqrt are all correctly rounded
per IEEE 754, so identical inputs give identical bits).

Scale: one shuffle — the daily pre-aggregate — then a month-partitioned
window over ~31-row partitions. The window's sufficient statistics are
decimal sums (exact ⇒ order-free); no global sort, no driver math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import typed_table

Z_THRESHOLD = 2.0

# exact line revenue; (14,2)·(4,2) products stay well inside DECIMAL(38,·)
_REV = "l_extendedprice * (1 - l_discount)"


def revenue_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose total revenue is ≥ Z_THRESHOLD σ from their month's mean.

    Plan: lineitem⋈orders (the one real shuffle, broadcast excluded since
    orders is the fact-sized side — Catalyst/AQE picks sort-merge), daily
    exact-decimal aggregate, then month-window sufficient statistics and
    a map-side double z-score + filter.
    """
    li = typed_table(spark, sf_dir, "lineitem")
    orders = typed_table(spark, sf_dir, "orders")
    daily = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum(F.expr(_REV)).cast("decimal(18,4)").alias("day_rev"))
        .withColumn("day_rev_sq", F.col("day_rev") * F.col("day_rev"))
        .withColumn("month", F.date_format("day", "yyyy-MM"))
    )
    w = Window.partitionBy("month")
    n_d = F.count(F.lit(1)).over(w).cast("double")
    s_d = F.sum("day_rev").over(w).cast("double")
    ss_d = F.sum("day_rev_sq").over(w).cast("double")
    mean = s_d / n_d
    var = (ss_d / n_d) - (mean * mean)
    # fp cancellation can leave var a hair negative for flat months:
    # Spark's sqrt would yield NaN but DuckDB *raises*, so both sides
    # gate on the identical `var > 0` predicate (same double bits ⇒ same
    # branch) and emit NULL-z rows that the threshold filter drops.
    # wide-decimal → double casts double-round differently between engines
    # (int128 → double → ÷10^scale vs correctly-rounded BigDecimal), so z
    # carries a ±1-ulp engine skew; rounding to 6 places (the repo's ratio
    # convention) absorbs it. The threshold compares the unrounded value —
    # a boundary flip needs |z| within an ulp of 2.0, which decimal-exact
    # inputs make effectively impossible.
    z = F.when(
        var > F.lit(0.0), (F.col("day_rev").cast("double") - mean) / F.sqrt(var)
    )
    return (
        daily.withColumn("z", z)
        .filter(F.abs(F.col("z")) > Z_THRESHOLD)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("day_rev").cast("double").alias("revenue"),
            F.round("z", 6).alias("z"),
        )
    )


REVENUE_ANOMALY_SQL = f"""
WITH daily AS (
  SELECT o_orderdate AS day,
         CAST(SUM({_REV}) AS DECIMAL(18,4)) AS day_rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1
),
staged AS (
  -- widen one operand past width 18: DuckDB's int64 fast path overflows
  -- on the raw multiply before widening; (19,4)·(18,4)→(37,8) runs on
  -- HUGEINT and matches Spark's (18,4)²→(37,8) exactly
  SELECT day, day_rev, CAST(day_rev AS DECIMAL(19,4)) * day_rev AS day_rev_sq,
         strftime(day, '%Y-%m') AS month
  FROM daily
),
winstats AS (
  SELECT day, day_rev,
         CAST(COUNT(*) OVER (PARTITION BY month) AS DOUBLE) AS n_d,
         CAST(SUM(day_rev) OVER (PARTITION BY month) AS DOUBLE) AS s_d,
         CAST(SUM(day_rev_sq) OVER (PARTITION BY month) AS DOUBLE) AS ss_d
  FROM staged
),
scored AS (
  SELECT day, day_rev,
         CASE WHEN ((ss_d / n_d) - ((s_d / n_d) * (s_d / n_d))) > 0
              THEN (CAST(day_rev AS DOUBLE) - (s_d / n_d))
                   / sqrt((ss_d / n_d) - ((s_d / n_d) * (s_d / n_d)))
         END AS z
  FROM winstats
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(day_rev AS DOUBLE) AS revenue,
       round(z, 6) AS z
FROM scored
WHERE abs(z) > {Z_THRESHOLD}
"""
