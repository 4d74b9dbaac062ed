"""Survival analysis: Kaplan–Meier time-to-event with right-censoring.

The warehouse question the latency histograms can't answer: "what
fraction of orders is still unshipped k days after ordering, accounting
for orders we stopped observing?" Truncating the study window censors —
it does not drop — the in-flight orders; ignoring them (the naive
filter) biases every latency percentile optimistic. The Kaplan–Meier
product-limit estimator (Kaplan & Meier 1958) is the standard fix:

    S(t) = Π_{u ≤ t, d_u > 0} (1 − d_u / n_u)

with d_u = events at time u, n_u = subjects still at risk just before u
(events and censorings with T ≥ u; censorings at u count as at-risk,
the standard tie convention).

Portability: all d/c/n_risk counts are exact integers; the cumulative
product is evaluated as exp(Σ ln((n−d)/n)) on BOTH engines — each ln
argument is a ratio of exact sub-2^53 integers (bit-identical doubles),
the ulp-level ln/exp divergence across ~10² terms is « the round-6
contract. A d = n_risk terminal row (everyone fails) would send ln to
−∞; an explicit zero-seen cumulative flag pins survival to exactly 0.0
on both engines instead.

Scale: one corpus-scale groupBy (first ship per order) + one keyed join
orders⋈first_ship; everything after runs on the |distinct (priority,
day)|-row frame (≤ a few thousand rows — broadcast territory). The
per-priority windows partition 5 ways; no global single-partition step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import typed_table

# Study horizon: orders placed before it are subjects; first-ship on or
# after it is right-censored at (horizon − orderdate). Testdata orders
# span 1995-01 → 2001-11 (median ≈ 1998-04, tests/test_fixture_bounds.py),
# so ~half the orders are subjects and the late-1997 tail is genuinely
# censored (TPC-H ships within ~122 days of ordering).
KM_HORIZON = "1998-01-01"


def survival_km_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(priority, t_day, n_risk, d_events, c_censored, survival): the
    Kaplan–Meier shipping-latency curve per order priority — one row per
    event time (days from order to first shipment), with censored-only
    times folded into the at-risk denominators but not emitted."""
    li = typed_table(spark, sf_dir, "lineitem")
    orders = typed_table(spark, sf_dir, "orders")
    first_ship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("fs"))
    per = (
        orders.filter(F.col("o_orderdate") < KM_HORIZON)
        .join(first_ship, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.when(F.col("fs") < KM_HORIZON, 1).otherwise(0).alias("d"),
            F.when(
                F.col("fs") < KM_HORIZON,
                F.datediff(F.col("fs"), F.col("o_orderdate")),
            )
            .otherwise(
                F.datediff(
                    F.lit(KM_HORIZON).cast("date"), F.col("o_orderdate")
                )
            )
            .cast("int")
            .alias("t"),
        )
    )
    counts = per.groupBy("priority", "t").agg(
        F.sum("d").cast("bigint").alias("d_events"),
        F.sum(1 - F.col("d")).cast("bigint").alias("c_censored"),
    )
    # t is distinct within each priority partition, so ROWS frames are
    # unambiguous; n_risk = total − strictly-preceding departures.
    wprev = (
        Window.partitionBy("priority")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wcum = (
        Window.partitionBy("priority")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = (
        Window.partitionBy("priority")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    departures = F.col("d_events") + F.col("c_censored")
    risk = counts.withColumn(
        "n_risk",
        (
            F.sum(departures).over(wall)
            - F.coalesce(F.sum(departures).over(wprev), F.lit(0))
        ).cast("bigint"),
    )
    ln_term = F.when(
        F.col("d_events") < F.col("n_risk"),
        F.log(
            (F.col("n_risk") - F.col("d_events")).cast("double")
            / F.col("n_risk").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    zero_flag = F.when(F.col("d_events") == F.col("n_risk"), 1).otherwise(0)
    cum = risk.select(
        "priority",
        "t",
        "n_risk",
        "d_events",
        "c_censored",
        F.sum(ln_term).over(wcum).alias("lnsum"),
        F.max(zero_flag).over(wcum).alias("zero_seen"),
    )
    return (
        cum.filter(F.col("d_events") > 0)
        .select(
            "priority",
            F.col("t").alias("t_day"),
            "n_risk",
            "d_events",
            "c_censored",
            F.when(F.col("zero_seen") == 1, F.lit(0.0))
            .otherwise(F.round(F.exp("lnsum"), 6))
            .alias("survival"),
        )
        .orderBy("priority", "t_day")
    )


def survival_km_shipping_sql() -> str:
    return f"""
WITH fs AS (
  SELECT l_orderkey, MIN(l_shipdate) AS fs FROM lineitem GROUP BY 1
),
per AS (
  SELECT o_orderpriority AS priority,
         CASE WHEN fs < TIMESTAMP '{KM_HORIZON}' THEN 1 ELSE 0 END AS d,
         CAST(CASE WHEN fs < TIMESTAMP '{KM_HORIZON}'
              THEN datediff('day', CAST(o_orderdate AS DATE), CAST(fs AS DATE))
              ELSE datediff('day', CAST(o_orderdate AS DATE), DATE '{KM_HORIZON}')
         END AS INTEGER) AS t
  FROM orders JOIN fs ON l_orderkey = o_orderkey
  WHERE o_orderdate < TIMESTAMP '{KM_HORIZON}'
),
counts AS (
  SELECT priority, t,
         CAST(SUM(d) AS BIGINT) AS d_events,
         CAST(SUM(1 - d) AS BIGINT) AS c_censored
  FROM per GROUP BY 1, 2
),
risk AS (
  SELECT priority, t, d_events, c_censored,
         CAST(SUM(d_events + c_censored) OVER (PARTITION BY priority)
              - COALESCE(SUM(d_events + c_censored) OVER (
                  PARTITION BY priority ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS BIGINT) AS n_risk
  FROM counts
),
-- t is distinct per priority: the default RANGE cumulative frame has no
-- peer rows and equals the Spark ROWS frame
cum AS (
  SELECT priority, t, n_risk, d_events, c_censored,
         SUM(CASE WHEN d_events < n_risk
                  THEN ln(CAST(n_risk - d_events AS DOUBLE) / CAST(n_risk AS DOUBLE))
                  ELSE 0 END) OVER (PARTITION BY priority ORDER BY t) AS lnsum,
         MAX(CASE WHEN d_events = n_risk THEN 1 ELSE 0 END)
             OVER (PARTITION BY priority ORDER BY t) AS zero_seen
  FROM risk
)
SELECT priority, t AS t_day, n_risk, d_events, c_censored,
       CASE WHEN zero_seen = 1 THEN 0.0 ELSE round(exp(lnsum), 6) END AS survival
FROM cum
WHERE d_events > 0
ORDER BY priority, t_day
"""
