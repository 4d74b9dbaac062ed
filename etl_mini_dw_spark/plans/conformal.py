"""Split-conformal prediction intervals with measured coverage.

The distribution-free uncertainty layer an ML serving pipeline wraps
around ANY point predictor (Vovk et al.; Angelopoulos & Bates 2022
tutorial): fit on a train split, take the k-th smallest absolute
residual on a held-out calibration split with

    k = ceil((n_cal + 1) · α)

and the interval ŷ ± q̂ then covers a fresh point with probability
≥ α, whatever the model and whatever the data distribution. The
registered report measures that guarantee on a third (test) split.

Everything before the final coverage ratio is integer-exact: the
predictor is the per-quantity mean price in floor-divided cents, the
residuals are integer cents, k is an exact ceiling of a rational
((n+1)·num + den − 1) div den, and q̂ is an exact order statistic read
off the calibration residual histogram. Splits are the repo's
deterministic multiplicative hash on l_orderkey — whole orders land on
one side, so duplicate lineitem rows can't straddle splits.

Scale: one corpus pass per split role (train model = |quantity|-row
broadcast; calibration/test reduce to residual HISTOGRAMS via
partial-aggregable shuffles); the order-statistic and coverage lookups
run on histogram-sized frames. Same cumulative-window 100 TB swap note
as the KS/AUC family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mini_dw_spark.functions.sampling import HASH_MOD, HASH_MULT
from etl_mini_dw_spark.sources.tables import typed_table

# train < TRAIN_CUT ≤ cal < CAL_CUT ≤ test, over the orderkey hash
CONF_TRAIN_CUT = 500_000
CONF_CAL_CUT = 750_000
CONF_ALPHAS = [("a80", 4, 5), ("a90", 9, 10), ("a95", 19, 20)]


def _split_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = typed_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_quantity").alias("q"),
        (F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    h = F.pmod(F.col("l_orderkey") * F.lit(HASH_MULT), F.lit(HASH_MOD))
    return li.select(
        "q",
        "y",
        F.when(h < CONF_TRAIN_CUT, "train")
        .when(h < CONF_CAL_CUT, "cal")
        .otherwise("test")
        .alias("role"),
    )


def conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(alpha, n_cal, n_test, k, qhat_c, coverage): split-conformal
    interval half-widths for the per-quantity mean-price predictor and
    their measured coverage on the test split."""
    base = _split_frame(spark, sf_dir).localCheckpoint(eager=False)
    model = (
        base.filter(F.col("role") == "train")
        .groupBy("q")
        .agg(F.expr("sum(y) div count(1)").cast("bigint").alias("yhat"))
    )
    resid = (
        base.filter(F.col("role") != "train")
        .join(F.broadcast(model), "q")
        .select("role", F.abs(F.col("y") - F.col("yhat")).alias("r"))
    )
    hist = resid.groupBy("role", "r").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wcum = (
        Window.partitionBy("role")
        .orderBy("r")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select("role", "r", "cnt", F.sum("cnt").over(wcum).alias("cum"))
    n_cal = (
        cum.filter(F.col("role") == "cal")
        .agg(F.sum("cnt").cast("bigint").alias("n_cal"))
    )
    ranks = None
    for label, num, den in CONF_ALPHAS:
        r = n_cal.select(
            F.lit(label).alias("alpha"),
            F.col("n_cal"),
            F.expr(f"((n_cal + 1) * {num} + {den} - 1) div {den}")
            .cast("bigint")
            .alias("k"),
        )
        ranks = r if ranks is None else ranks.unionByName(r)
    qhat = (
        cum.filter(F.col("role") == "cal")
        .crossJoin(F.broadcast(ranks))
        .filter(F.col("cum") >= F.col("k"))
        .groupBy("alpha", "n_cal", "k")
        .agg(F.min("r").alias("qhat_c"))
    )
    test_hist = cum.filter(F.col("role") == "test").select("r", "cnt")
    cover = (
        test_hist.crossJoin(F.broadcast(qhat))
        .groupBy("alpha", "n_cal", "k", "qhat_c")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_test"),
            F.sum(F.when(F.col("r") <= F.col("qhat_c"), F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_covered"),
        )
    )
    return cover.select(
        "alpha",
        "n_cal",
        "n_test",
        "k",
        "qhat_c",
        F.round(
            F.col("n_covered").cast("double") / F.col("n_test").cast("double"), 6
        ).alias("coverage"),
    ).orderBy("alpha")


def conformal_coverage_sql() -> str:
    ranks = "\nUNION ALL\n".join(
        f"SELECT '{label}' AS alpha, n_cal,"
        f" CAST(((n_cal + 1) * {num} + {den} - 1) // {den} AS BIGINT) AS k FROM n_cal"
        for label, num, den in CONF_ALPHAS
    )
    return f"""
WITH base AS MATERIALIZED (
  SELECT l_quantity AS q, CAST(l_extendedprice * 100 AS BIGINT) AS y,
         CASE WHEN (l_orderkey * {HASH_MULT}) % {HASH_MOD} < {CONF_TRAIN_CUT} THEN 'train'
              WHEN (l_orderkey * {HASH_MULT}) % {HASH_MOD} < {CONF_CAL_CUT} THEN 'cal'
              ELSE 'test' END AS role
  FROM lineitem
),
model AS MATERIALIZED (
  SELECT q, CAST(SUM(y) // COUNT(*) AS BIGINT) AS yhat
  FROM base WHERE role = 'train' GROUP BY q
),
hist AS MATERIALIZED (
  SELECT role, abs(y - yhat) AS r, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM base JOIN model USING (q)
  WHERE role <> 'train'
  GROUP BY 1, 2
),
-- r is distinct per role partition: default RANGE frame == ROWS
cum AS MATERIALIZED (
  SELECT role, r, cnt, SUM(cnt) OVER (PARTITION BY role ORDER BY r) AS cum
  FROM hist
),
n_cal AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_cal FROM cum WHERE role = 'cal'),
ranks AS MATERIALIZED ({ranks}),
qhat AS MATERIALIZED (
  SELECT alpha, n_cal, k, MIN(r) AS qhat_c
  FROM cum, ranks WHERE role = 'cal' AND cum >= k
  GROUP BY 1, 2, 3
)
SELECT alpha, n_cal, n_test, k, qhat_c,
       round(CAST(n_covered AS DOUBLE) / CAST(n_test AS DOUBLE), 6) AS coverage
FROM (
  SELECT alpha, n_cal, k, qhat_c,
         CAST(SUM(cnt) AS BIGINT) AS n_test,
         CAST(SUM(CASE WHEN r <= qhat_c THEN cnt ELSE 0 END) AS BIGINT) AS n_covered
  FROM (SELECT r, cnt FROM cum WHERE role = 'test'), qhat
  GROUP BY 1, 2, 3, 4
)
ORDER BY alpha
"""
