"""Online-experimentation readouts: CUPED-adjusted A/B lift and a
probability-calibration (reliability / Brier / ECE) report.

These are the experimentation counterparts of the repo's ML-eval family
(AUC ranking quality, gains/lift targeting depth, conformal coverage):
an A/B platform needs a variance-reduced lift estimate (CUPED, Deng et
al. WSDM 2013) and any probabilistic classifier feeding a decision
needs its predicted probabilities CHECKED against observed rates
(reliability table + Brier score + expected calibration error).

Both follow the repo's exact-sufficient-statistics discipline: every
corpus-sized reduction is an integer / exact-decimal sum, floats appear
only in final O(1)-magnitude ratios, and every exposed ratio is
``round(x, 6)`` on BOTH engines because the second-moment sums exceed
15 digits (the wide-decimal → double 1-ulp trap, CLAUDE.md). Derived
quantities (naive_diff, cuped_diff, gap) are computed FROM the already-
rounded components so both engines do identical IEEE arithmetic on
identical doubles.

Reference parity note: the reference warehouse (DavidFarm/etl-mini-dw,
code/SQL_1_Assignment_2_David_Färm.sql) has no experimentation layer;
these extend the engine for the training-data/serving pipeline the
brief asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mini_dw_spark.functions.sampling import HASH_MOD, HASH_MULT
from etl_mini_dw_spark.sources.tables import typed_table

# ---------------------------------------------------------------------------
# CUPED A/B lift
#
# Unit = customer; assignment = deterministic multiplicative hash of
# c_custkey (the repo's split hash, so assignment is reproducible and
# balanced); metric y = post-period revenue (>= PERIOD_CUT), covariate
# x = pre-period revenue (< PERIOD_CUT), both in exact integer cents.
# theta = cov(x, y) / var(x) is fitted POOLED across arms (Deng et al.
# §3.2 — pooling is unbiased because assignment is independent of x),
# and the adjusted lift is
#     cuped_diff = (ybar_A - ybar_B) - theta * (xbar_A - xbar_B).
# Variance reduction equals rho^2 = corr(x, y)^2, reported so the
# platform can see what the covariate bought.
#
# Scale: one o_custkey groupBy (partial-aggregable), one co-partitioned
# left join onto the customer spine, then ONE global aggregate of
# integer/exact-decimal sufficient statistics — the same shape at
# 100 TB, nothing global but a 1-row reduce.

PERIOD_CUT = "1997-01-01"  # pre-period < cut <= post-period (data spans 1995–2001)
AB_ARM_CUT = 500_000  # hash < cut -> arm A (HASH_MOD = 1_000_000 -> 50/50)


def ab_cuped_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: (n_a, n_b, mean_x_a, mean_x_b, mean_y_a, mean_y_b,
    naive_diff, theta, cuped_diff, rho2) — the CUPED-adjusted A/B
    revenue-lift readout over hash-assigned customer arms.

    The hash split is on the CUSTOMER key so a unit's entire order
    history lands in one arm (the same whole-unit rule as the conformal
    order-key split). Second moments are summed as DECIMAL(38,0) —
    x*y reaches ~1e16 per row and ~1e21 summed at sf0.1, past int64.
    """
    cust = typed_table(spark, sf_dir, "customer").select("c_custkey")
    orders = typed_table(spark, sf_dir, "orders")
    per_cust = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderdate") < PERIOD_CUT,
                    (F.col("o_totalprice") * 100).cast("bigint"),
                ).otherwise(F.lit(0))
            ).alias("x"),
            F.sum(
                F.when(
                    F.col("o_orderdate") >= PERIOD_CUT,
                    (F.col("o_totalprice") * 100).cast("bigint"),
                ).otherwise(F.lit(0))
            ).alias("y"),
        )
    )
    units = cust.join(per_cust, "c_custkey", "left").select(
        F.when(
            F.pmod(F.col("c_custkey") * F.lit(HASH_MULT), F.lit(HASH_MOD))
            < AB_ARM_CUT,
            F.lit("A"),
        )
        .otherwise(F.lit("B"))
        .alias("arm"),
        F.coalesce(F.col("x"), F.lit(0)).alias("x"),
        F.coalesce(F.col("y"), F.lit(0)).alias("y"),
    )
    # one global aggregate: per-arm first moments + pooled second moments
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    a = F.col("arm") == "A"
    agg = units.agg(
        F.sum(F.when(a, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(~a, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(a, F.col("x")).otherwise(0)).cast("bigint").alias("sx_a"),
        F.sum(F.when(~a, F.col("x")).otherwise(0)).cast("bigint").alias("sx_b"),
        F.sum(F.when(a, F.col("y")).otherwise(0)).cast("bigint").alias("sy_a"),
        F.sum(F.when(~a, F.col("y")).otherwise(0)).cast("bigint").alias("sy_b"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sxx"),
        F.sum(yd * yd).cast("decimal(38,0)").alias("syy"),
        F.sum(xd * yd).cast("decimal(38,0)").alias("sxy"),
    )
    # exact-decimal moment combination (n cast DECIMAL(10,0): the
    # bigint*decimal precision-39 scale-shed trap — scale is 0 here but
    # keep the rule uniform); values ~1e26 sit well inside 38 digits
    n = (F.col("n_a") + F.col("n_b")).cast("decimal(10,0)")
    sx = (F.col("sx_a") + F.col("sx_b")).cast("decimal(19,0)")
    sy = (F.col("sy_a") + F.col("sy_b")).cast("decimal(19,0)")
    cov_num = (n * F.col("sxy") - sx * sy).cast("double")
    varx_num = (n * F.col("sxx") - sx * sx).cast("double")
    vary_num = (n * F.col("syy") - sy * sy).cast("double")
    theta = F.round(cov_num / varx_num, 6)
    # means in dollars, round-6 BEFORE any derived arithmetic
    mean_x_a = F.round(F.col("sx_a") / (100.0 * F.col("n_a")), 6)
    mean_x_b = F.round(F.col("sx_b") / (100.0 * F.col("n_b")), 6)
    mean_y_a = F.round(F.col("sy_a") / (100.0 * F.col("n_a")), 6)
    mean_y_b = F.round(F.col("sy_b") / (100.0 * F.col("n_b")), 6)
    derived = agg.select(
        "n_a",
        "n_b",
        mean_x_a.alias("mean_x_a"),
        mean_x_b.alias("mean_x_b"),
        mean_y_a.alias("mean_y_a"),
        mean_y_b.alias("mean_y_b"),
        theta.alias("theta"),
        F.when(
            (varx_num > 0) & (vary_num > 0),
            F.round(cov_num * cov_num / (varx_num * vary_num), 6),
        ).alias("rho2"),
    )
    return derived.select(
        "n_a",
        "n_b",
        "mean_x_a",
        "mean_x_b",
        "mean_y_a",
        "mean_y_b",
        F.round(F.col("mean_y_a") - F.col("mean_y_b"), 6).alias("naive_diff"),
        "theta",
        F.round(
            (F.col("mean_y_a") - F.col("mean_y_b"))
            - F.col("theta") * (F.col("mean_x_a") - F.col("mean_x_b")),
            6,
        ).alias("cuped_diff"),
        "rho2",
    )


def ab_cuped_lift_sql() -> str:
    """DuckDB mirror: HUGEINT second moments (int128, exact like the
    Spark DECIMAL(38,0) sums), identical round-6-then-derive order."""
    return f"""
WITH per_cust AS (
  SELECT c.c_custkey,
         CASE WHEN (c.c_custkey * {HASH_MULT}) % {HASH_MOD} < {AB_ARM_CUT}
              THEN 'A' ELSE 'B' END AS arm,
         COALESCE(SUM(CASE WHEN o.o_orderdate < TIMESTAMP '{PERIOD_CUT}'
             THEN CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
             ELSE 0 END), 0) AS x,
         COALESCE(SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '{PERIOD_CUT}'
             THEN CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
             ELSE 0 END), 0) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
s AS (
  SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN arm = 'A' THEN x ELSE 0 END) AS BIGINT) AS sx_a,
         CAST(SUM(CASE WHEN arm = 'B' THEN x ELSE 0 END) AS BIGINT) AS sx_b,
         CAST(SUM(CASE WHEN arm = 'A' THEN y ELSE 0 END) AS BIGINT) AS sy_a,
         CAST(SUM(CASE WHEN arm = 'B' THEN y ELSE 0 END) AS BIGINT) AS sy_b,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy
  FROM per_cust
),
m AS (
  SELECT n_a, n_b,
         CAST((n_a + n_b) * sxy - CAST(sx_a + sx_b AS HUGEINT) * (sy_a + sy_b)
              AS DOUBLE) AS cov_num,
         CAST((n_a + n_b) * sxx - CAST(sx_a + sx_b AS HUGEINT) * (sx_a + sx_b)
              AS DOUBLE) AS varx_num,
         CAST((n_a + n_b) * syy - CAST(sy_a + sy_b AS HUGEINT) * (sy_a + sy_b)
              AS DOUBLE) AS vary_num,
         round(CAST(sx_a AS DOUBLE) / (100.0 * n_a), 6) AS mean_x_a,
         round(CAST(sx_b AS DOUBLE) / (100.0 * n_b), 6) AS mean_x_b,
         round(CAST(sy_a AS DOUBLE) / (100.0 * n_a), 6) AS mean_y_a,
         round(CAST(sy_b AS DOUBLE) / (100.0 * n_b), 6) AS mean_y_b
  FROM s
)
SELECT n_a, n_b, mean_x_a, mean_x_b, mean_y_a, mean_y_b,
       round(mean_y_a - mean_y_b, 6) AS naive_diff,
       round(cov_num / varx_num, 6) AS theta,
       round((mean_y_a - mean_y_b)
             - round(cov_num / varx_num, 6) * (mean_x_a - mean_x_b), 6)
         AS cuped_diff,
       CASE WHEN varx_num > 0 AND vary_num > 0
            THEN round(cov_num * cov_num / (varx_num * vary_num), 6)
       END AS rho2
FROM m
"""


# ---------------------------------------------------------------------------
# Calibration / reliability report
#
# Predictor: per-discount-value return probability fitted on a hash
# TRAIN split of lineitem order keys (whole orders on one side, the
# conformal rule); evaluated on the TEST split. l_discount has ~11
# distinct values, so the "reliability diagram" buckets ARE the
# predictor's support — no extra binning step to disagree on.
#
# Exactness: the predicted probability is floor(1e6 * pos / n) — an
# integer fixed-point computed with the pmod floor-division identity on
# both engines; Brier sums (p6 - y*1e6)^2 as DECIMAL(38,0)/HUGEINT
# (~1e12 per row — past int64 at sf >= 1); ECE's numerator
# sum_d |p6_d * n_d - 1e6 * pos_d| is exact integer. Only the final
# per-bucket/O(1) ratios become round-6 doubles.

CAL_TRAIN_CUT = 500_000  # hash < cut -> train, else test


def _fd(a, b):
    """Exact floor division a div b (b > 0) via the pmod identity —
    Spark's `div` truncates toward zero, DuckDB's `//` floors; routing
    through (a - pmod(a, b)) / b makes both engines compute the same
    mathematical floor (the power-iteration renorm rule)."""
    return F.expr(f"({a} - pmod({a}, {b})) div ({b})")


def calibration_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket_cents, n_test, pos_test, p_pred, p_obs, gap, brier, ece):
    reliability row per discount value plus one TOTAL row (bucket -1)
    carrying the Brier score and expected calibration error.

    Scale: train pass reduces to an ~11-row model (broadcast); test pass
    is one partial-aggregable groupBy on the same ~11 keys; Brier's
    corpus-sized sum rides the same aggregate. Nothing global but the
    11-row assembly.
    """
    li = typed_table(spark, sf_dir, "lineitem").select(
        (F.col("l_discount") * 100).cast("int").alias("bucket_cents"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        F.when(
            F.pmod(F.col("l_orderkey") * F.lit(HASH_MULT), F.lit(HASH_MOD))
            < CAL_TRAIN_CUT,
            F.lit("train"),
        )
        .otherwise(F.lit("test"))
        .alias("role"),
    )
    model = (
        li.filter(F.col("role") == "train")
        .groupBy("bucket_cents")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tr"),
            F.sum("y").cast("bigint").alias("pos_tr"),
        )
        .select(
            "bucket_cents",
            _fd("1000000 * pos_tr", "n_tr").cast("bigint").alias("p6"),
        )
    )
    test = (
        li.filter(F.col("role") == "test")
        .join(F.broadcast(model), "bucket_cents")
        .groupBy("bucket_cents", "p6")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum("y").cast("bigint").alias("pos_test"),
            F.sum(
                (
                    (F.col("p6") - F.col("y") * 1_000_000).cast("decimal(19,0)")
                    * (F.col("p6") - F.col("y") * 1_000_000).cast("decimal(19,0)")
                )
            )
            .cast("decimal(38,0)")
            .alias("sq"),
        )
    )
    buckets = test.select(
        "bucket_cents",
        "n_test",
        "pos_test",
        F.round(F.col("p6") / 1e6, 6).alias("p_pred"),
        F.round(F.col("pos_test") / F.col("n_test").cast("double"), 6).alias(
            "p_obs"
        ),
        F.round(
            F.col("p6") / 1e6
            - F.round(F.col("pos_test") / F.col("n_test").cast("double"), 6),
            6,
        ).alias("gap"),
        F.lit(None).cast("double").alias("brier"),
        F.lit(None).cast("double").alias("ece"),
    )
    total = test.agg(
        F.sum("n_test").cast("bigint").alias("n"),
        F.sum("pos_test").cast("bigint").alias("pos"),
        F.sum("sq").cast("decimal(38,0)").alias("sq_sum"),
        F.sum(
            F.abs(
                F.col("p6").cast("decimal(19,0)") * F.col("n_test")
                - F.col("pos_test").cast("decimal(19,0)") * 1_000_000
            )
        )
        .cast("decimal(38,0)")
        .alias("ece_num"),
    ).select(
        F.lit(-1).cast("int").alias("bucket_cents"),
        F.col("n").alias("n_test"),
        F.col("pos").alias("pos_test"),
        F.lit(None).cast("double").alias("p_pred"),
        F.round(F.col("pos") / F.col("n").cast("double"), 6).alias("p_obs"),
        F.lit(None).cast("double").alias("gap"),
        F.round(
            F.col("sq_sum").cast("double") / (1e12 * F.col("n").cast("double")),
            6,
        ).alias("brier"),
        F.round(
            F.col("ece_num").cast("double") / (1e6 * F.col("n").cast("double")),
            6,
        ).alias("ece"),
    )
    return buckets.unionByName(total).orderBy("bucket_cents")


def calibration_brier_sql() -> str:
    return f"""
WITH base AS (
  SELECT CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS INTEGER) AS bucket_cents,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         CASE WHEN (l_orderkey * {HASH_MULT}) % {HASH_MOD} < {CAL_TRAIN_CUT}
              THEN 'train' ELSE 'test' END AS role
  FROM lineitem
),
model AS (
  SELECT bucket_cents,
         CAST((1000000 * SUM(y) - ((1000000 * SUM(y) % COUNT(*)) + COUNT(*))
               % COUNT(*)) // COUNT(*) AS BIGINT) AS p6
  FROM base WHERE role = 'train' GROUP BY bucket_cents
),
test AS (
  SELECT b.bucket_cents, m.p6,
         CAST(COUNT(*) AS BIGINT) AS n_test,
         CAST(SUM(b.y) AS BIGINT) AS pos_test,
         SUM(CAST(m.p6 - b.y * 1000000 AS HUGEINT)
             * (m.p6 - b.y * 1000000)) AS sq
  FROM base b JOIN model m USING (bucket_cents)
  WHERE b.role = 'test'
  GROUP BY 1, 2
),
bucket_rows AS (
  SELECT bucket_cents, n_test, pos_test,
         round(CAST(p6 AS DOUBLE) / 1e6, 6) AS p_pred,
         round(CAST(pos_test AS DOUBLE) / n_test, 6) AS p_obs,
         round(CAST(p6 AS DOUBLE) / 1e6
               - round(CAST(pos_test AS DOUBLE) / n_test, 6), 6) AS gap,
         CAST(NULL AS DOUBLE) AS brier, CAST(NULL AS DOUBLE) AS ece
  FROM test
),
total_row AS (
  SELECT CAST(-1 AS INTEGER) AS bucket_cents,
         CAST(SUM(n_test) AS BIGINT) AS n_test,
         CAST(SUM(pos_test) AS BIGINT) AS pos_test,
         CAST(NULL AS DOUBLE) AS p_pred,
         round(CAST(SUM(pos_test) AS DOUBLE) / SUM(n_test), 6) AS p_obs,
         CAST(NULL AS DOUBLE) AS gap,
         round(CAST(SUM(sq) AS DOUBLE) / (1e12 * SUM(n_test)), 6) AS brier,
         round(CAST(SUM(ABS(CAST(p6 AS HUGEINT) * n_test
                            - CAST(pos_test AS HUGEINT) * 1000000)) AS DOUBLE)
               / (1e6 * SUM(n_test)), 6) AS ece
  FROM test
)
SELECT * FROM bucket_rows
UNION ALL
SELECT * FROM total_row
ORDER BY bucket_cents
"""


# ---------------------------------------------------------------------------
# Weight-of-evidence encoding + information value
#
# The credit-scoring / feature-engineering standard for turning a
# categorical feature into a model-ready monotone score: per bucket,
# WOE = ln(share of positives / share of negatives), with Laplace
# smoothing so empty cells stay finite; the Information Value
# IV = sum_b (p_pos_b - p_neg_b) * WOE_b summarizes the feature's
# predictive power (<0.02 useless, >0.3 strong).
#
# Portability: the ln argument is assembled as ONE exact rational from
# BIGINT counts ((pos_b+1)(neg+K)) / ((neg_b+1)(pos+K)) — products stay
# under 2^53 so the doubles are exact — and ln is a single libm call on
# an identical double (the −ln(hhi) precedent), rounded to 6. IV is
# derived from the already-rounded shares and WOEs.
#
# Scale: one partial-aggregable groupBy on the ~11 bucket keys; the
# global totals are a 1-row reduce folded back by broadcast.


def woe_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket_cents, n, pos, p_pos, p_neg, woe, iv): WOE table for the
    discount buckets against the returned-flag label, with the feature's
    information value on the TOTAL row (bucket -1)."""
    li = typed_table(spark, sf_dir, "lineitem").select(
        (F.col("l_discount") * 100).cast("int").alias("bucket_cents"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    per = li.groupBy("bucket_cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    tot = per.agg(
        F.sum("pos").cast("bigint").alias("tpos"),
        F.sum(F.col("n") - F.col("pos")).cast("bigint").alias("tneg"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    j = per.crossJoin(F.broadcast(tot))
    neg = F.col("n") - F.col("pos")
    woe = F.round(
        F.log(
            ((F.col("pos") + 1) * (F.col("tneg") + F.col("k"))).cast("double")
            / ((neg + 1) * (F.col("tpos") + F.col("k"))).cast("double")
        ),
        6,
    )
    buckets = j.select(
        "bucket_cents",
        "n",
        "pos",
        F.round((F.col("pos") + 1) / (F.col("tpos") + F.col("k")).cast("double"), 6).alias("p_pos"),
        F.round((neg + 1) / (F.col("tneg") + F.col("k")).cast("double"), 6).alias("p_neg"),
        woe.alias("woe"),
        F.lit(None).cast("double").alias("iv"),
    )
    iv_row = buckets.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("pos"),
        F.round(
            F.sum((F.col("p_pos") - F.col("p_neg")) * F.col("woe")), 6
        ).alias("iv"),
    ).select(
        F.lit(-1).cast("int").alias("bucket_cents"),
        "n",
        "pos",
        F.lit(None).cast("double").alias("p_pos"),
        F.lit(None).cast("double").alias("p_neg"),
        F.lit(None).cast("double").alias("woe"),
        "iv",
    )
    return buckets.unionByName(iv_row).orderBy("bucket_cents")


def woe_encoding_sql() -> str:
    return """
WITH per AS (
  SELECT CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS INTEGER) AS bucket_cents,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM lineitem GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(pos) AS BIGINT) AS tpos,
         CAST(SUM(n - pos) AS BIGINT) AS tneg,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM per
),
buckets AS (
  SELECT bucket_cents, n, pos,
         round(CAST(pos + 1 AS DOUBLE) / (tpos + k), 6) AS p_pos,
         round(CAST(n - pos + 1 AS DOUBLE) / (tneg + k), 6) AS p_neg,
         round(ln(CAST((pos + 1) * (tneg + k) AS DOUBLE)
                  / ((n - pos + 1) * (tpos + k))), 6) AS woe,
         CAST(NULL AS DOUBLE) AS iv
  FROM per, tot
)
SELECT * FROM buckets
UNION ALL
SELECT CAST(-1 AS INTEGER), CAST(SUM(n) AS BIGINT), CAST(SUM(pos) AS BIGINT),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       round(SUM((p_pos - p_neg) * woe), 6)
FROM buckets
ORDER BY bucket_cents
"""


# ---------------------------------------------------------------------------
# Difference-in-differences by segment
#
# The quasi-experimental companion of the CUPED readout: with the same
# hash-assigned arms and pre/post periods, DiD = (post_A − pre_A) −
# (post_B − pre_B) per market segment cancels both the arm-level and
# the period-level fixed effects — the readout an experimenter checks
# for heterogeneous treatment effects (and, under a null assignment
# like this deterministic hash, for covariate balance: DiD should
# hover near zero in every segment).
#
# Scale: one (arm, segment) aggregate over the per-customer rollup —
# adding segments adds groups, never passes; derived cells come from
# already-rounded per-group means.


def did_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(segment, n_a, n_b, pre_diff, post_diff, did): per-segment
    difference-in-differences of mean customer revenue (dollars), plus
    an ALL row."""
    cust = typed_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    orders = typed_table(spark, sf_dir, "orders")
    per_cust = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderdate") < PERIOD_CUT,
                    (F.col("o_totalprice") * 100).cast("bigint"),
                ).otherwise(F.lit(0))
            ).alias("x"),
            F.sum(
                F.when(
                    F.col("o_orderdate") >= PERIOD_CUT,
                    (F.col("o_totalprice") * 100).cast("bigint"),
                ).otherwise(F.lit(0))
            ).alias("y"),
        )
    )
    units = cust.join(per_cust, "c_custkey", "left").select(
        "segment",
        F.when(
            F.pmod(F.col("c_custkey") * F.lit(HASH_MULT), F.lit(HASH_MOD))
            < AB_ARM_CUT,
            F.lit("A"),
        )
        .otherwise(F.lit("B"))
        .alias("arm"),
        F.coalesce(F.col("x"), F.lit(0)).alias("x"),
        F.coalesce(F.col("y"), F.lit(0)).alias("y"),
    )
    a = F.col("arm") == "A"
    g = (
        units.groupingSets([["segment"], []], "segment")
        .agg(
            F.sum(F.when(a, 1).otherwise(0)).cast("bigint").alias("n_a"),
            F.sum(F.when(~a, 1).otherwise(0)).cast("bigint").alias("n_b"),
            F.sum(F.when(a, F.col("x")).otherwise(0)).cast("bigint").alias("sx_a"),
            F.sum(F.when(~a, F.col("x")).otherwise(0)).cast("bigint").alias("sx_b"),
            F.sum(F.when(a, F.col("y")).otherwise(0)).cast("bigint").alias("sy_a"),
            F.sum(F.when(~a, F.col("y")).otherwise(0)).cast("bigint").alias("sy_b"),
        )
    )
    mxa = F.round(F.col("sx_a") / (100.0 * F.col("n_a")), 6)
    mxb = F.round(F.col("sx_b") / (100.0 * F.col("n_b")), 6)
    mya = F.round(F.col("sy_a") / (100.0 * F.col("n_a")), 6)
    myb = F.round(F.col("sy_b") / (100.0 * F.col("n_b")), 6)
    return (
        g.select(
            F.coalesce(F.col("segment"), F.lit("ALL")).alias("segment"),
            "n_a",
            "n_b",
            F.round(mxa - mxb, 6).alias("pre_diff"),
            F.round(mya - myb, 6).alias("post_diff"),
            F.round((mya - myb) - (mxa - mxb), 6).alias("did"),
        )
        .orderBy("segment")
    )


def did_by_segment_sql() -> str:
    return f"""
WITH per_cust AS (
  SELECT c.c_custkey, c.c_mktsegment AS segment,
         CASE WHEN (c.c_custkey * {HASH_MULT}) % {HASH_MOD} < {AB_ARM_CUT}
              THEN 'A' ELSE 'B' END AS arm,
         COALESCE(SUM(CASE WHEN o.o_orderdate < TIMESTAMP '{PERIOD_CUT}'
             THEN CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
             ELSE 0 END), 0) AS x,
         COALESCE(SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '{PERIOD_CUT}'
             THEN CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
             ELSE 0 END), 0) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2, 3
),
g AS (
  SELECT segment,
         CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN arm = 'A' THEN x ELSE 0 END) AS BIGINT) AS sx_a,
         CAST(SUM(CASE WHEN arm = 'B' THEN x ELSE 0 END) AS BIGINT) AS sx_b,
         CAST(SUM(CASE WHEN arm = 'A' THEN y ELSE 0 END) AS BIGINT) AS sy_a,
         CAST(SUM(CASE WHEN arm = 'B' THEN y ELSE 0 END) AS BIGINT) AS sy_b
  FROM per_cust
  GROUP BY GROUPING SETS ((segment), ())
)
SELECT COALESCE(segment, 'ALL') AS segment, n_a, n_b,
       round(round(CAST(sx_a AS DOUBLE) / (100.0 * n_a), 6)
             - round(CAST(sx_b AS DOUBLE) / (100.0 * n_b), 6), 6) AS pre_diff,
       round(round(CAST(sy_a AS DOUBLE) / (100.0 * n_a), 6)
             - round(CAST(sy_b AS DOUBLE) / (100.0 * n_b), 6), 6) AS post_diff,
       round((round(CAST(sy_a AS DOUBLE) / (100.0 * n_a), 6)
              - round(CAST(sy_b AS DOUBLE) / (100.0 * n_b), 6))
             - (round(CAST(sx_a AS DOUBLE) / (100.0 * n_a), 6)
                - round(CAST(sx_b AS DOUBLE) / (100.0 * n_b), 6)), 6) AS did
FROM g
ORDER BY segment
"""


# ---------------------------------------------------------------------------
# Minimal detectable effect (experiment design / power)
#
# The design-side companion of the CUPED/DiD readouts: BEFORE running a
# test, what's the smallest revenue lift this population can detect at
# alpha = 0.05 (two-sided) and 80% power?
#     MDE = (z_{0.975} + z_{0.80}) * sqrt(sigma^2 * (1/n_a + 1/n_b))
# The z constants are 6-dp literals (identical on both engines); sigma
# comes from exact integer moment sums with ONE gated sqrt; everything
# derived uses already-rounded components. Segments whose variance is
# zero report NULL MDE.
#
# Scale: same one-pass (arm x segment) sufficient-statistics shape as
# the DiD readout.

Z_975 = 1.959964  # two-sided alpha = 0.05
Z_80 = 0.841621  # power = 0.80


def mde_power_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(segment, n_a, n_b, mean_y, sigma, mde_abs, mde_rel): minimal
    detectable absolute/relative lift of post-period customer revenue
    per market segment (+ ALL), at alpha=0.05 / power=0.80."""
    cust = typed_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    orders = typed_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum(
            F.when(
                F.col("o_orderdate") >= PERIOD_CUT,
                (F.col("o_totalprice") * 100).cast("bigint"),
            ).otherwise(F.lit(0))
        ).alias("y")
    )
    units = cust.join(per_cust, "c_custkey", "left").select(
        "segment",
        F.when(
            F.pmod(F.col("c_custkey") * F.lit(HASH_MULT), F.lit(HASH_MOD))
            < AB_ARM_CUT,
            F.lit("A"),
        )
        .otherwise(F.lit("B"))
        .alias("arm"),
        F.coalesce(F.col("y"), F.lit(0)).alias("y"),
    )
    a = F.col("arm") == "A"
    yd = F.col("y").cast("decimal(19,0)")
    g = units.groupingSets([["segment"], []], "segment").agg(
        F.sum(F.when(a, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(~a, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(yd * yd).cast("decimal(38,0)").alias("syy"),
    )
    n = (F.col("n_a") + F.col("n_b")).cast("decimal(10,0)")
    var_num = (
        n * F.col("syy")
        - F.col("sy").cast("decimal(19,0)") * F.col("sy").cast("decimal(19,0)")
    ).cast("double")
    nn = (F.col("n_a") + F.col("n_b")).cast("double")
    sigma = F.when(
        var_num > 0, F.round(F.sqrt(var_num) / (nn * 100.0), 6)
    )
    mean_y = F.round(F.col("sy") / (100.0 * nn), 6)
    base = g.select(
        F.coalesce(F.col("segment"), F.lit("ALL")).alias("segment"),
        "n_a",
        "n_b",
        mean_y.alias("mean_y"),
        sigma.alias("sigma"),
    )
    mde = F.round(
        F.lit(Z_975 + Z_80)
        * F.col("sigma")
        * F.sqrt(1.0 / F.col("n_a") + 1.0 / F.col("n_b")),
        6,
    )
    return base.select(
        "segment",
        "n_a",
        "n_b",
        "mean_y",
        "sigma",
        mde.alias("mde_abs"),
        F.when(
            F.col("mean_y") > 0,
            F.round(
                F.round(
                    F.lit(Z_975 + Z_80)
                    * F.col("sigma")
                    * F.sqrt(1.0 / F.col("n_a") + 1.0 / F.col("n_b")),
                    6,
                )
                / F.col("mean_y"),
                6,
            ),
        ).alias("mde_rel"),
    ).orderBy("segment")


def mde_power_report_sql() -> str:
    zsum = Z_975 + Z_80
    return f"""
WITH per_cust AS (
  SELECT c.c_custkey, c.c_mktsegment AS segment,
         CASE WHEN (c.c_custkey * {HASH_MULT}) % {HASH_MOD} < {AB_ARM_CUT}
              THEN 'A' ELSE 'B' END AS arm,
         COALESCE(SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '{PERIOD_CUT}'
             THEN CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
             ELSE 0 END), 0) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2, 3
),
g AS (
  SELECT segment,
         CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(y) AS BIGINT) AS sy,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM per_cust GROUP BY GROUPING SETS ((segment), ())
),
m AS (
  SELECT COALESCE(segment, 'ALL') AS segment, n_a, n_b,
         round(CAST(sy AS DOUBLE) / (100.0 * (n_a + n_b)), 6) AS mean_y,
         CASE WHEN (n_a + n_b) * syy - CAST(sy AS HUGEINT) * sy > 0
              THEN round(sqrt(CAST((n_a + n_b) * syy
                                   - CAST(sy AS HUGEINT) * sy AS DOUBLE))
                         / ((n_a + n_b) * 100.0), 6)
         END AS sigma
  FROM g
)
SELECT segment, n_a, n_b, mean_y, sigma,
       round({zsum} * sigma * sqrt(1.0 / n_a + 1.0 / n_b), 6) AS mde_abs,
       CASE WHEN mean_y > 0
            THEN round(round({zsum} * sigma
                             * sqrt(1.0 / n_a + 1.0 / n_b), 6) / mean_y, 6)
       END AS mde_rel
FROM m
ORDER BY segment
"""


# ---------------------------------------------------------------------------
# Post-stratified lift
#
# The observational-causal member of the family: weight the per-stratum
# arm differences by stratum population share,
#     lift_ps = sum_s (n_s / N) * (ybar_As - ybar_Bs),
# with strata defined on the PRE-period covariate (log-2 revenue bands
# via the HDR bitlen trick — integer, engine-exact, and meaningful for
# the heavy-tailed revenue distribution; stratum 0 = no pre-period
# activity). Under a fair random assignment it agrees with the naive
# diff up to noise; under a CONFOUNDED assignment it removes the bias
# the naive diff absorbs — the estimator a platform falls back to when
# an experiment's arms drifted out of balance.
#
# Scale: one (stratum, arm) aggregate over the per-unit rollup.


def poststratified_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(stratum, n_a, n_b, mean_diff, weight, contrib): per-stratum arm
    difference of post-period revenue, stratum weight, and weighted
    contribution; TOTAL row (stratum -1) carries the post-stratified
    lift in `contrib` beside the naive diff in `mean_diff`."""
    cust = typed_table(spark, sf_dir, "customer").select("c_custkey")
    orders = typed_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum(
            F.when(
                F.col("o_orderdate") < PERIOD_CUT,
                (F.col("o_totalprice") * 100).cast("bigint"),
            ).otherwise(F.lit(0))
        ).alias("x"),
        F.sum(
            F.when(
                F.col("o_orderdate") >= PERIOD_CUT,
                (F.col("o_totalprice") * 100).cast("bigint"),
            ).otherwise(F.lit(0))
        ).alias("y"),
    )
    units = cust.join(per_cust, "c_custkey", "left").select(
        F.coalesce(F.col("x"), F.lit(0)).alias("x"),
        F.coalesce(F.col("y"), F.lit(0)).alias("y"),
        F.when(
            F.pmod(F.col("c_custkey") * F.lit(HASH_MULT), F.lit(HASH_MOD))
            < AB_ARM_CUT,
            F.lit("A"),
        )
        .otherwise(F.lit("B"))
        .alias("arm"),
    ).select(
        # stratum = bitlen of pre-period cents (0 for x = 0)
        F.when(F.col("x") > 0, F.length(F.bin("x")))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("stratum"),
        "arm",
        "y",
    )
    a = F.col("arm") == "A"
    g = units.groupBy("stratum").agg(
        F.sum(F.when(a, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(~a, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(a, F.col("y")).otherwise(0)).cast("bigint").alias("sy_a"),
        F.sum(F.when(~a, F.col("y")).otherwise(0)).cast("bigint").alias("sy_b"),
    )
    tot = g.agg(
        (F.sum("n_a") + F.sum("n_b")).cast("bigint").alias("n_tot"),
        F.sum("sy_a").cast("bigint").alias("sy_a_t"),
        F.sum("sy_b").cast("bigint").alias("sy_b_t"),
        F.sum("n_a").cast("bigint").alias("n_a_t"),
        F.sum("n_b").cast("bigint").alias("n_b_t"),
    )
    # strata with one empty arm contribute nothing (no within-stratum diff)
    both = g.filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
    mean_diff = F.round(
        F.round(F.col("sy_a") / (100.0 * F.col("n_a")), 6)
        - F.round(F.col("sy_b") / (100.0 * F.col("n_b")), 6),
        6,
    )
    strata = both.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_a",
        "n_b",
        mean_diff.alias("mean_diff"),
        F.round(
            (F.col("n_a") + F.col("n_b")) / F.col("n_tot").cast("double"), 6
        ).alias("weight"),
    ).select(
        "stratum",
        "n_a",
        "n_b",
        "mean_diff",
        "weight",
        F.round(F.col("mean_diff") * F.col("weight"), 6).alias("contrib"),
    )
    total = strata.agg(
        F.round(F.sum("contrib"), 6).alias("ps_lift"),
        F.sum("n_a").cast("bigint").alias("n_a"),
        F.sum("n_b").cast("bigint").alias("n_b"),
        F.round(F.sum("weight"), 6).alias("weight"),
    ).crossJoin(F.broadcast(tot)).select(
        F.lit(-1).cast("bigint").alias("stratum"),
        "n_a",
        "n_b",
        F.round(
            F.round(F.col("sy_a_t") / (100.0 * F.col("n_a_t")), 6)
            - F.round(F.col("sy_b_t") / (100.0 * F.col("n_b_t")), 6),
            6,
        ).alias("mean_diff"),
        "weight",
        F.col("ps_lift").alias("contrib"),
    )
    return strata.unionByName(total).orderBy("stratum")


def poststratified_lift_sql() -> str:
    return f"""
WITH per_cust AS (
  SELECT c.c_custkey,
         COALESCE(SUM(CASE WHEN o.o_orderdate < TIMESTAMP '{PERIOD_CUT}'
             THEN CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
             ELSE 0 END), 0) AS x,
         COALESCE(SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '{PERIOD_CUT}'
             THEN CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
             ELSE 0 END), 0) AS y,
         CASE WHEN (c.c_custkey * {HASH_MULT}) % {HASH_MOD} < {AB_ARM_CUT}
              THEN 'A' ELSE 'B' END AS arm
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 4
),
units AS (
  SELECT CASE WHEN x > 0 THEN CAST(length(bin(x)) AS BIGINT)
              ELSE 0 END AS stratum,
         arm, y
  FROM per_cust
),
g AS MATERIALIZED (
  SELECT stratum,
         CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN arm = 'A' THEN y ELSE 0 END) AS BIGINT) AS sy_a,
         CAST(SUM(CASE WHEN arm = 'B' THEN y ELSE 0 END) AS BIGINT) AS sy_b
  FROM units GROUP BY stratum
),
tot AS (
  SELECT CAST(SUM(n_a) + SUM(n_b) AS BIGINT) AS n_tot,
         CAST(SUM(sy_a) AS BIGINT) AS sy_a_t,
         CAST(SUM(sy_b) AS BIGINT) AS sy_b_t,
         CAST(SUM(n_a) AS BIGINT) AS n_a_t,
         CAST(SUM(n_b) AS BIGINT) AS n_b_t
  FROM g
),
strata AS (
  SELECT stratum, n_a, n_b,
         round(round(CAST(sy_a AS DOUBLE) / (100.0 * n_a), 6)
               - round(CAST(sy_b AS DOUBLE) / (100.0 * n_b), 6), 6)
           AS mean_diff,
         round(CAST(n_a + n_b AS DOUBLE) / n_tot, 6) AS weight
  FROM g, tot
  WHERE n_a > 0 AND n_b > 0
),
srows AS (
  SELECT stratum, n_a, n_b, mean_diff, weight,
         round(mean_diff * weight, 6) AS contrib
  FROM strata
)
SELECT * FROM srows
UNION ALL
SELECT CAST(-1 AS BIGINT),
       CAST((SELECT SUM(n_a) FROM srows) AS BIGINT),
       CAST((SELECT SUM(n_b) FROM srows) AS BIGINT),
       round(round(CAST(sy_a_t AS DOUBLE) / (100.0 * n_a_t), 6)
             - round(CAST(sy_b_t AS DOUBLE) / (100.0 * n_b_t), 6), 6),
       round((SELECT SUM(weight) FROM srows), 6),
       round((SELECT SUM(contrib) FROM srows), 6)
FROM tot
ORDER BY stratum
"""


# ---------------------------------------------------------------------------
# Ratio-scaled counterfactual (causal-impact lite)
#
# The geo-experiment readout: treat one region as INTERVENED at the
# 1998 cutoff, scale the donor regions' post-period monthly series by
# the pre-period treated/donor revenue ratio, and report actual vs
# counterfactual per month with the cumulative lift. This is the
# ratio-scaling special case of synthetic control (one donor pool,
# scale fitted on pre-period totals) — honest about what it is, and the
# shape every geo-lift platform starts from. On a NULL intervention
# (nothing actually happened at the cutoff) the lift should hover near
# zero — which makes it a driver-checkable calibration readout.
#
# Exactness: the counterfactual is the exact integer floor
#   cf = (post_donor_month · pre_treated) div pre_donor
# computed in DECIMAL(38,0)/HUGEINT (the product reaches ~1e30);
# lifts are round-6 ratios of exact integers.
#
# Scale: one (region, month) rollup touches the corpus; everything
# after runs on the ~|months| series frame.

CF_TREATED_REGION = "EUROPE"


def counterfactual_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ym, actual, counterfactual, lift, cum_lift): post-cutoff monthly
    revenue of the treated region vs the donor-scaled counterfactual."""
    from pyspark.sql import Window

    from etl_mini_dw_spark.plans.stats import PSI_CUTOFF

    li = typed_table(spark, sf_dir, "lineitem")
    orders = typed_table(spark, sf_dir, "orders")
    cust = typed_table(spark, sf_dir, "customer")
    nation = typed_table(spark, sf_dir, "nation")
    region = typed_table(spark, sf_dir, "region")
    monthly = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            (F.col("r_name") == CF_TREATED_REGION).alias("treated"),
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
            (F.col("o_orderdate") < PSI_CUTOFF).alias("pre"),
        )
        .agg(
            (F.sum(F.expr("l_extendedprice * (1 - l_discount)")) * 10000)
            .cast("decimal(38,0)")
            .cast("bigint")
            .alias("cents")
        )
        .localCheckpoint(eager=False)
    )
    pre = monthly.filter(F.col("pre")).groupBy("treated").agg(
        F.sum("cents").cast("bigint").alias("pre_tot")
    )
    pre_t = pre.filter(F.col("treated")).select(
        F.col("pre_tot").alias("pre_treated")
    )
    pre_d = pre.filter(~F.col("treated")).select(
        F.col("pre_tot").alias("pre_donor")
    )
    post = monthly.filter(~F.col("pre"))
    act = post.filter(F.col("treated")).select(
        "ym", F.col("cents").alias("a_c")
    )
    don = post.filter(~F.col("treated")).select(
        "ym", F.col("cents").alias("d_c")
    )
    j = (
        act.join(F.broadcast(don), "ym")  # tiny derived series frame:
        # statically stats-less, compiles to SortMergeJoin without the hint
        .crossJoin(F.broadcast(pre_t))
        .crossJoin(F.broadcast(pre_d))
        .select(
            "ym",
            "a_c",
            # exact integer floor in DECIMAL(38,0): product ~1e26
            F.expr(
                "CAST((CAST(d_c AS DECIMAL(19,0))"
                " * CAST(pre_treated AS DECIMAL(19,0))"
                " - pmod(CAST(d_c AS DECIMAL(19,0))"
                " * CAST(pre_treated AS DECIMAL(19,0)),"
                " CAST(pre_donor AS DECIMAL(19,0))))"
                " / CAST(pre_donor AS DECIMAL(19,0)) AS BIGINT)"
            ).alias("cf_c"),
        )
    )
    wcum = Window.orderBy("ym").rowsBetween(Window.unboundedPreceding, 0)
    return (
        j.select(
            "ym",
            F.round(F.col("a_c") / 1e4, 6).alias("actual"),
            F.round(F.col("cf_c") / 1e4, 6).alias("counterfactual"),
            F.round(
                (F.col("a_c") - F.col("cf_c")) / F.col("cf_c").cast("double"),
                6,
            ).alias("lift"),
            F.sum(F.col("a_c") - F.col("cf_c")).over(wcum).alias("cum_diff_c"),
            F.sum("cf_c").over(wcum).alias("cum_cf_c"),
        )
        .select(
            "ym",
            "actual",
            "counterfactual",
            "lift",
            F.round(
                F.col("cum_diff_c") / F.col("cum_cf_c").cast("double"), 6
            ).alias("cum_lift"),
        )
        .orderBy("ym")
    )


def counterfactual_lift_sql() -> str:
    from etl_mini_dw_spark.plans.stats import PSI_CUTOFF

    return f"""
WITH monthly AS MATERIALIZED (
  SELECT r_name = '{CF_TREATED_REGION}' AS treated,
         strftime(o_orderdate, '%Y-%m') AS ym,
         o_orderdate < TIMESTAMP '{PSI_CUTOFF}' AS pre,
         CAST(CAST(SUM(l_extendedprice * (1 - l_discount)) * 10000
              AS DECIMAL(38,0)) AS BIGINT) AS cents
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY 1, 2, 3
),
pre_t AS (SELECT CAST(SUM(cents) AS BIGINT) AS pre_treated
          FROM monthly WHERE pre AND treated),
pre_d AS (SELECT CAST(SUM(cents) AS BIGINT) AS pre_donor
          FROM monthly WHERE pre AND NOT treated),
j AS (
  SELECT a.ym, a.cents AS a_c,
         CAST((CAST(d.cents AS HUGEINT) * pre_treated
               - ((CAST(d.cents AS HUGEINT) * pre_treated % pre_donor
                   + pre_donor) % pre_donor)) // pre_donor AS BIGINT) AS cf_c
  FROM monthly a
  JOIN monthly d ON d.ym = a.ym AND NOT d.pre AND NOT d.treated
  CROSS JOIN pre_t CROSS JOIN pre_d
  WHERE a.treated AND NOT a.pre
)
SELECT ym,
       round(CAST(a_c AS DOUBLE) / 1e4, 6) AS actual,
       round(CAST(cf_c AS DOUBLE) / 1e4, 6) AS counterfactual,
       round(CAST(a_c - cf_c AS DOUBLE) / cf_c, 6) AS lift,
       round(CAST(SUM(a_c - cf_c) OVER (ORDER BY ym) AS DOUBLE)
             / SUM(cf_c) OVER (ORDER BY ym), 6) AS cum_lift
FROM j
ORDER BY ym
"""


# ---------------------------------------------------------------------------
# Price elasticity of demand
#
# The pricing-econometrics primitive: regress ln(mean quantity) on
# ln(effective price factor) across the discount levels — the slope is
# the elasticity (demand %change per price %change; negative and below
# -1 means discounts more than pay for themselves in volume). The
# discount ladder is the price VARIATION source this schema offers,
# and each discount level contributes one (x, y) point weighted by its
# line count.
#
# Portability: per-level means are exact integer ratios; each level
# takes exactly TWO lns on identical doubles (the WOE precedent), both
# rounded-6 BEFORE the weighted-OLS sufficient statistics, which are
# then plain IEEE arithmetic on identical doubles. The report also
# carries each level's point so the fit is auditable.

def price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket_cents, n, mean_qty, ln_price, ln_qty, elasticity, r2):
    one row per discount level plus a TOTAL row (bucket -1) carrying
    the weighted-OLS elasticity and fit R²."""
    li = typed_table(spark, sf_dir, "lineitem").select(
        (F.col("l_discount") * 100).cast("int").alias("bucket_cents"),
        (F.col("l_quantity") * 100).cast("bigint").alias("q_c"),
    )
    per = li.groupBy("bucket_cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q_c").cast("bigint").alias("sq"),
    )
    pts = per.select(
        "bucket_cents",
        "n",
        F.round(F.col("sq") / (100.0 * F.col("n")), 6).alias("mean_qty"),
        # price factor = (100 - discount_cents)/100; ln on an exact ratio
        F.round(
            F.log((100 - F.col("bucket_cents")).cast("double") / 100.0), 6
        ).alias("ln_price"),
        F.round(F.log(F.col("sq") / (100.0 * F.col("n"))), 6).alias("ln_qty"),
    ).localCheckpoint(eager=False)
    # weighted OLS over the ~11 points, weights = line counts
    s = pts.agg(
        F.sum("n").cast("double").alias("w"),
        F.sum(F.col("n") * F.col("ln_price")).alias("sx"),
        F.sum(F.col("n") * F.col("ln_qty")).alias("sy"),
        F.sum(F.col("n") * F.col("ln_price") * F.col("ln_price")).alias("sxx"),
        F.sum(F.col("n") * F.col("ln_qty") * F.col("ln_qty")).alias("syy"),
        F.sum(F.col("n") * F.col("ln_price") * F.col("ln_qty")).alias("sxy"),
    )
    cov = F.col("w") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("w") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("w") * F.col("syy") - F.col("sy") * F.col("sy")
    total = s.select(
        F.lit(-1).cast("int").alias("bucket_cents"),
        F.col("w").cast("bigint").alias("n"),
        F.lit(None).cast("double").alias("mean_qty"),
        F.lit(None).cast("double").alias("ln_price"),
        F.lit(None).cast("double").alias("ln_qty"),
        F.when(vx > 0, F.round(cov / vx, 6)).alias("elasticity"),
        F.when((vx > 0) & (vy > 0), F.round(cov * cov / (vx * vy), 6)).alias(
            "r2"
        ),
    )
    rows = pts.select(
        "bucket_cents",
        "n",
        "mean_qty",
        "ln_price",
        "ln_qty",
        F.lit(None).cast("double").alias("elasticity"),
        F.lit(None).cast("double").alias("r2"),
    )
    return rows.unionByName(total).orderBy("bucket_cents")


def price_elasticity_sql() -> str:
    return """
WITH per AS (
  SELECT CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS INTEGER)
           AS bucket_cents,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS sq
  FROM lineitem GROUP BY 1
),
pts AS MATERIALIZED (
  SELECT bucket_cents, n,
         round(CAST(sq AS DOUBLE) / (100.0 * n), 6) AS mean_qty,
         round(ln(CAST(100 - bucket_cents AS DOUBLE) / 100.0), 6) AS ln_price,
         round(ln(CAST(sq AS DOUBLE) / (100.0 * n)), 6) AS ln_qty
  FROM per
),
s AS (
  SELECT CAST(SUM(n) AS DOUBLE) AS w,
         SUM(n * ln_price) AS sx, SUM(n * ln_qty) AS sy,
         SUM(n * ln_price * ln_price) AS sxx,
         SUM(n * ln_qty * ln_qty) AS syy,
         SUM(n * ln_price * ln_qty) AS sxy
  FROM pts
)
SELECT bucket_cents, n, mean_qty, ln_price, ln_qty,
       CAST(NULL AS DOUBLE) AS elasticity, CAST(NULL AS DOUBLE) AS r2
FROM pts
UNION ALL
SELECT CAST(-1 AS INTEGER), CAST(w AS BIGINT),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       CASE WHEN w * sxx - sx * sx > 0
            THEN round((w * sxy - sx * sy) / (w * sxx - sx * sx), 6) END,
       CASE WHEN w * sxx - sx * sx > 0 AND w * syy - sy * sy > 0
            THEN round((w * sxy - sx * sy) * (w * sxy - sx * sy)
                       / ((w * sxx - sx * sx) * (w * syy - sy * sy)), 6) END
FROM s
ORDER BY bucket_cents
"""


# --- Sample-ratio-mismatch (SRM) check ----------------------------------------
#
# The assignment-health gate every experimentation platform runs BEFORE
# reading any lift metric: if the observed arm split deviates from the
# intended 50/50 beyond chance, the experiment is corrupted (bot
# filtering, redirect loss, hash bias) and CUPED/DiD readouts upstream
# are void. Chi-square with one degree of freedom reduces to
# (n_a − n_b)² / n for a 50/50 design — exact integers until the one
# round-6 division — reported per market segment plus the ALL row, so a
# segment-correlated assignment bug (the insidious kind: global split
# looks fine, one segment is skewed) is visible directly.
#
# Scale: one (segment, arm) aggregate over the customer spine (partial-
# aggregable, dim-sized); the chi-square algebra runs on ≤|segments|+1
# rows. Uses the SAME HASH_MULT/HASH_MOD assignment as ab_cuped_lift, so
# this literally audits the split the other experiment operators read.

SRM_CRIT_95 = 3.841459  # chi-square 95th percentile, 1 dof


def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(segment, n_units, n_a, n_b, chi2, srm_flag): per-segment and ALL
    sample-ratio-mismatch test of the hash-assigned A/B split."""
    cust = typed_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        F.when(
            F.pmod(F.col("c_custkey") * F.lit(HASH_MULT), F.lit(HASH_MOD))
            < AB_ARM_CUT,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_a"),
    )
    per_seg = cust.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        F.sum("is_a").cast("bigint").alias("n_a"),
    )
    allr = cust.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        F.sum("is_a").cast("bigint").alias("n_a"),
    ).select(F.lit("ALL").alias("segment"), "n_units", "n_a")
    base = per_seg.unionByName(allr).withColumn(
        "n_b", (F.col("n_units") - F.col("n_a")).cast("bigint")
    )
    d = F.col("n_a") - F.col("n_b")
    chi2 = F.when(
        F.col("n_units") > 0,
        F.round((d * d).cast("double") / F.col("n_units").cast("double"), 6),
    )
    return base.select(
        "segment",
        "n_units",
        "n_a",
        "n_b",
        chi2.alias("chi2"),
        (chi2 > SRM_CRIT_95).alias("srm_flag"),
    ).orderBy("segment")


def ab_srm_check_sql() -> str:
    return f"""
WITH assigned AS (
  SELECT c_mktsegment AS segment,
         CASE WHEN (c_custkey * {HASH_MULT}) % {HASH_MOD} < {AB_ARM_CUT}
              THEN 1 ELSE 0 END AS is_a
  FROM customer
),
base AS (
  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_units,
         CAST(SUM(is_a) AS BIGINT) AS n_a
  FROM assigned GROUP BY 1
  UNION ALL
  SELECT 'ALL', CAST(COUNT(*) AS BIGINT), CAST(SUM(is_a) AS BIGINT)
  FROM assigned
)
SELECT segment, n_units, n_a,
       CAST(n_units - n_a AS BIGINT) AS n_b,
       CASE WHEN n_units > 0
            THEN round(CAST((n_a - (n_units - n_a))
                            * (n_a - (n_units - n_a)) AS DOUBLE) / n_units, 6)
       END AS chi2,
       CASE WHEN n_units > 0
            THEN round(CAST((n_a - (n_units - n_a))
                            * (n_a - (n_units - n_a)) AS DOUBLE) / n_units, 6)
                 > {SRM_CRIT_95}
       END AS srm_flag
FROM base ORDER BY segment
"""


# ---------------------------------------------------------------------------
# Randomization (permutation) test for the A/B revenue lift
#
# The exact-null counterpart of the Poisson bootstrap (stats.py): the
# bootstrap quantifies estimator SPREAD; this answers "could the
# observed arm difference have arisen under the null of no treatment
# effect" by re-randomizing units with the same Bernoulli(1/2) hashing
# mechanism the platform actually assigns with (Fisher randomization
# test, re-randomization flavor). p = (#{|diff_r| >= |diff_obs|} + 1)
# / (B + 1) — the add-one convention that keeps the test valid at
# finite B (Phipson & Smyth 2010).
#
# Determinism: the per-(unit, rep) pseudo-arm is the parity of the same
# md5-derived 28-bit integer the bootstrap uses — a pure function of
# (c_custkey, rep), bit-identical across engines and partitionings.
# Per-rep sums are exact BIGINT cents (< 2^53, so the mean-difference
# doubles are IEEE-identical); the extreme-count comparison happens on
# identical doubles, so n_extreme is exact on both engines.
#
# Scale: one o_custkey groupBy + spine join (the CUPED shape), then a
# xB explode of a 2-column projection and ONE groupBy(rep) that
# partial-aggregates to B rows map-side. No corpus-sized shuffle.

PERM_REPS = 64


def _perm_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-checkpoint permutation-test unit frame (spine join + fanout).

    Split out so plan-shape tests can see the fanout Exchange: the
    localCheckpoint permutation_test_lift adds truncates explain() at a
    LogicalRDD scan, hiding everything upstream.
    """
    cust = typed_table(spark, sf_dir, "customer").select("c_custkey")
    orders = typed_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum((F.col("o_totalprice") * 100).cast("bigint")).alias("y")
    )
    return cust.join(per_cust, "c_custkey", "left").select(
        "c_custkey",
        F.when(
            F.pmod(F.col("c_custkey") * F.lit(HASH_MULT), F.lit(HASH_MOD))
            < AB_ARM_CUT,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("in_a"),
        F.coalesce(F.col("y"), F.lit(0)).cast("bigint").alias("y"),
    ).repartition(
        # the xB md5 fan-out below is CPU-bound and the spine join's
        # KB-scale output otherwise lands in ~1 AQE-coalesced partition
        # (measured 12.1 s at 15k units in one task — the byte-based
        # coalescing blind spot, CLAUDE.md). The shuffle moves only a
        # 3-column projection; at cluster scale it spreads the hashing
        # stage across all cores the same way.
        spark.sparkContext.defaultParallelism
    )


def permutation_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: (n_units, n_a_obs, b_reps, obs_diff, n_extreme, p_value)
    — randomization test of the hash-assigned A/B revenue difference."""
    units = _perm_units(spark, sf_dir).localCheckpoint(
        eager=False
    )  # consumed by the observed agg AND the fan-out
    obs = units.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        F.sum("in_a").cast("bigint").alias("n_a_obs"),
        F.sum(F.when(F.col("in_a") == 1, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("sy_a"),
        F.sum(F.when(F.col("in_a") == 0, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("sy_b"),
    ).select(
        "n_units",
        "n_a_obs",
        (
            F.col("sy_a").cast("double") / F.col("n_a_obs").cast("double")
            - F.col("sy_b").cast("double")
            / (F.col("n_units") - F.col("n_a_obs")).cast("double")
        ).alias("obs_diff"),
    )
    reps = units.select(
        "c_custkey",
        "y",
        F.explode(F.sequence(F.lit(0), F.lit(PERM_REPS - 1))).alias("rep"),
    )
    u = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit("perm"),
                    F.col("c_custkey").cast("string"),
                    F.col("rep").cast("string"),
                )
            ),
            1,
            7,
        ),
        16,
        10,
    ).cast("bigint")
    rep_stats = (
        reps.withColumn("pa", F.pmod(u, F.lit(2)))
        .groupBy("rep")
        .agg(
            F.sum("pa").cast("bigint").alias("n_a"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("pa") == 1, F.col("y")).otherwise(0))
            .cast("bigint")
            .alias("sy_a"),
            F.sum(F.when(F.col("pa") == 0, F.col("y")).otherwise(0))
            .cast("bigint")
            .alias("sy_b"),
        )
        .select(
            "rep",
            F.when(
                (F.col("n_a") > 0) & (F.col("n_a") < F.col("n")),
                F.col("sy_a").cast("double") / F.col("n_a").cast("double")
                - F.col("sy_b").cast("double")
                / (F.col("n") - F.col("n_a")).cast("double"),
            ).alias("diff"),
        )
    )
    joined = rep_stats.crossJoin(F.broadcast(obs))
    return (
        joined.agg(
            F.max("n_units").cast("bigint").alias("n_units"),
            F.max("n_a_obs").cast("bigint").alias("n_a_obs"),
            F.lit(PERM_REPS).cast("bigint").alias("b_reps"),
            F.round(F.max("obs_diff"), 6).alias("obs_diff"),
            F.sum(
                F.when(F.abs(F.col("diff")) >= F.abs(F.col("obs_diff")), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_extreme"),
        )
        .select(
            "n_units",
            "n_a_obs",
            "b_reps",
            "obs_diff",
            "n_extreme",
            F.round(
                (F.col("n_extreme").cast("double") + F.lit(1.0))
                / (F.lit(float(PERM_REPS)) + F.lit(1.0)),
                6,
            ).alias("p_value"),
        )
    )


def permutation_test_lift_sql() -> str:
    return f"""
WITH per_cust AS (
  SELECT o_custkey AS c_custkey,
         CAST(SUM(CAST(o_totalprice * 100 AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
units AS (
  SELECT c.c_custkey,
         CASE WHEN (c.c_custkey * {HASH_MULT}) % {HASH_MOD} < {AB_ARM_CUT}
              THEN 1 ELSE 0 END AS in_a,
         COALESCE(p.y, 0) AS y
  FROM customer c LEFT JOIN per_cust p USING (c_custkey)
),
obs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
         CAST(SUM(in_a) AS BIGINT) AS n_a_obs,
         CAST(SUM(CASE WHEN in_a = 1 THEN y ELSE 0 END) AS DOUBLE)
           / CAST(SUM(in_a) AS DOUBLE)
         - CAST(SUM(CASE WHEN in_a = 0 THEN y ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) - SUM(in_a) AS DOUBLE) AS obs_diff
  FROM units
),
reps AS (
  SELECT u.c_custkey, u.y, CAST(r AS INT) AS rep
  FROM units u, (SELECT unnest(range({PERM_REPS})) AS r)
),
assigned AS (
  SELECT rep, y,
         ('0x' || substr(md5('perm' || ':' || c_custkey::VARCHAR
                             || ':' || rep::VARCHAR), 1, 7))::BIGINT % 2 AS pa
  FROM reps
),
rep_stats AS (
  SELECT rep,
         CASE WHEN SUM(pa) > 0 AND SUM(pa) < COUNT(*)
              THEN CAST(SUM(CASE WHEN pa = 1 THEN y ELSE 0 END) AS DOUBLE)
                     / CAST(SUM(pa) AS DOUBLE)
                   - CAST(SUM(CASE WHEN pa = 0 THEN y ELSE 0 END) AS DOUBLE)
                     / CAST(COUNT(*) - SUM(pa) AS DOUBLE)
         END AS diff
  FROM assigned GROUP BY 1
)
SELECT CAST(o.n_units AS BIGINT) AS n_units,
       CAST(o.n_a_obs AS BIGINT) AS n_a_obs,
       CAST({PERM_REPS} AS BIGINT) AS b_reps,
       round(MAX(o.obs_diff), 6) AS obs_diff,
       CAST(SUM(CASE WHEN abs(r.diff) >= abs(o.obs_diff) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_extreme,
       round((CAST(SUM(CASE WHEN abs(r.diff) >= abs(o.obs_diff) THEN 1 ELSE 0 END)
                   AS DOUBLE) + 1.0) / ({float(PERM_REPS)} + 1.0), 6) AS p_value
FROM rep_stats r CROSS JOIN obs o
GROUP BY o.n_units, o.n_a_obs, o.obs_diff
"""


# ---------------------------------------------------------------------------
# Group-sequential interim analysis (O'Brien-Fleming boundaries)
#
# The third leg of the platform's inference kit (bootstrap = spread,
# randomization test = exact null, this = "when could we have stopped"):
# K=4 calendar looks over the experiment window, a cumulative two-sample
# z per look, and the classic O'Brien-Fleming group-sequential bounds
# (O'Brien & Fleming 1979; constants are the standard K=4, two-sided
# alpha=0.05 critical values c*sqrt(K/k), c = 2.024) inlined as
# literals on both engines — no quantile function crosses the oracle.
#
# Determinism: per-(look, arm) sufficient statistics are exact (BIGINT
# cent sums; DECIMAL(38,0)/HUGEINT squared sums), the z expression is
# written in the same evaluation order on both sides, and z is round-6'd
# before the boundary comparison so a 1-ulp wide-decimal->double skew
# (CLAUDE.md) cannot flip `crossed`.
#
# Scale: the look fan-out is a <=K x explode of a 3-column projection
# with ONE groupBy(look) partial-aggregable reduction — the bootstrap's
# shape with K=4 instead of B=64. Nothing global but a K-row frame.

GS_LOOKS = ["1997-01-01", "1998-01-01", "1999-01-01", "2000-01-01"]
# O'Brien-Fleming two-sided alpha=0.05, K=4: z_k = 2.024 * sqrt(4 / k)
GS_BOUNDS = [4.048, 2.862, 2.337, 2.024]


def group_sequential_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(look, cut_date, n_a, n_b, mean_diff, z, obf_bound, crossed) —
    cumulative interim z of the hash-assigned A/B order-revenue
    difference at each calendar look vs the O'Brien-Fleming bound."""
    orders = typed_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", (F.col("o_totalprice") * 100).cast("bigint").alias("y")
    )
    looks = spark.createDataFrame(
        [(i + 1, d, GS_BOUNDS[i]) for i, d in enumerate(GS_LOOKS)],
        "look int, cut_date string, obf_bound double",
    )
    fan = orders.crossJoin(F.broadcast(looks)).filter(
        F.col("o_orderdate") < F.col("cut_date")
    )
    arm_a = (
        F.pmod(F.col("o_custkey") * F.lit(HASH_MULT), F.lit(HASH_MOD)) < AB_ARM_CUT
    )
    yd = F.col("y").cast("decimal(19,0)")
    per_look = fan.groupBy("look", "cut_date", "obf_bound").agg(
        F.sum(F.when(arm_a, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(~arm_a, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(arm_a, F.col("y")).otherwise(0)).cast("bigint").alias("sy_a"),
        F.sum(F.when(~arm_a, F.col("y")).otherwise(0)).cast("bigint").alias("sy_b"),
        F.sum(F.when(arm_a, yd * yd).otherwise(F.lit(0).cast("decimal(19,0)")))
        .cast("decimal(38,0)")
        .alias("syy_a"),
        F.sum(F.when(~arm_a, yd * yd).otherwise(F.lit(0).cast("decimal(19,0)")))
        .cast("decimal(38,0)")
        .alias("syy_b"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    ma = F.col("sy_a").cast("double") / na
    mb = F.col("sy_b").cast("double") / nb
    s2a = (F.col("syy_a").cast("double") - F.col("sy_a").cast("double") * F.col("sy_a").cast("double") / na) / (na - F.lit(1.0))
    s2b = (F.col("syy_b").cast("double") - F.col("sy_b").cast("double") * F.col("sy_b").cast("double") / nb) / (nb - F.lit(1.0))
    se2 = s2a / na + s2b / nb
    z6 = F.when(
        (F.col("n_a") > 1) & (F.col("n_b") > 1) & (se2 > 0),
        F.round((ma - mb) / F.sqrt(se2), 6),
    )
    return (
        per_look.select(
            "look",
            "cut_date",
            "n_a",
            "n_b",
            F.round(ma - mb, 6).alias("mean_diff"),
            z6.alias("z"),
            "obf_bound",
            F.when(F.abs(z6) >= F.col("obf_bound"), 1)
            .otherwise(0)
            .cast("int")
            .alias("crossed"),
        )
        .orderBy("look")
    )


def group_sequential_lift_sql() -> str:
    looks_rows = ", ".join(
        f"({i + 1}, '{d}', {GS_BOUNDS[i]})" for i, d in enumerate(GS_LOOKS)
    )
    return f"""
WITH looks(look, cut_date, obf_bound) AS (VALUES {looks_rows}),
fan AS (
  SELECT l.look, l.cut_date, l.obf_bound,
         CASE WHEN (o.o_custkey * {HASH_MULT}) % {HASH_MOD} < {AB_ARM_CUT}
              THEN 1 ELSE 0 END AS in_a,
         CAST(o.o_totalprice * 100 AS BIGINT) AS y
  FROM orders o CROSS JOIN looks l
  WHERE CAST(o.o_orderdate AS VARCHAR) < l.cut_date
),
per_look AS (
  SELECT look, cut_date, obf_bound,
         CAST(SUM(in_a) AS BIGINT) AS n_a,
         CAST(COUNT(*) - SUM(in_a) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN in_a = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_a,
         CAST(SUM(CASE WHEN in_a = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_b,
         CAST(SUM(CASE WHEN in_a = 1
                       THEN CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))
                       ELSE CAST(0 AS DECIMAL(19,0)) END) AS DECIMAL(38,0)) AS syy_a,
         CAST(SUM(CASE WHEN in_a = 0
                       THEN CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))
                       ELSE CAST(0 AS DECIMAL(19,0)) END) AS DECIMAL(38,0)) AS syy_b
  FROM fan GROUP BY 1, 2, 3
),
scored AS (
  SELECT look, cut_date, n_a, n_b, obf_bound,
         round(CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS mean_diff,
         CASE WHEN n_a > 1 AND n_b > 1
               AND (CAST(syy_a AS DOUBLE)
                    - CAST(sy_a AS DOUBLE) * CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                   / (CAST(n_a AS DOUBLE) - 1.0) / CAST(n_a AS DOUBLE)
                 + (CAST(syy_b AS DOUBLE)
                    - CAST(sy_b AS DOUBLE) * CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                   / (CAST(n_b AS DOUBLE) - 1.0) / CAST(n_b AS DOUBLE) > 0
              THEN round((CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                          - CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                         / sqrt((CAST(syy_a AS DOUBLE)
                                 - CAST(sy_a AS DOUBLE) * CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                                / (CAST(n_a AS DOUBLE) - 1.0) / CAST(n_a AS DOUBLE)
                              + (CAST(syy_b AS DOUBLE)
                                 - CAST(sy_b AS DOUBLE) * CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                                / (CAST(n_b AS DOUBLE) - 1.0) / CAST(n_b AS DOUBLE)), 6)
         END AS z
  FROM per_look
)
SELECT look, cut_date, n_a, n_b, mean_diff, z,
       CAST(obf_bound AS DOUBLE) AS obf_bound,
       CAST(CASE WHEN abs(z) >= obf_bound THEN 1 ELSE 0 END AS INTEGER) AS crossed
FROM scored ORDER BY look
"""


# ---------------------------------------------------------------------------
# Two-way fixed-effects (within) estimator
#
# The workhorse of observational panel inference (Wooldridge 2010 ch.10;
# the regression the DiD report is a 2x2 special case of): regress the
# cell outcome on the cell regressor AFTER sweeping out unit and period
# means,
#
#   y~_it = y_it - mean_i - mean_t + mean,   beta = sum(x~ y~)/sum(x~^2)
#
# Panel here: unit = customer nation, period = order month, y = cell
# revenue in integer cents, x = cell order count. beta_pooled (no
# effects) is reported next to beta_within — the gap IS the
# cross-sectional confound the fixed effects absorb.
#
# Determinism: cell sums are exact BIGINTs; unit/period/grand means are
# correctly-rounded doubles of identical integers; the demeaned products
# are round-6'd PER CELL then summed as DECIMAL(38,6) (order-free), so
# no double ever accumulates across rows. Pooled sufficient statistics
# are exact DECIMAL(38,0) sums (the trend-slope pattern).
#
# Scale: one (unit, period) aggregate over the fact join; everything
# after runs on the n_units x n_periods cell frame (metadata-sized:
# group-key cardinality, not row count). Dimension side broadcast.


def panel_fixed_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (n_units, n_periods, n_cells, beta_pooled, beta_within):
    revenue-on-volume slope before and after two-way demeaning."""
    cust = typed_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    panel = (
        typed_table(spark, sf_dir, "orders")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_nationkey").alias("u"),
            F.date_format("o_orderdate", "yyyy-MM").alias("t"),
            F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("u", "t")
        .agg(
            F.sum("cents").cast("bigint").alias("y"),
            F.count(F.lit(1)).cast("bigint").alias("x"),
        )
        .localCheckpoint(eager=False)  # unit/period/grand means all read it
    )
    ui = panel.groupBy("u").agg(
        F.sum("y").cast("bigint").alias("syu"),
        F.sum("x").cast("bigint").alias("sxu"),
        F.count(F.lit(1)).cast("bigint").alias("nu"),
    )
    ti = panel.groupBy("t").agg(
        F.sum("y").cast("bigint").alias("syt"),
        F.sum("x").cast("bigint").alias("sxt"),
        F.count(F.lit(1)).cast("bigint").alias("nt"),
    )
    g = panel.agg(
        F.sum("y").cast("bigint").alias("syg"),
        F.sum("x").cast("bigint").alias("sxg"),
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum(F.col("y").cast("decimal(19,0)") * F.col("x").cast("decimal(19,0)"))
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x").cast("decimal(19,0)"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.countDistinct("u").cast("bigint").alias("n_units"),
        F.countDistinct("t").cast("bigint").alias("n_periods"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    yt = (
        dbl("y")
        - dbl("syu") / dbl("nu")
        - dbl("syt") / dbl("nt")
        + dbl("syg") / dbl("ng")
    )
    xt = (
        dbl("x")
        - dbl("sxu") / dbl("nu")
        - dbl("sxt") / dbl("nt")
        + dbl("sxg") / dbl("ng")
    )
    within = (
        panel.join(F.broadcast(ui), "u")
        .join(F.broadcast(ti), "t")
        .crossJoin(F.broadcast(g))
        .agg(
            F.sum(F.round(yt * xt, 6).cast("decimal(38,6)")).alias("num"),
            F.sum(F.round(xt * xt, 6).cast("decimal(38,6)")).alias("den"),
        )
    )
    n = dbl("ng")
    pnum = n * dbl("sxy") - dbl("sxg") * dbl("syg")
    pden = n * dbl("sxx") - dbl("sxg") * dbl("sxg")
    return (
        g.crossJoin(F.broadcast(within))
        .select(
            "n_units",
            "n_periods",
            F.col("ng").alias("n_cells"),
            F.when(pden > 0, F.round(pnum / pden, 6)).alias("beta_pooled"),
            F.when(
                F.col("den") > 0,
                F.round(F.col("num").cast("double") / F.col("den").cast("double"), 6),
            ).alias("beta_within"),
        )
    )


PANEL_FE_SQL = """
WITH panel AS (
  SELECT c_nationkey AS u, strftime(o_orderdate, '%Y-%m') AS t,
         -- the decimal INGEST cast mirrors typed_table (raw parquet is
         -- DOUBLE; Spark's exact-money contract rounds to 2 dp first)
         CAST(SUM(CAST(floor(CAST(o_totalprice AS DECIMAL(14,2)) * 100) AS BIGINT)) AS BIGINT) AS y,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
ui AS (SELECT u, CAST(SUM(y) AS BIGINT) AS syu, CAST(SUM(x) AS BIGINT) AS sxu,
              CAST(COUNT(*) AS BIGINT) AS nu FROM panel GROUP BY 1),
ti AS (SELECT t, CAST(SUM(y) AS BIGINT) AS syt, CAST(SUM(x) AS BIGINT) AS sxt,
              CAST(COUNT(*) AS BIGINT) AS nt FROM panel GROUP BY 1),
g AS (
  SELECT CAST(SUM(y) AS BIGINT) AS syg, CAST(SUM(x) AS BIGINT) AS sxg,
         CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sxx,
         CAST(COUNT(DISTINCT u) AS BIGINT) AS n_units,
         CAST(COUNT(DISTINCT t) AS BIGINT) AS n_periods
  FROM panel
),
within AS (
  SELECT
    SUM(CAST(round((CAST(y AS DOUBLE) - CAST(syu AS DOUBLE) / nu
                    - CAST(syt AS DOUBLE) / nt + CAST(syg AS DOUBLE) / ng)
                   * (CAST(x AS DOUBLE) - CAST(sxu AS DOUBLE) / nu
                      - CAST(sxt AS DOUBLE) / nt + CAST(sxg AS DOUBLE) / ng), 6)
             AS DECIMAL(38,6))) AS num,
    SUM(CAST(round((CAST(x AS DOUBLE) - CAST(sxu AS DOUBLE) / nu
                    - CAST(sxt AS DOUBLE) / nt + CAST(sxg AS DOUBLE) / ng)
                   * (CAST(x AS DOUBLE) - CAST(sxu AS DOUBLE) / nu
                      - CAST(sxt AS DOUBLE) / nt + CAST(sxg AS DOUBLE) / ng), 6)
             AS DECIMAL(38,6))) AS den
  FROM panel JOIN ui USING (u) JOIN ti USING (t) CROSS JOIN g
)
SELECT n_units, n_periods, ng AS n_cells,
       CASE WHEN CAST(ng AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sxg AS DOUBLE) * CAST(sxg AS DOUBLE) > 0
            THEN round((CAST(ng AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sxg AS DOUBLE) * CAST(syg AS DOUBLE))
                       / (CAST(ng AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sxg AS DOUBLE) * CAST(sxg AS DOUBLE)), 6)
       END AS beta_pooled,
       CASE WHEN den > 0
            THEN round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
       END AS beta_within
FROM g CROSS JOIN within
"""


# ---------------------------------------------------------------------------
# Benjamini–Hochberg FDR screen over per-nation lifts
#
# The multiple-testing control the inference kit was missing: the CUPED /
# permutation / sequential reports each test ONE contrast; a platform
# reading a 25-nation breakdown and flagging every |z| > 1.96 inflates
# false discoveries ~12x at m=25. BH (1995) fixes the FALSE DISCOVERY
# RATE: sort p ascending (= |z| descending), find the largest k with
# p_(k) <= k*q/m, reject ranks 1..k*.
#
# Engine portability: neither engine ships an inverse normal CDF, so the
# per-rank |z| thresholds Phi^-1(1 - k*q/(2m)) are computed ONCE at
# import by bisection on math.erf (pure stdlib, deterministic) and
# inlined as round-6 literals in BOTH expression trees — the
# O'Brien–Fleming-bounds precedent (group_sequential_lift). z is
# round-6'd BEFORE every comparison (wide-decimal rule) and ties rank
# on the nation key, so the rejection SET is identical cross-engine.
#
# Scale: one (nation, arm) sufficient-statistics shuffle (exact BIGINT /
# DECIMAL(38,0) first+second moments); everything after runs on the
# 25-row frame (the metadata window class).

BH_Q = 0.10  # target false-discovery rate
BH_M = 25  # number of nation-level hypotheses


def _inv_norm_upper(p_tail: float) -> float:
    """z with P(Z > z) = p_tail, by bisection on math.erf (stdlib-only,
    deterministic across platforms at the 6-dp rounding used below)."""
    import math

    lo, hi = 0.0, 40.0
    for _ in range(200):
        mid = (lo + hi) / 2.0
        if 0.5 * (1.0 - math.erf(mid / math.sqrt(2.0))) > p_tail:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


BH_THRESHOLDS = [
    round(_inv_norm_upper(k * BH_Q / (2.0 * BH_M)), 6) for k in range(1, BH_M + 1)
]


def bh_fdr_nation_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nation, n_a, n_b, z_abs, bh_rank, bh_threshold, rejected): the
    25 per-nation hash-split revenue lifts screened at FDR q=0.10."""
    from pyspark.sql import Window

    cust = typed_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = typed_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum((F.col("o_totalprice") * 100).cast("bigint")).alias("y")
    )
    units = cust.join(per_cust, "c_custkey", "left").select(
        F.col("c_nationkey").alias("nation"),
        F.when(
            F.pmod(F.col("c_custkey") * F.lit(HASH_MULT), F.lit(HASH_MOD))
            < AB_ARM_CUT,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("in_a"),
        F.coalesce(F.col("y"), F.lit(0)).cast("bigint").alias("y"),
    )
    yd = F.col("y").cast("decimal(19,0)")
    per = units.groupBy("nation").agg(
        F.sum("in_a").cast("bigint").alias("n_a"),
        F.sum(F.lit(1) - F.col("in_a")).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("in_a") == 1, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("sa"),
        F.sum(F.when(F.col("in_a") == 0, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("sb"),
        F.sum(F.when(F.col("in_a") == 1, yd * yd).otherwise(F.lit(0)))
        .cast("decimal(38,0)")
        .alias("qa"),
        F.sum(F.when(F.col("in_a") == 0, yd * yd).otherwise(F.lit(0)))
        .cast("decimal(38,0)")
        .alias("qb"),
    )
    # ANSI landmine (CLAUDE.md): Catalyst can evaluate a CASE branch's
    # division before the branch guard — divisors must be UNCONDITIONALLY
    # nonzero. greatest(n, 2) == n whenever the n_a/n_b > 1 guard passes,
    # so the guarded value is unchanged; the unguarded value is unused.
    na = F.greatest(F.col("n_a").cast("double"), F.lit(2.0))
    nb = F.greatest(F.col("n_b").cast("double"), F.lit(2.0))
    ma = F.col("sa").cast("double") / na
    mb = F.col("sb").cast("double") / nb
    va = (F.col("qa").cast("double") - na * ma * ma) / (na - F.lit(1.0))
    vb = (F.col("qb").cast("double") - nb * mb * mb) / (nb - F.lit(1.0))
    se2 = va / na + vb / nb
    z_abs = F.when(
        (F.col("n_a") > 1) & (F.col("n_b") > 1) & (se2 > 0),
        F.round(F.abs((ma - mb) / F.sqrt(se2)), 6),
    ).otherwise(F.lit(0.0))
    scored = per.select("nation", "n_a", "n_b", z_abs.alias("z_abs"))
    w = Window.orderBy(F.col("z_abs").desc(), F.col("nation"))
    thr = F.element_at(
        F.array(*[F.lit(t) for t in BH_THRESHOLDS]), F.col("bh_rank")
    )
    ranked = (
        scored.withColumn("bh_rank", F.row_number().over(w).cast("int"))
        .withColumn("bh_threshold", thr)
        .withColumn(
            "_crossed_rank",
            F.when(F.col("z_abs") >= F.col("bh_threshold"), F.col("bh_rank")),
        )
    )
    kstar = ranked.agg(
        F.coalesce(F.max("_crossed_rank"), F.lit(0)).cast("int").alias("_kstar")
    )
    return (
        ranked.crossJoin(F.broadcast(kstar))
        .select(
            "nation",
            "n_a",
            "n_b",
            "z_abs",
            "bh_rank",
            "bh_threshold",
            F.when(F.col("bh_rank") <= F.col("_kstar"), 1)
            .otherwise(0)
            .cast("int")
            .alias("rejected"),
        )
        .orderBy("bh_rank")
    )


def bh_fdr_nation_screen_sql() -> str:
    thr_rows = ", ".join(
        f"({k + 1}, {t})" for k, t in enumerate(BH_THRESHOLDS)
    )
    return f"""
WITH units AS (
  SELECT c.c_nationkey AS nation,
         CASE WHEN (c.c_custkey * {HASH_MULT}) % {HASH_MOD} < {AB_ARM_CUT}
              THEN 1 ELSE 0 END AS in_a,
         CAST(COALESCE(o.y, 0) AS BIGINT) AS y
  FROM customer c LEFT JOIN (
    SELECT o_custkey,
           SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS y
    FROM orders GROUP BY 1) o ON c.c_custkey = o.o_custkey
),
per AS (
  SELECT nation,
         CAST(SUM(in_a) AS BIGINT) AS n_a,
         CAST(SUM(1 - in_a) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN in_a = 1 THEN y ELSE 0 END) AS BIGINT) AS sa,
         CAST(SUM(CASE WHEN in_a = 0 THEN y ELSE 0 END) AS BIGINT) AS sb,
         CAST(SUM(CASE WHEN in_a = 1
                       THEN CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))
                       ELSE 0 END) AS DECIMAL(38,0)) AS qa,
         CAST(SUM(CASE WHEN in_a = 0
                       THEN CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))
                       ELSE 0 END) AS DECIMAL(38,0)) AS qb
  FROM units GROUP BY 1
),
scored AS (
  SELECT nation, n_a, n_b,
         CASE WHEN n_a > 1 AND n_b > 1
               AND (CAST(qa AS DOUBLE) - n_a * (CAST(sa AS DOUBLE) / GREATEST(n_a, 2)) * (CAST(sa AS DOUBLE) / GREATEST(n_a, 2))) / (GREATEST(n_a, 2) - 1.0) / GREATEST(n_a, 2)
                 + (CAST(qb AS DOUBLE) - n_b * (CAST(sb AS DOUBLE) / GREATEST(n_b, 2)) * (CAST(sb AS DOUBLE) / GREATEST(n_b, 2))) / (GREATEST(n_b, 2) - 1.0) / GREATEST(n_b, 2) > 0
              THEN round(abs((CAST(sa AS DOUBLE) / GREATEST(n_a, 2) - CAST(sb AS DOUBLE) / GREATEST(n_b, 2))
                   / sqrt((CAST(qa AS DOUBLE) - n_a * (CAST(sa AS DOUBLE) / GREATEST(n_a, 2)) * (CAST(sa AS DOUBLE) / GREATEST(n_a, 2))) / (GREATEST(n_a, 2) - 1.0) / GREATEST(n_a, 2)
                        + (CAST(qb AS DOUBLE) - n_b * (CAST(sb AS DOUBLE) / GREATEST(n_b, 2)) * (CAST(sb AS DOUBLE) / GREATEST(n_b, 2))) / (GREATEST(n_b, 2) - 1.0) / GREATEST(n_b, 2))), 6)
              ELSE 0.0 END AS z_abs
  FROM per
),
thr(bh_rank, bh_threshold) AS (VALUES {thr_rows}),
ranked AS (
  SELECT s.*, CAST(row_number() OVER (ORDER BY z_abs DESC, nation) AS INTEGER)
                AS bh_rank
  FROM scored s
),
kstar AS (
  SELECT CAST(COALESCE(MAX(CASE WHEN r.z_abs >= CAST(t.bh_threshold AS DOUBLE)
                                THEN r.bh_rank END), 0) AS INTEGER) AS ks
  FROM ranked r JOIN thr t USING (bh_rank)
)
SELECT nation, n_a, n_b, z_abs, bh_rank,
       CAST(t.bh_threshold AS DOUBLE) AS bh_threshold,
       CAST(CASE WHEN bh_rank <= ks THEN 1 ELSE 0 END AS INTEGER) AS rejected
FROM ranked JOIN thr t USING (bh_rank) CROSS JOIN kstar
ORDER BY bh_rank
"""


# ---------------------------------------------------------------------------
# Coarsened Exact Matching ATT
#
# Iacus, King & Porro (2012): coarsen the covariates into discrete
# strata, keep only strata containing BOTH treated and control units,
# estimate the treatment effect as the treated-share-weighted mean of
# within-stratum outcome differences. The observational-causal
# counterpart of the A/B kit (here "treatment" = customer sits in the
# EUROPE region — a deliberately confounded assignment the matching has
# to de-bias), reported next to the naive difference so the reader sees
# the confound the matching removed.
#
# Strata: market segment x 20-bucket equi-width account-balance band
# (the wasserstein grid rule; identical IEEE bucket ids both engines).
# Determinism: every stratum statistic is an exact BIGINT sum; the
# weighted ATT is assembled from correctly-rounded per-stratum doubles
# whose weights are integer ratios, round-6 at the end.
#
# Scale: one (stratum) aggregate over the dimension-sized customer
# frame joined to per-customer revenue (fact-side partial agg); the
# matching algebra runs on the <= |segments| x 20 stratum frame.

CEM_BANDS = 20
CEM_TREATED_REGION = "EUROPE"


def cem_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (n_treated, n_control, n_strata_matched, treated_matched,
    naive_diff, att): coarsened-exact-matching ATT of EUROPE membership
    on customer revenue (cents)."""
    cust = typed_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    nat = typed_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    reg = typed_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    orders = typed_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum((F.col("o_totalprice") * 100).cast("bigint")).alias("y")
    )
    units = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(per_cust, "c_custkey", "left")
        .select(
            F.when(F.col("r_name") == CEM_TREATED_REGION, 1)
            .otherwise(0)
            .alias("tr"),
            "c_mktsegment",
            F.col("c_acctbal").cast("double").alias("bal"),
            F.coalesce(F.col("y"), F.lit(0)).cast("bigint").alias("y"),
        )
        .localCheckpoint(eager=False)  # min/max + strata both read it
    )
    mm = units.agg(F.min("bal").alias("_mn"), F.max("bal").alias("_mx"))
    width = F.greatest(
        (F.col("_mx") - F.col("_mn")) / F.lit(float(CEM_BANDS)), F.lit(1e-12)
    )
    band = F.least(
        F.floor((F.col("bal") - F.col("_mn")) / width).cast("int"),
        F.lit(CEM_BANDS - 1),
    )
    strata = (
        units.crossJoin(F.broadcast(mm))
        .select("tr", "c_mktsegment", band.alias("band"), "y")
        .groupBy("c_mktsegment", "band")
        .agg(
            F.sum("tr").cast("bigint").alias("nt"),
            F.sum(F.lit(1) - F.col("tr")).cast("bigint").alias("nc"),
            F.sum(F.when(F.col("tr") == 1, F.col("y")).otherwise(0))
            .cast("bigint")
            .alias("syt"),
            F.sum(F.when(F.col("tr") == 0, F.col("y")).otherwise(0))
            .cast("bigint")
            .alias("syc"),
        )
    )
    m = F.when((F.col("nt") > 0) & (F.col("nc") > 0), 1).otherwise(0)
    tot = strata.agg(
        F.sum("nt").cast("bigint").alias("n_treated"),
        F.sum("nc").cast("bigint").alias("n_control"),
        F.sum(m).cast("bigint").alias("n_strata_matched"),
        F.sum(F.when(m == 1, F.col("nt")).otherwise(0))
        .cast("bigint")
        .alias("treated_matched"),
        F.sum("syt").cast("bigint").alias("syt_all"),
        F.sum("syc").cast("bigint").alias("syc_all"),
        # ATT numerator: sum over matched strata of nt_s * (mean_t - mean_c),
        # each term a correctly-rounded double of exact integers, round-6'd
        # per stratum then summed over the <= |segments|*bands strata
        F.sum(
            F.when(
                m == 1,
                F.round(
                    F.col("nt").cast("double")
                    * (
                        F.col("syt").cast("double") / F.col("nt").cast("double")
                        - F.col("syc").cast("double") / F.col("nc").cast("double")
                    ),
                    6,
                ).cast("decimal(38,6)"),
            ).otherwise(F.lit(0).cast("decimal(38,6)"))
        ).alias("_att_num"),
    )
    return tot.select(
        "n_treated",
        "n_control",
        "n_strata_matched",
        "treated_matched",
        F.round(
            F.col("syt_all").cast("double") / F.col("n_treated").cast("double")
            - F.col("syc_all").cast("double") / F.col("n_control").cast("double"),
            6,
        ).alias("naive_diff"),
        F.when(
            F.col("treated_matched") > 0,
            F.round(
                F.col("_att_num").cast("double")
                / F.col("treated_matched").cast("double"),
                6,
            ),
        ).alias("att"),
    )


def cem_att_sql() -> str:
    return f"""
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS y
  FROM orders GROUP BY 1
),
units AS (
  SELECT CASE WHEN r.r_name = '{CEM_TREATED_REGION}' THEN 1 ELSE 0 END AS tr,
         c.c_mktsegment,
         CAST(CAST(c.c_acctbal AS DECIMAL(14,2)) AS DOUBLE) AS bal,
         CAST(COALESCE(o.y, 0) AS BIGINT) AS y
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  LEFT JOIN per_cust o ON c.c_custkey = o.o_custkey
),
mm AS (SELECT MIN(bal) AS mn, MAX(bal) AS mx FROM units),
strata AS (
  SELECT c_mktsegment,
         LEAST(CAST(floor((bal - mn) / GREATEST((mx - mn) / {CEM_BANDS}.0, 1e-12))
                    AS INTEGER), {CEM_BANDS} - 1) AS band,
         CAST(SUM(tr) AS BIGINT) AS nt,
         CAST(SUM(1 - tr) AS BIGINT) AS nc,
         CAST(SUM(CASE WHEN tr = 1 THEN y ELSE 0 END) AS BIGINT) AS syt,
         CAST(SUM(CASE WHEN tr = 0 THEN y ELSE 0 END) AS BIGINT) AS syc
  FROM units CROSS JOIN mm
  GROUP BY 1, 2
),
tot AS (
  SELECT CAST(SUM(nt) AS BIGINT) AS n_treated,
         CAST(SUM(nc) AS BIGINT) AS n_control,
         CAST(SUM(CASE WHEN nt > 0 AND nc > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_strata_matched,
         CAST(SUM(CASE WHEN nt > 0 AND nc > 0 THEN nt ELSE 0 END) AS BIGINT)
           AS treated_matched,
         CAST(SUM(syt) AS BIGINT) AS syt_all,
         CAST(SUM(syc) AS BIGINT) AS syc_all,
         SUM(CASE WHEN nt > 0 AND nc > 0
                  THEN CAST(round(nt * (CAST(syt AS DOUBLE) / nt
                                        - CAST(syc AS DOUBLE) / nc), 6)
                            AS DECIMAL(38,6))
                  ELSE CAST(0 AS DECIMAL(38,6)) END) AS att_num
  FROM strata
)
SELECT n_treated, n_control, n_strata_matched, treated_matched,
       round(CAST(syt_all AS DOUBLE) / n_treated
             - CAST(syc_all AS DOUBLE) / n_control, 6) AS naive_diff,
       CASE WHEN treated_matched > 0
            THEN round(CAST(att_num AS DOUBLE) / treated_matched, 6)
       END AS att
FROM tot
"""
