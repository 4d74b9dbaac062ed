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


# --- CUSUM level-shift detection (r5) ---------------------------------------
# The z-score battery above flags single outlier DAYS; CUSUM flags
# sustained LEVEL SHIFTS (a step change spread over many unremarkable
# days — the failure z-scores structurally miss). The sequential
# recursion s_t = max(0, s_{t-1} + d_t) has the classic prefix closed
# form s_t = P_t − min_{j≤t} P_j with P_t = Σ_{i≤t} d_i, so the whole
# detector is two windows (prefix sum + running min) — no recursion, no
# UDF. Everything runs in integer 10^-4-currency
# units (the revenue expression's native scale — NO rounding cast
# anywhere, a ×100 'cents' version rounds and diverged between engines
# at sf0.01), so the statistic is bit-identical on any engine/layout.
CUSUM_TOP = 20


def revenue_cusum_shifts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(region, day, cusum_scaled, day_revenue): top-20 days by the
    upward CUSUM statistic of daily revenue per region — the sustained
    level-shift detector. cusum_scaled is in 10^-4-currency·n_days units
    (deviation from the region's floor-average day, accumulated).

    Scale: one (region, day) pre-aggregate shuffle, then two
    region-partitioned date-ordered windows over ~date-range-sized
    partitions; the final top-k is TakeOrdered. Nothing global.
    int64 headroom: prefix sums reach ~2·10^15 at sf0.1 and grow as
    revenue·days² — past ~10^18 the d/p columns promote to
    DECIMAL(38,0), the pagerank rule.
    """
    li = typed_table(spark, sf_dir, "lineitem")
    orders = typed_table(spark, sf_dir, "orders")
    cust = typed_table(spark, sf_dir, "customer")
    nation = typed_table(spark, sf_dir, "nation")
    region = typed_table(spark, sf_dir, "region")
    daily = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.date_trunc("day", "o_orderdate").alias("day"),
        )
        .agg(
            (F.sum(F.expr("l_extendedprice * (1 - l_discount)")) * 10000)
            .cast("decimal(38,0)")
            .cast("bigint")
            .alias("cents")
        )
    )
    wreg = Window.partitionBy("region")
    word = wreg.orderBy("day")
    stats = daily.select(
        "region",
        "day",
        "cents",
        F.count(F.lit(1)).over(wreg).alias("n"),
        F.sum("cents").over(wreg).alias("total"),
    )
    # d_t in cents·n units: x_t·n − total (zero-mean by construction)
    dev = stats.select(
        "region",
        "day",
        "cents",
        (F.col("cents") * F.col("n") - F.col("total")).alias("d"),
    )
    prefixed = dev.select(
        "region",
        "day",
        "cents",
        F.sum("d").over(word.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("p"),
    )
    cusum = prefixed.select(
        "region",
        "day",
        "cents",
        (
            F.col("p")
            - F.least(
                F.lit(0).cast("bigint"),
                F.min("p").over(
                    word.rowsBetween(Window.unboundedPreceding, -1)
                ),
            )
        ).alias("cusum_scaled"),
    )
    return (
        cusum.select(
            "region",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "cusum_scaled",
            (F.col("cents").cast("double") / 10000).alias("day_revenue"),
        )
        .orderBy(F.col("cusum_scaled").desc(), "region", "day")
        .limit(CUSUM_TOP)
    )


REVENUE_CUSUM_SQL = f"""
WITH daily AS (
  SELECT r.r_name AS region, date_trunc('day', o.o_orderdate) AS day,
         CAST(CAST(SUM(l.l_extendedprice * (1 - l.l_discount)) * 10000
              AS DECIMAL(38,0)) AS BIGINT) AS cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
),
stats AS (
  SELECT region, day, cents,
         COUNT(*) OVER (PARTITION BY region) AS n,
         SUM(cents) OVER (PARTITION BY region) AS total
  FROM daily
),
dev AS (
  SELECT region, day, cents, cents * n - total AS d FROM stats
),
prefixed AS (
  SELECT region, day, cents,
         SUM(d) OVER (PARTITION BY region ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS p
  FROM dev
),
cusum AS (
  SELECT region, day, cents,
         p - least(CAST(0 AS BIGINT),
                   MIN(p) OVER (PARTITION BY region ORDER BY day
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
           AS cusum_scaled
  FROM prefixed
)
SELECT region, strftime(day, '%Y-%m-%d') AS day,
       CAST(cusum_scaled AS BIGINT) AS cusum_scaled,
       CAST(cents AS DOUBLE) / 10000 AS day_revenue
FROM cusum
ORDER BY cusum_scaled DESC, region, day
LIMIT {CUSUM_TOP}
"""


# --- MAD robust outliers (r5) -----------------------------------------------
# The z-battery's mean/σ are themselves dragged by the outliers they
# hunt (masking); the robust version scores against the MEDIAN and the
# median-absolute-deviation. Both medians are EXACT lower order
# statistics (rank (n−1) div 2 + 1 under a total order) over integer
# 10^-4-currency units — two ranked windows, zero float math until the
# final report columns. Flag rule in pure integers: a day is an outlier
# iff |x − med| · 10^4 > MAD_K_SCALED · mad, with MAD_K_SCALED =
# 3·1.4826·10^4 (the normal-consistency constant, pre-scaled so the
# comparison never touches a double).
MAD_K_SCALED = 44478  # 3 × 1.4826 × 10^4


def mad_outlier_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(month, n_days, median_revenue, mad_revenue, n_outliers): per
    month, the robust spread and how many days breach the 3-MAD fence.

    Plan: the daily pre-aggregate shuffle, then two month-partitioned
    ranked windows (≤31-row partitions): one picks the month median,
    one the median of |x − med|. Exact integers end-to-end; the two
    report columns divide by 10^4 at the very end (exact in double at
    these magnitudes)."""
    li = typed_table(spark, sf_dir, "lineitem")
    orders = typed_table(spark, sf_dir, "orders")
    daily = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            (F.sum(F.expr(_REV)) * 10000)
            .cast("decimal(38,0)")
            .cast("bigint")
            .alias("x")
        )
        .withColumn("month", F.date_format("day", "yyyy-MM"))
    )
    wm = Window.partitionBy("month")
    r1 = daily.select(
        "month",
        "day",
        "x",
        F.row_number().over(wm.orderBy("x", "day")).alias("rk"),
        F.count(F.lit(1)).over(wm).alias("n"),
    )
    med = (
        r1.filter(F.expr("rk = (n - 1) div 2 + 1"))
        .select("month", F.col("x").alias("med"))
    )
    dev = daily.join(F.broadcast(med), "month").select(
        "month", "day", "x", "med", F.abs(F.col("x") - F.col("med")).alias("ad")
    )
    r2 = dev.select(
        "month",
        "ad",
        F.row_number().over(wm.orderBy("ad", "day")).alias("rk"),
        F.count(F.lit(1)).over(wm).alias("n"),
    )
    mad = (
        r2.filter(F.expr("rk = (n - 1) div 2 + 1"))
        .select("month", F.col("ad").alias("mad"))
    )
    flagged = dev.join(F.broadcast(mad), "month").groupBy(
        "month", "med", "mad"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(
            F.when(
                F.col("ad") * 10000 > F.lit(MAD_K_SCALED) * F.col("mad"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_outliers"),
    )
    return flagged.select(
        "month",
        "n_days",
        (F.col("med").cast("double") / 10000).alias("median_revenue"),
        (F.col("mad").cast("double") / 10000).alias("mad_revenue"),
        "n_outliers",
    )


MAD_OUTLIER_SQL = f"""
WITH daily AS (
  SELECT o.o_orderdate AS day,
         CAST(CAST(SUM({_REV}) * 10000 AS DECIMAL(38,0)) AS BIGINT) AS x,
         strftime(o.o_orderdate, '%Y-%m') AS month
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 3
),
r1 AS (
  SELECT month, day, x,
         row_number() OVER (PARTITION BY month ORDER BY x, day) AS rk,
         COUNT(*) OVER (PARTITION BY month) AS n
  FROM daily
),
med AS (SELECT month, x AS med FROM r1 WHERE rk = (n - 1) // 2 + 1),
dev AS (
  SELECT d.month, d.day, d.x, m.med, abs(d.x - m.med) AS ad
  FROM daily d JOIN med m USING (month)
),
r2 AS (
  SELECT month, ad,
         row_number() OVER (PARTITION BY month ORDER BY ad, day) AS rk,
         COUNT(*) OVER (PARTITION BY month) AS n
  FROM dev
),
mad AS (SELECT month, ad AS mad FROM r2 WHERE rk = (n - 1) // 2 + 1)
SELECT v.month,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(MAX(v.med) AS DOUBLE) / 10000 AS median_revenue,
       CAST(MAX(md.mad) AS DOUBLE) / 10000 AS mad_revenue,
       CAST(SUM(CASE WHEN v.ad * 10000 > {MAD_K_SCALED} * md.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev v JOIN mad md USING (month)
GROUP BY v.month
"""


# --- autocorrelation of daily revenue --------------------------------------
#
# The seasonality detector the CUSUM/MAD battery lacks: ACF(lag) is the
# Pearson correlation of day-t revenue against day-(t+lag) revenue over
# all observed day pairs. Lag 1 reads momentum, lag 7 the weekly cycle,
# lag 28 the ~monthly cycle. The day pairing is a self-join on the
# INTEGER day index (epoch datediff — no engine date arithmetic), the
# daily series is exact ×10⁴ integers (the CUSUM scaling: revenue has 4
# decimal places so ×10⁴ is exact where ×100 would round), sufficient
# statistics are exact DECIMAL sums, and the float appears only in the
# final assembled ratio (trend-slope discipline, round 6).

ACF_LAGS = [1, 7, 28]
_ACF_EPOCH = "1992-01-01"


def revenue_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lag, n_pairs, acf): autocorrelation of global daily revenue at
    lags 1/7/28 days over observed-day pairs.

    Scale: ONE fact-side shuffle builds the ~|date-range|-row daily
    series; the lag self-joins and sufficient-statistics aggregates all
    run on that tiny frame (broadcast). Nothing else touches the fact."""
    li = typed_table(spark, sf_dir, "lineitem")
    orders = typed_table(spark, sf_dir, "orders")
    daily = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.datediff(
                F.date_trunc("day", "o_orderdate"), F.lit(_ACF_EPOCH).cast("date")
            )
            .cast("bigint")
            .alias("x")
        )
        .agg(
            (F.sum(F.expr(_REV)) * 10000)
            .cast("decimal(38,0)")
            .cast("decimal(19,0)")
            .alias("v")
        )
        .localCheckpoint(eager=False)
    )
    out = None
    for lag in ACF_LAGS:
        a = daily.select(F.col("x"), F.col("v").alias("va"))
        b = daily.select((F.col("x") - lag).alias("x"), F.col("v").alias("vb"))
        pairs = a.join(F.broadcast(b), "x")
        stats = pairs.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("va").cast("decimal(38,0)").alias("sa"),
            F.sum("vb").cast("decimal(38,0)").alias("sb"),
            F.sum(F.col("va") * F.col("va")).cast("decimal(38,0)").alias("ssa"),
            F.sum(F.col("vb") * F.col("vb")).cast("decimal(38,0)").alias("ssb"),
            F.sum(F.col("va") * F.col("vb")).cast("decimal(38,0)").alias("sab"),
        )
        n = F.col("n_pairs").cast("double")
        sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
        va = n * F.col("ssa").cast("double") - sa * sa
        vb = n * F.col("ssb").cast("double") - sb * sb
        cov = n * F.col("sab").cast("double") - sa * sb
        row = stats.select(
            F.lit(lag).cast("int").alias("lag"),
            "n_pairs",
            F.when((va > 0) & (vb > 0), F.round(cov / F.sqrt(va * vb), 6)).alias(
                "acf"
            ),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("lag")


def revenue_acf_sql() -> str:
    per_lag = []
    for lag in ACF_LAGS:
        per_lag.append(
            f"""
SELECT CAST({lag} AS INTEGER) AS lag, n_pairs,
       CASE WHEN (CAST(n_pairs AS DOUBLE) * CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) > 0
             AND (CAST(n_pairs AS DOUBLE) * CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) > 0
            THEN round((CAST(n_pairs AS DOUBLE) * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                       / sqrt((CAST(n_pairs AS DOUBLE) * CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                            * (CAST(n_pairs AS DOUBLE) * CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6)
       END AS acf
FROM (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(a.v) AS DECIMAL(38,0)) AS sa,
         CAST(SUM(b.v) AS DECIMAL(38,0)) AS sb,
         CAST(SUM(a.v * a.v) AS DECIMAL(38,0)) AS ssa,
         CAST(SUM(b.v * b.v) AS DECIMAL(38,0)) AS ssb,
         CAST(SUM(a.v * b.v) AS DECIMAL(38,0)) AS sab
  FROM daily a JOIN daily b ON b.x = a.x + {lag}
)"""
        )
    union = "\nUNION ALL\n".join(per_lag)
    return f"""
WITH daily AS MATERIALIZED (
  SELECT CAST(datediff('day', DATE '{_ACF_EPOCH}', CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
         CAST(CAST(SUM({_REV}) * 10000 AS DECIMAL(38,0)) AS DECIMAL(19,0)) AS v
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1
)
{union}
ORDER BY lag
"""


# --- EWMA control chart ---------------------------------------------------------
#
# Fourth member of the anomaly battery, covering the gap between the
# z-battery (point spikes vs a static mean), MAD (robust point spikes)
# and CUSUM (accumulated level shifts): an EWMA chart scores each day
# against a RECENCY-WEIGHTED local forecast, so it flags days that are
# abnormal relative to the last ~week even when the global statistics
# have drifted. The smoother is the dyadic 8-term EWMA (weights
# 2^(8-k) / 255 — exact integer floor, the trending/ses trick), lags
# resolved by gap-proof day-index equi-joins, and the alarm fence is
# the MAD battery's 3·1.4826 rule applied to the residual distribution
# (exact order statistics on integer residuals).
#
# Scale: corpus touched once by the daily rollup; the 8 lag joins and
# the residual-median machinery run on the ~date-range-sized series.

EWMA_TERMS_CC = 8


def ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, revenue, ewma_prev, resid, is_alarm): top-15 days by
    absolute residual vs the prior-8-day dyadic EWMA, alarm = residual
    beyond 3·1.4826·MAD of all residuals."""
    li = typed_table(spark, sf_dir, "lineitem")
    orders = typed_table(spark, sf_dir, "orders")
    daily = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            (F.sum(F.expr("l_extendedprice * (1 - l_discount)")) * 10000)
            .cast("decimal(38,0)")
            .cast("bigint")
            .alias("x")
        )
        .select(
            F.datediff("day", F.lit("1992-01-01").cast("date"))
            .cast("bigint")
            .alias("i"),
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "x",
        )
        .localCheckpoint(eager=False)
    )
    base = daily
    for k in range(1, EWMA_TERMS_CC + 1):
        base = base.join(
            F.broadcast(
                daily.select(
                    (F.col("i") + k).alias("i"), F.col("x").alias(f"x{k}")
                )
            ),
            "i",
        )
    num = " + ".join(
        f"x{k} * {1 << (EWMA_TERMS_CC - k)}" for k in range(1, EWMA_TERMS_CC + 1)
    )
    den = (1 << EWMA_TERMS_CC) - 1
    scored = base.select(
        "day",
        "x",
        F.expr(f"((({num}) - pmod(({num}), {den})) div {den})").alias("e"),
    ).select(
        "day", "x", "e", (F.col("x") - F.col("e")).alias("r")
    ).localCheckpoint(eager=False)
    # MAD of residuals via exact order statistics (histogram form)
    absr = scored.select(F.abs("r").alias("a"))
    ha = absr.groupBy("a").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    wa = Window.orderBy("a").rowsBetween(Window.unboundedPreceding, 0)
    n = absr.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    # median of |r - med(r)| is the classic MAD; for a control chart the
    # median residual is ~0 by construction, so MAD on |r| (about 0) is
    # the standard one-sided simplification — documented, used on BOTH
    # engines identically
    med = (
        ha.select("a", "cnt", F.sum("cnt").over(wa).alias("cum"))
        .crossJoin(F.broadcast(n))
        .filter(
            (F.col("cum") - F.col("cnt") < F.expr("((n - 1) div 2) + 1"))
            & (F.col("cum") >= F.expr("((n - 1) div 2) + 1"))
        )
        .select(F.col("a").alias("mad"))
    )
    return (
        scored.crossJoin(F.broadcast(med))
        .select(
            "day",
            F.round(F.col("x") / 1e4, 6).alias("revenue"),
            F.round(F.col("e") / 1e4, 6).alias("ewma_prev"),
            F.round(F.col("r") / 1e4, 6).alias("resid"),
            (
                F.abs(F.col("r")) * 10000
                > F.lit(MAD_K_SCALED) * F.col("mad")
            ).alias("is_alarm"),
            F.abs("r").alias("_absr"),
        )
        .orderBy(F.col("_absr").desc(), "day")
        .limit(15)
        .drop("_absr")
    )


def ewma_control_chart_sql() -> str:
    num = " + ".join(
        f"l{k}.x * {1 << (EWMA_TERMS_CC - k)}"
        for k in range(1, EWMA_TERMS_CC + 1)
    )
    den = (1 << EWMA_TERMS_CC) - 1
    lag_joins = "\n".join(
        f"  JOIN daily l{k} ON l{k}.i = d.i - {k}"
        for k in range(1, EWMA_TERMS_CC + 1)
    )
    return f"""
WITH daily AS MATERIALIZED (
  SELECT CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS i,
         strftime(o_orderdate, '%Y-%m-%d') AS day,
         CAST(CAST(SUM(l_extendedprice * (1 - l_discount)) * 10000
              AS DECIMAL(38,0)) AS BIGINT) AS x
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
scored AS MATERIALIZED (
  SELECT d.day, d.x,
         (({num}) - ((({num}) % {den} + {den}) % {den})) // {den} AS e,
         d.x - (({num}) - ((({num}) % {den} + {den}) % {den})) // {den} AS r
  FROM daily d
{lag_joins}
),
ha AS (
  SELECT abs(r) AS a, CAST(COUNT(*) AS BIGINT) AS cnt FROM scored GROUP BY 1
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM scored),
med AS (
  SELECT a AS mad FROM (
    SELECT a, cnt, SUM(cnt) OVER (ORDER BY a) AS cum FROM ha), nn
  WHERE cum - cnt < ((n - 1) // 2) + 1 AND cum >= ((n - 1) // 2) + 1
)
SELECT day,
       round(CAST(x AS DOUBLE) / 1e4, 6) AS revenue,
       round(CAST(e AS DOUBLE) / 1e4, 6) AS ewma_prev,
       round(CAST(r AS DOUBLE) / 1e4, 6) AS resid,
       abs(r) * 10000 > {MAD_K_SCALED} * mad AS is_alarm
FROM scored, med
ORDER BY abs(r) DESC, day
LIMIT 15
"""
