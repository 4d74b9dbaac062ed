"""Per-entity time-series feature operators over the events stream.

Extension family (SURVEY §2.13 has no reference counterpart): the
feature-engineering shapes a training pipeline derives from raw event
logs — rolling-window aggregates, bounded-lag EWMA, and hourly
resampling with forward fill. All expressed with built-in window
functions on ONE shuffle per query (partitionBy user_id), no UDFs.

Scale notes (100 TB): every window here partitions by ``user_id`` —
state per task is bounded by one user's history slice, never global.
The rolling frames are ROWS-bounded (constant memory per row); the
EWMA is deliberately a *bounded-lag* (8-term) approximation so it
stays a fixed-size expression instead of an unbounded recursive scan —
the exact recursive EWMA is not partial-aggregable and would force a
sequential pass per user; 8 halving terms reproduce the true EWMA to
2^-8 relative error, exactly, in decimal arithmetic, on any partition
layout. The gap-fill grid is generated per user between that user's
own min/max active hour (``sequence`` + ``explode``), so fan-out is
bounded by span, and the fill is `last(ignorenulls)` over the same
user partition — one shuffle end-to-end.

Money-math contract: values go through DECIMAL(14,2) before any sum
(CLAUDE.md invariant), doubles only in the final projection; second
deltas use integer µs division (`div`), never float division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import typed_table

ROLL_ROWS = 5  # rolling frame: current row + 4 preceding
EWMA_TERMS = 8  # bounded-lag EWMA depth (2^-8 tail truncation)
GAPFILL_DAYS = 7  # resample slice: first week of the stream


def _vdec():
    return F.col("value").cast("decimal(14,2)")


def rolling_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event rolling features: 5-row sum/avg, lag delta, inter-arrival secs, EWMA-8.

    One shuffle (user_id), one sort (ts, event_id — event_id breaks ts
    ties for a total order), every frame ROWS-bounded.
    """
    ev = typed_table(spark, sf_dir, "events").withColumn(
        "us", F.expr("unix_micros(ts)")
    )
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = order.rowsBetween(-(ROLL_ROWS - 1), 0)
    roll_sum = F.sum(_vdec()).over(frame)
    roll_n = F.count(F.lit(1)).over(frame)
    prev_v = F.lag(_vdec()).over(order)
    prev_us = F.lag("us").over(order)
    # EWMA-8: sum_{k=0..7} value[i-k] * 2^-(k+1), absent lags contribute 0.
    # Weights are exact DECIMAL(12,8) halvings — partial sums exact, so the
    # result is identical on any partitioning.
    ewma = None
    for k in range(EWMA_TERMS):
        w = F.lit(0.5 ** (k + 1)).cast("decimal(12,8)")
        term = F.coalesce(F.lag(_vdec(), k).over(order), F.lit(0).cast("decimal(14,2)")) * w
        ewma = term if ewma is None else ewma + term
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        roll_sum.cast("double").alias("roll_sum_5"),
        roll_n.alias("roll_n_5"),
        (roll_sum.cast("double") / roll_n).alias("roll_avg_5"),
        (_vdec() - prev_v).cast("double").alias("delta_prev"),
        F.expr("(us - lag(us) over (partition by user_id order by ts, event_id)) div 1000000").alias(
            "secs_since_prev"
        ),
        ewma.cast("double").alias("ewma8"),
    )


def rolling_user_features_sql() -> str:
    terms = " + ".join(
        "COALESCE(LAG(v, %d) OVER wo, CAST(0 AS DECIMAL(14,2))) * CAST(%.8f AS DECIMAL(12,8))"
        % (k, 0.5 ** (k + 1))
        for k in range(EWMA_TERMS)
    )
    return f"""
WITH ev AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
         CAST(value AS DECIMAL(14,2)) AS v,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       CAST(SUM(v) OVER w5 AS DOUBLE) AS roll_sum_5,
       COUNT(*) OVER w5 AS roll_n_5,
       CAST(SUM(v) OVER w5 AS DOUBLE) / COUNT(*) OVER w5 AS roll_avg_5,
       CAST(v - LAG(v) OVER wo AS DOUBLE) AS delta_prev,
       (us - LAG(us) OVER wo) // 1000000 AS secs_since_prev,
       CAST({terms} AS DOUBLE) AS ewma8
FROM ev
WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id),
       w5 AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN {ROLL_ROWS - 1} PRECEDING AND CURRENT ROW)
"""


def gapfill_user_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample per user over the stream's first week, forward-filled.

    Grid = ``sequence(user_min_hour, user_max_hour, 1 hour)`` exploded per
    user (fan-out bounded by a user's active span, ≤168 rows/user for the
    week slice), left-joined to the per-hour aggregate, then
    ``last(value, ignorenulls)`` forward fill over the user partition.
    The week slice is anchored to the GLOBAL min ts via a 1-row aggregate
    cross join (broadcast — the G2 scalar-subquery pattern), not a literal,
    so it tracks driver testdata regeneration.
    """
    ev = typed_table(spark, sf_dir, "events")
    anchor = ev.agg(F.date_trunc("hour", F.min("ts")).alias("t0"))
    sliced = (
        ev.crossJoin(F.broadcast(anchor))
        .where(F.col("ts") < F.col("t0") + F.expr(f"INTERVAL {GAPFILL_DAYS} DAYS"))
        .withColumn("hour", F.date_trunc("hour", "ts"))
    )
    # last event per (user, hour): max(struct) — hash-aggregable, deterministic
    hourly = sliced.groupBy("user_id", "hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.struct("ts", "event_id", _vdec().alias("v"))).alias("last_ev"),
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    fill_w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = grid.join(hourly, ["user_id", "hour"], "left")
    return joined.select(
        "user_id",
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour_s"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last(F.col("last_ev.v"), ignorenulls=True).over(fill_w).cast("double").alias("filled_value"),
        F.col("n_events").isNull().alias("is_gap"),
    )


GAPFILL_SQL = f"""
WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
         CAST(value AS DECIMAL(14,2)) AS v
  FROM events
),
anchor AS (SELECT date_trunc('hour', MIN(ts)) AS t0 FROM ev),
sliced AS (
  SELECT ev.*, date_trunc('hour', ts) AS hour
  FROM ev, anchor WHERE ts < t0 + INTERVAL {GAPFILL_DAYS} DAYS
),
ranked AS (
  SELECT user_id, hour, v,
         ROW_NUMBER() OVER (PARTITION BY user_id, hour
                            ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id, hour) AS n_in_hour
  FROM sliced
),
hourly AS (
  SELECT user_id, hour, n_in_hour AS n_events, v AS last_v
  FROM ranked WHERE rn = 1
),
spans AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM spans
)
SELECT g.user_id,
       strftime(g.hour, '%Y-%m-%d %H:%M:%S') AS hour_s,
       COALESCE(h.n_events, 0) AS n_events,
       CAST(last_value(h.last_v IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS filled_value,
       h.n_events IS NULL AS is_gap
FROM grid g LEFT JOIN hourly h USING (user_id, hour)
"""


# --- Forecast backtest --------------------------------------------------------
#
# The model-selection harness a forecasting pipeline runs before
# trusting any method: walk forward over the monthly revenue series and
# score each candidate on the months it did NOT see. Three standard
# baselines (naive = last month, seasonal-naive = same month last year,
# drift = last month + the mean 12-month step) — every production
# forecast must beat these or it ships nothing.
#
# Exactness: monthly revenue is integer cents; the drift step and the
# per-month absolute-percentage errors are exact floor divisions
# (pmod identity), so MAPE/bias come from pure-integer sums with one
# final round-6 division. Lags are resolved by IDX EQUI-JOINS, not
# window lag(): lag(12) silently reads the 12th PRIOR ROW, which is
# only "a year ago" if no month is missing — the join form is
# gap-proof and identical on both engines.
#
# Scale: one partial-aggregable (region, month) rollup touches the
# corpus; everything after runs on the ~|regions × months| series
# frame. Walk-forward length adds rows to the series joins, never
# corpus passes.

FC_SCALE = 1_000_000  # APE fixed point: 1e-6


def forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(region, method, n_months, mape, bias): walk-forward backtest of
    naive / seasonal-naive / drift monthly revenue forecasts."""
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
            F.col("r_name").alias("region"),
            (
                (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate")
            )
            .cast("bigint")
            .alias("idx"),
        )
        .agg(
            (F.sum(F.expr("l_extendedprice * (1 - l_discount)")) * 100)
            .cast("decimal(38,0)")
            .cast("bigint")
            .alias("y")
        )
        .localCheckpoint(eager=False)  # tiny series frame, joined 4 ways
    )

    def lagged(k: int, name: str):
        return monthly.select(
            "region",
            (F.col("idx") + k).alias("idx"),
            F.col("y").alias(name),
        )

    base = monthly.join(F.broadcast(lagged(1, "y1")), ["region", "idx"])
    for k in range(2, 9):
        base = base.join(F.broadcast(lagged(k, f"y{k}")), ["region", "idx"])
    base = (
        base.join(F.broadcast(lagged(12, "y12")), ["region", "idx"])
        .join(F.broadcast(lagged(13, "y13")), ["region", "idx"])
        .filter(F.col("y") > 0)
    )
    fc = base.select(
        "region",
        "y",
        F.explode(
            F.array(
                F.struct(
                    F.lit("naive").alias("method"), F.col("y1").alias("yhat")
                ),
                F.struct(
                    F.lit("seasonal_naive").alias("method"),
                    F.col("y12").alias("yhat"),
                ),
                F.struct(
                    F.lit("drift").alias("method"),
                    (
                        F.col("y1")
                        + F.expr(
                            "((y1 - y13) - pmod(y1 - y13, 12)) div 12"
                        )
                    ).alias("yhat"),
                ),
                # ses: bounded-lag dyadic EWMA (alpha = 1/2, 8 terms,
                # weights 2^(8-k) summing to 255 — the rolling-features
                # trick applied to forecasting); exact integer floor
                F.struct(
                    F.lit("ses").alias("method"),
                    F.expr(
                        "(((y1 * 128 + y2 * 64 + y3 * 32 + y4 * 16 + y5 * 8 + y6 * 4 + y7 * 2 + y8 * 1) - pmod((y1 * 128 + y2 * 64 + y3 * 32 + y4 * 16 + y5 * 8 + y6 * 4 + y7 * 2 + y8 * 1), 255)) div 255)"
                    ).alias("yhat"),
                ),
            )
        ).alias("f"),
    ).select(
        "region",
        F.col("f.method").alias("method"),
        "y",
        F.col("f.yhat").alias("yhat"),
    )
    scored = fc.select(
        "region",
        "method",
        "y",
        # pmod's divisor must be guarded IN-CASE, not by the upstream
        # filter(y > 0): ANSI Catalyst may evaluate a projected
        # expression before the filter it sits behind (CLAUDE.md;
        # the xb−xa REMAINDER_BY_ZERO precedent). Values are identical
        # — every surviving row has y > 0 — the CASE only makes the
        # guard reorder-proof. Mirrored in the oracle SQL.
        F.expr(
            f"CASE WHEN y > 0 THEN (abs(y - yhat) * {FC_SCALE}"
            f" - pmod(abs(y - yhat) * {FC_SCALE}, y)) div y END"
        ).alias("ape6"),
        (F.col("yhat") - F.col("y")).alias("err"),
    )
    return (
        scored.groupBy("region", "method")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_months"),
            F.sum("ape6").cast("bigint").alias("sum_ape6"),
            F.sum("err").cast("bigint").alias("sum_err"),
            F.sum("y").cast("bigint").alias("sum_y"),
        )
        .select(
            "region",
            "method",
            "n_months",
            F.round(
                F.col("sum_ape6")
                / (F.lit(float(FC_SCALE)) * F.col("n_months")),
                6,
            ).alias("mape"),
            F.round(F.col("sum_err") / F.col("sum_y").cast("double"), 6).alias(
                "bias"
            ),
        )
        .orderBy("region", "method")
    )


FORECAST_BACKTEST_SQL = f"""
WITH monthly AS (
  SELECT r_name AS region,
         CAST((EXTRACT(year FROM o_orderdate) - 1995) * 12
              + EXTRACT(month FROM o_orderdate) AS BIGINT) AS idx,
         CAST(CAST(SUM(l_extendedprice * (1 - l_discount)) * 100
              AS DECIMAL(38,0)) AS BIGINT) AS y
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY 1, 2
),
base AS (
  SELECT m.region, m.y, a.y AS y1, l2.y AS y2, l3.y AS y3, l4.y AS y4, l5.y AS y5, l6.y AS y6, l7.y AS y7, l8.y AS y8,
         b.y AS y12, c.y AS y13
  FROM monthly m
  JOIN monthly a ON a.region = m.region AND a.idx = m.idx - 1
  JOIN monthly l2 ON l2.region = m.region AND l2.idx = m.idx - 2
  JOIN monthly l3 ON l3.region = m.region AND l3.idx = m.idx - 3
  JOIN monthly l4 ON l4.region = m.region AND l4.idx = m.idx - 4
  JOIN monthly l5 ON l5.region = m.region AND l5.idx = m.idx - 5
  JOIN monthly l6 ON l6.region = m.region AND l6.idx = m.idx - 6
  JOIN monthly l7 ON l7.region = m.region AND l7.idx = m.idx - 7
  JOIN monthly l8 ON l8.region = m.region AND l8.idx = m.idx - 8
  JOIN monthly b ON b.region = m.region AND b.idx = m.idx - 12
  JOIN monthly c ON c.region = m.region AND c.idx = m.idx - 13
  WHERE m.y > 0
),
fc AS (
  SELECT region, y, 'naive' AS method, y1 AS yhat FROM base
  UNION ALL
  SELECT region, y, 'seasonal_naive', y12 FROM base
  UNION ALL
  SELECT region, y, 'drift',
         y1 + ((y1 - y13) - ((((y1 - y13) % 12) + 12) % 12)) // 12
  FROM base
  UNION ALL
  SELECT region, y, 'ses',
         ((y1 * 128 + y2 * 64 + y3 * 32 + y4 * 16 + y5 * 8 + y6 * 4 + y7 * 2 + y8 * 1) - ((((y1 * 128 + y2 * 64 + y3 * 32 + y4 * 16 + y5 * 8 + y6 * 4 + y7 * 2 + y8 * 1) % 255) + 255) % 255)) // 255
  FROM base
),
scored AS (
  SELECT region, method, y,
         CASE WHEN y > 0 THEN (abs(y - yhat) * {FC_SCALE}
          - ((((abs(y - yhat) * {FC_SCALE}) % y) + y) % y)) // y END AS ape6,
         yhat - y AS err
  FROM fc
)
SELECT region, method,
       CAST(COUNT(*) AS BIGINT) AS n_months,
       round(CAST(SUM(ape6) AS DOUBLE) / ({FC_SCALE}.0 * COUNT(*)), 6) AS mape,
       round(CAST(SUM(err) AS DOUBLE) / SUM(y), 6) AS bias
FROM scored
GROUP BY region, method
ORDER BY region, method
"""


# --- Quantile-forecast pinball backtest ---------------------------------------
#
# forecast_backtest scores POINT forecasts; production demand/capacity
# planning ships QUANTILE forecasts, and the proper scoring rule for a
# q-quantile is the pinball loss L_q(y, f) = max(q·(y−f), (q−1)·(y−f)).
# The forecaster here is the exact trailing-28-day empirical quantile
# (order statistic of the prior window — no model, the standard
# strong-baseline), evaluated walk-forward on the daily revenue series
# and aggregated per month.
#
# Exactness: daily revenue is the integer-cents rollup; the trailing
# quantile is element_at(sort_array(window list), ⌈q·28⌉) — an exact
# integer; pinball is evaluated on a ×10 grid (10q ∈ {5, 9}) so the
# loss is a BIGINT end-to-end and only the final monthly mean divides
# (round 6). Only days with a FULL 28-day history score.
#
# Scale: the corpus is touched once by the partial-aggregable daily
# rollup; the walk-forward windows run over the ~|days| dictionary
# (the revenue_cusum class), bounded ROWS frames of 28.

PINBALL_WINDOW = 28
PINBALL_QS = [5, 9]  # 10·q for q ∈ {0.5, 0.9}


def quantile_forecast_pinball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(month, q10, n_days, total_pinball_scaled, avg_pinball): monthly
    pinball loss of trailing-28-day empirical-quantile forecasts."""
    orders = typed_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum((F.col("o_totalprice") * 100).cast("bigint")).alias("rev_c")
    )
    wprev = (
        Window.orderBy("day").rowsBetween(-PINBALL_WINDOW, -1)
    )
    hist = daily.select(
        "day",
        "rev_c",
        F.sort_array(F.collect_list("rev_c").over(wprev)).alias("prior"),
    ).filter(F.size("prior") == PINBALL_WINDOW)
    rows = None
    for q10 in PINBALL_QS:
        idx = -(-q10 * PINBALL_WINDOW // 10)  # ceil(q·n), 1-indexed
        f = F.element_at("prior", idx)
        d = F.col("rev_c") - f
        loss = F.greatest(F.lit(q10) * d, (F.lit(q10) - 10) * d)
        r = hist.select(
            F.date_format("day", "yyyy-MM").alias("month"),
            F.lit(q10).alias("q10"),
            loss.cast("bigint").alias("pin"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return (
        rows.groupBy("month", "q10")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("pin").cast("bigint").alias("total_pinball_scaled"),
        )
        .select(
            "month",
            "q10",
            "n_days",
            "total_pinball_scaled",
            # ÷10 (grid) ÷100 (cents) ÷n — one rounded division
            F.round(
                F.col("total_pinball_scaled").cast("double")
                / (F.lit(1000.0) * F.col("n_days").cast("double")),
                6,
            ).alias("avg_pinball"),
        )
        .orderBy("month", "q10")
    )


def quantile_forecast_pinball_sql() -> str:
    arms = []
    for q10 in PINBALL_QS:
        idx = -(-q10 * PINBALL_WINDOW // 10)
        arms.append(
            f"SELECT month, {q10} AS q10,"
            f" GREATEST({q10} * (rev_c - prior[{idx}]),"
            f" ({q10} - 10) * (rev_c - prior[{idx}])) AS pin FROM hist"
        )
    arms_sql = "\nUNION ALL\n".join(arms)
    return f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
              AS BIGINT) AS rev_c
  FROM orders GROUP BY 1
),
hist AS (
  SELECT strftime(day, '%Y-%m') AS month, rev_c,
         list_sort(list(rev_c) OVER (ORDER BY day
           ROWS BETWEEN {PINBALL_WINDOW} PRECEDING AND 1 PRECEDING)) AS prior
  FROM daily
  QUALIFY len(prior) = {PINBALL_WINDOW}
),
pins AS (
  {arms_sql}
)
SELECT month, q10, CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(pin) AS BIGINT) AS total_pinball_scaled,
       round(CAST(SUM(pin) AS DOUBLE) / (1000.0 * COUNT(*)), 6) AS avg_pinball
FROM pins GROUP BY 1, 2 ORDER BY 1, 2
"""


# --- hierarchical forecast reconciliation (nation -> region, exact) ---------
# Forecasts made independently per level of a rollup hierarchy do not
# add up (the "incoherence" every planning pipeline hits); this operator
# measures that gap and produces a top-down reconciled set that IS
# coherent — to the cent — via the penny allocator's largest-remainder
# rule. Everything runs in integer cents: the drift forecast is
# y_last + (y_last - y_first) div (n-1) (both engines truncate integer
# division toward zero — verified), and the proportional allocation
# uses DECIMAL(38,0)/HUGEINT cross products (R * t_i overflows int64 at
# bench scale already), so every output cell is exact — no rounding,
# no float, bit-identical on any layout.


def forecast_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation drift forecasts vs the region-level forecast, plus the
    Hamilton-reconciled top-down set.

    Output (region, nation, hist_cents, fc_base_cents,
    fc_reconciled_cents, adj_cents): one row per nation (adj = base −
    reconciled) and one 'ALL' row per region where fc_base is the
    region's own drift forecast, fc_reconciled the clamped allocation
    total, and adj the INCOHERENCE (region forecast − sum of nation
    forecasts) the reconciliation removed.

    Scale design: the corpus is touched ONCE by the (region, nation,
    month) rollup (partial-aggregable); every later step runs on the
    ~|nations × months| series frame and |nations|-row allocation
    frames — broadcast joins and region-bounded windows (≤ |nations per
    region| rows). A negative region forecast is clamped to 0 before
    allocation (demand is non-negative; documented on both sides).
    """
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
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate"))
            .cast("bigint")
            .alias("idx"),
        )
        .agg(
            # explicit floor on BOTH sides: Spark's decimal(38,0) rescale
            # rounds HALF_UP while DuckDB's decimal->BIGINT cast rounds
            # differently at exact-tie cents (Benford-trap family) — floor
            # of a positive decimal is the one rounding both agree on
            F.floor(F.sum(F.expr("l_extendedprice * (1 - l_discount)")) * 100)
            .cast("bigint")
            .alias("y")
        )
        .localCheckpoint(eager=False)  # tiny series frame, joined 4 ways
    )

    def _drift(series: DataFrame, keys: list[str]) -> DataFrame:
        """keys + (hist_cents, fc_base_cents) via endpoint drift."""
        span = series.groupBy(*keys).agg(
            F.min("idx").alias("i0"),
            F.max("idx").alias("i1"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("hist_cents"),
        )
        e0 = series.select(*keys, F.col("idx").alias("i0"), F.col("y").alias("y0"))
        e1 = series.select(*keys, F.col("idx").alias("i1"), F.col("y").alias("y1"))
        return (
            span.join(F.broadcast(e0), [*keys, "i0"])
            .join(F.broadcast(e1), [*keys, "i1"])
            .select(
                *keys,
                "hist_cents",
                F.when(
                    F.col("n") > 1,
                    F.expr("y1 + (y1 - y0) div (n - 1)"),
                )
                .otherwise(F.col("y1"))
                .cast("bigint")
                .alias("fc_base_cents"),
            )
        )

    nat = _drift(monthly, ["region", "nation"]).localCheckpoint(eager=False)
    reg = _drift(
        monthly.groupBy("region", "idx").agg(F.sum("y").cast("bigint").alias("y")),
        ["region"],
    ).select(
        "region",
        F.col("hist_cents").alias("t_total"),
        F.col("fc_base_cents").alias("fc_region"),
        F.greatest(F.col("fc_base_cents"), F.lit(0))
        .cast("bigint")
        .alias("r_alloc"),
    )
    # Hamilton allocation of r_alloc over nation hist shares (exact:
    # sum(reconciled) == r_alloc by construction)
    alloc = (
        nat.join(F.broadcast(reg), "region")
        .withColumn(
            "fl",
            F.expr(
                "CAST((CAST(r_alloc AS DECIMAL(38,0)) * hist_cents)"
                " div t_total AS BIGINT)"
            ),
        )
        .withColumn(
            "rem",
            F.expr(
                "CAST((CAST(r_alloc AS DECIMAL(38,0)) * hist_cents)"
                " % t_total AS BIGINT)"
            ),
        )
    )
    w_left = Window.partitionBy("region")
    w_rank = Window.partitionBy("region").orderBy(
        F.col("rem").desc(), F.col("nation")
    )
    nat_rows = alloc.select(
        "region",
        "nation",
        "hist_cents",
        "fc_base_cents",
        (
            F.col("fl")
            + F.when(
                F.row_number().over(w_rank)
                <= (F.col("r_alloc") - F.sum("fl").over(w_left)),
                F.lit(1),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("fc_reconciled_cents"),
    ).withColumn(
        "adj_cents",
        (F.col("fc_base_cents") - F.col("fc_reconciled_cents")).cast("bigint"),
    )
    reg_rows = (
        nat.groupBy("region")
        .agg(F.sum("fc_base_cents").cast("bigint").alias("sum_base"))
        .join(F.broadcast(reg), "region")
        .select(
            "region",
            F.lit("ALL").alias("nation"),
            F.col("t_total").alias("hist_cents"),
            F.col("fc_region").alias("fc_base_cents"),
            F.col("r_alloc").alias("fc_reconciled_cents"),
            (F.col("fc_region") - F.col("sum_base"))
            .cast("bigint")
            .alias("adj_cents"),
        )
    )
    return nat_rows.unionByName(reg_rows)


FORECAST_RECONCILIATION_SQL = """
WITH monthly AS (
  -- explicit floor() before the BIGINT cast: DuckDB decimal->BIGINT
  -- ROUNDS where Spark's DECIMAL(38,0) cast truncates (Benford trap,
  -- CLAUDE.md); sums are positive so floor == truncate
  SELECT r_name AS region, n_name AS nation,
         CAST((EXTRACT(year FROM o_orderdate) - 1995) * 12
              + EXTRACT(month FROM o_orderdate) AS BIGINT) AS idx,
         CAST(floor(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))) * 100)
              AS BIGINT) AS y
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY 1, 2, 3
),
nspan AS (
  SELECT region, nation, MIN(idx) AS i0, MAX(idx) AS i1,
         CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS hist_cents
  FROM monthly GROUP BY 1, 2
),
nat AS (
  SELECT s.region, s.nation, s.hist_cents,
         CAST(CASE WHEN s.n > 1
              THEN e1.y + (e1.y - e0.y) // (s.n - 1)
              ELSE e1.y END AS BIGINT) AS fc_base_cents
  FROM nspan s
  JOIN monthly e0 ON e0.region = s.region AND e0.nation = s.nation
                 AND e0.idx = s.i0
  JOIN monthly e1 ON e1.region = s.region AND e1.nation = s.nation
                 AND e1.idx = s.i1
),
rmonthly AS (
  SELECT region, idx, CAST(SUM(y) AS BIGINT) AS y
  FROM monthly GROUP BY 1, 2
),
rspan AS (
  SELECT region, MIN(idx) AS i0, MAX(idx) AS i1,
         CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS t_total
  FROM rmonthly GROUP BY 1
),
reg AS (
  SELECT s.region, s.t_total,
         CAST(CASE WHEN s.n > 1
              THEN e1.y + (e1.y - e0.y) // (s.n - 1)
              ELSE e1.y END AS BIGINT) AS fc_region,
         CAST(greatest(CASE WHEN s.n > 1
              THEN e1.y + (e1.y - e0.y) // (s.n - 1)
              ELSE e1.y END, 0) AS BIGINT) AS r_alloc
  FROM rspan s
  JOIN rmonthly e0 ON e0.region = s.region AND e0.idx = s.i0
  JOIN rmonthly e1 ON e1.region = s.region AND e1.idx = s.i1
),
alloc AS (
  SELECT n.region, n.nation, n.hist_cents, n.fc_base_cents,
         r.r_alloc,
         CAST((CAST(r.r_alloc AS HUGEINT) * n.hist_cents) // r.t_total
              AS BIGINT) AS fl,
         CAST((CAST(r.r_alloc AS HUGEINT) * n.hist_cents) % r.t_total
              AS BIGINT) AS rem
  FROM nat n JOIN reg r ON r.region = n.region
),
nat_rows AS (
  SELECT region, nation, hist_cents, fc_base_cents,
         CAST(fl + CASE WHEN row_number() OVER (PARTITION BY region
                            ORDER BY rem DESC, nation)
                        <= r_alloc - SUM(fl) OVER (PARTITION BY region)
                   THEN 1 ELSE 0 END AS BIGINT) AS fc_reconciled_cents
  FROM alloc
)
SELECT region, nation, hist_cents, fc_base_cents, fc_reconciled_cents,
       CAST(fc_base_cents - fc_reconciled_cents AS BIGINT) AS adj_cents
FROM nat_rows
UNION ALL
SELECT r.region, 'ALL', r.t_total, r.fc_region, r.r_alloc,
       CAST(r.fc_region - b.sum_base AS BIGINT)
FROM reg r
JOIN (SELECT region, CAST(SUM(fc_base_cents) AS BIGINT) AS sum_base
      FROM nat GROUP BY region) b ON b.region = r.region
"""
