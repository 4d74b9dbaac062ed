"""Penny-exact proration: largest-remainder fee allocation.

The classic warehouse allocation problem: spread an order-level charge
(here a 2.5% shipping fee, rounded to the cent) across the order's
lineitems proportionally to value, such that the allocated cents SUM
BACK EXACTLY to the fee — naive per-line rounding leaks pennies, and a
financial mart that is off by a cent per order fails reconciliation at
month-end. The fix is the largest-remainder (Hamilton) method, entirely
in integers:

    base_i = floor(T · w_i / W),   r_i = (T · w_i) mod W
    rem    = T − Σ base_i          (0 ≤ rem < n_lines)
    alloc_i = base_i + 1 for the `rem` largest r_i, else base_i

Portability: the testdata's lineitem is NOT unique on (orderkey,
linenumber) — fully duplicate rows have EQUAL remainders, so which
duplicate receives the extra penny is engine-dependent. But the
per-order allocation MULTISET is invariant under that choice (k of the
tied rows get +1 regardless of which k), so every compared column here
is a multiset-invariant per-order aggregate (sum / max / min /
mismatch count) rolled up by order size. The n_mismatch column is the
op's own invariant: it must be 0 everywhere.

Scale: one orderkey-keyed aggregate for (W, n) + one co-partitioned
join back + one per-order window over ≤order-size rows — the same
single-shuffle discipline as the fact loader; no global step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import typed_table

FEE_PERMILLE = 25  # order fee = 2.5% of o_totalprice, floored to the cent


def penny_allocation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_lines, n_orders, fee_c, alloc_c, n_mismatch, max_spread_c):
    largest-remainder allocation audit rolled up by order size —
    alloc_c must equal fee_c and n_mismatch must be 0 in every row."""
    li = typed_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") * 100).cast("bigint").alias("w"),
    )
    orders = typed_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(f"(CAST(o_totalprice * 100 AS BIGINT) * {FEE_PERMILLE}) div 1000")
        .cast("bigint")
        .alias("fee"),
    )
    totals = li.groupBy("l_orderkey").agg(
        F.sum("w").cast("bigint").alias("w_tot"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )
    lines = (
        li.join(totals, "l_orderkey")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "n_lines",
            "fee",
            F.expr("(fee * w) div w_tot").alias("base"),
            F.expr("(fee * w) % w_tot").alias("r"),
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
        )
    )
    wr = Window.partitionBy("l_orderkey").orderBy(
        F.col("r").desc(), "l_linenumber", "l_partkey", "l_suppkey"
    )
    wrem = Window.partitionBy("l_orderkey")
    alloc = lines.select(
        "l_orderkey",
        "n_lines",
        "fee",
        (
            F.col("base")
            + F.when(
                F.row_number().over(wr)
                <= (F.col("fee") - F.sum("base").over(wrem)),
                1,
            ).otherwise(0)
        ).alias("alloc"),
    )
    per_order = alloc.groupBy("l_orderkey", "n_lines", "fee").agg(
        F.sum("alloc").cast("bigint").alias("alloc_sum"),
        (F.max("alloc") - F.min("alloc")).cast("bigint").alias("spread"),
    )
    return (
        per_order.groupBy("n_lines")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("fee").cast("bigint").alias("fee_c"),
            F.sum("alloc_sum").cast("bigint").alias("alloc_c"),
            F.sum(F.when(F.col("alloc_sum") != F.col("fee"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_mismatch"),
            F.max("spread").cast("bigint").alias("max_spread_c"),
        )
        .orderBy("n_lines")
    )


PENNY_ALLOCATION_SQL = f"""
WITH li AS MATERIALIZED (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         CAST(l_extendedprice * 100 AS BIGINT) AS w
  FROM lineitem
),
totals AS (
  SELECT l_orderkey AS tk, CAST(SUM(w) AS BIGINT) AS w_tot,
         CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM li GROUP BY 1
),
lines AS MATERIALIZED (
  SELECT l_orderkey, n_lines, fee,
         (fee * w) // w_tot AS base,
         (fee * w) % w_tot AS r,
         l_linenumber, l_partkey, l_suppkey
  FROM li
  JOIN totals ON tk = l_orderkey
  JOIN (SELECT o_orderkey,
               CAST((CAST(o_totalprice * 100 AS BIGINT) * {FEE_PERMILLE}) // 1000 AS BIGINT) AS fee
        FROM orders) o ON o_orderkey = l_orderkey
),
alloc AS (
  SELECT l_orderkey, n_lines, fee,
         base + CASE WHEN row_number() OVER (
                  PARTITION BY l_orderkey
                  ORDER BY r DESC, l_linenumber, l_partkey, l_suppkey)
                <= fee - SUM(base) OVER (PARTITION BY l_orderkey)
                THEN 1 ELSE 0 END AS alloc
  FROM lines
),
per_order AS (
  SELECT l_orderkey, n_lines, fee,
         CAST(SUM(alloc) AS BIGINT) AS alloc_sum,
         CAST(MAX(alloc) - MIN(alloc) AS BIGINT) AS spread
  FROM alloc GROUP BY 1, 2, 3
)
SELECT n_lines, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(fee) AS BIGINT) AS fee_c,
       CAST(SUM(alloc_sum) AS BIGINT) AS alloc_c,
       CAST(SUM(CASE WHEN alloc_sum <> fee THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
       CAST(MAX(spread) AS BIGINT) AS max_spread_c
FROM per_order
GROUP BY 1
ORDER BY 1
"""


# --- Neyman sampling allocation -----------------------------------------------
#
# Survey-sampling design (Neyman 1934): given a fixed audit/labeling
# budget of SAMPLE_BUDGET units, allocate per-stratum sample sizes
# ∝ n_h·σ_h — strata that are large AND internally variable get more
# budget, which minimizes the variance of the stratified mean. The
# proportional allocation (∝ n_h) is reported beside it; the gap is the
# value of knowing the variances. The integerization reuses the penny
# allocator's largest-remainder rule, so Σ alloc == SAMPLE_BUDGET
# exactly on both engines.
#
# Portability: σ_h comes from exact DECIMAL(38,0)/HUGEINT moment sums;
# the ONE sqrt runs on an identical double and is rounded to 6 before
# being re-scaled into an exact integer weight — after that point every
# comparison (quota floors, remainder ranking) is pure integer, so the
# allocation cannot flip on a float knife-edge.
#
# Scale: per-customer rollup (one o_custkey shuffle) + one
# (stratum)-keyed aggregate; the allocation itself runs on |strata|
# rows.

SAMPLE_BUDGET = 1000


def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(segment, n_h, sigma, alloc_neyman, alloc_prop): variance-optimal
    vs proportional allocation of SAMPLE_BUDGET audit samples across
    market segments; both columns sum to the budget exactly."""
    cust = typed_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    orders = typed_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum((F.col("o_totalprice") * 100).cast("bigint")).alias("y")
    )
    units = cust.join(per_cust, "c_custkey", "left").select(
        "segment", F.coalesce(F.col("y"), F.lit(0)).alias("y")
    )
    yd = F.col("y").cast("decimal(19,0)")
    strata = units.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(yd * yd).cast("decimal(38,0)").alias("syy"),
    )
    var_num = (
        F.col("n_h").cast("decimal(10,0)") * F.col("syy")
        - F.col("sy").cast("decimal(19,0)") * F.col("sy").cast("decimal(19,0)")
    ).cast("double")
    sigma = F.when(
        var_num > 0,
        F.round(F.sqrt(var_num) / (F.col("n_h") * 100.0), 6),
    ).otherwise(F.lit(0.0))
    weighted = strata.select(
        "segment",
        "n_h",
        sigma.alias("sigma"),
        # integer Neyman weight: round-6 sigma re-scaled — exact on both
        # engines (explicit round before the cast: DuckDB's double→BIGINT
        # cast rounds where Spark truncates)
        (F.round(sigma * 1e6, 0).cast("bigint") * F.col("n_h")).alias("w"),
    ).localCheckpoint(eager=False)

    def largest_remainder(df: DataFrame, wcol: str, out: str) -> DataFrame:
        tot = df.agg(F.sum(wcol).cast("bigint").alias("w_tot"))
        j = df.crossJoin(F.broadcast(tot))
        # w_tot = 0 is reachable only on a degenerate fixture (every
        # stratum sigma = 0 zeroes the Neyman weights) but pmod(.., 0)
        # throws under ANSI — guard IN-CASE (reorder-proof, CLAUDE.md)
        # rather than assuming the data. 0-weight fallback: base 0,
        # remainder 0 → the rank top-up degrades to first-K-by-segment,
        # still deterministic. Mirrored in the oracle SQL.
        quota = j.select(
            "segment",
            F.expr(
                f"CASE WHEN w_tot > 0 THEN ({SAMPLE_BUDGET} * {wcol}"
                f" - pmod({SAMPLE_BUDGET} * {wcol}, w_tot)) div w_tot"
                f" ELSE 0 END"
            ).alias("base"),
            F.expr(
                f"CASE WHEN w_tot > 0"
                f" THEN pmod({SAMPLE_BUDGET} * {wcol}, w_tot)"
                f" ELSE 0 END"
            ).alias("r"),
        )
        wsum = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        wrank = Window.orderBy(F.col("r").desc(), F.col("segment"))
        return quota.select(
            "segment",
            (
                F.col("base")
                + F.when(
                    F.row_number().over(wrank)
                    <= F.lit(SAMPLE_BUDGET) - F.sum("base").over(wsum),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias(out),
        )
    ney = largest_remainder(weighted, "w", "alloc_neyman")
    prop = largest_remainder(weighted, "n_h", "alloc_prop")
    return (
        weighted.select("segment", "n_h", "sigma")
        .join(F.broadcast(ney), "segment")
        .join(F.broadcast(prop), "segment")
        .orderBy("segment")
    )


def _lr_sql(weight: str, out: str) -> str:
    return f"""
  SELECT segment,
         CAST(base + CASE WHEN rnk <= {SAMPLE_BUDGET} - base_sum
                          THEN 1 ELSE 0 END AS BIGINT) AS {out}
  FROM (
    SELECT segment, base, r,
           row_number() OVER (ORDER BY r DESC, segment) AS rnk,
           SUM(base) OVER () AS base_sum
    FROM (
      SELECT segment,
             CASE WHEN w_tot > 0 THEN ({SAMPLE_BUDGET} * {weight}
              - ((({SAMPLE_BUDGET} * {weight}) % w_tot + w_tot) % w_tot))
               // w_tot ELSE 0 END AS base,
             CASE WHEN w_tot > 0 THEN
               ((({SAMPLE_BUDGET} * {weight}) % w_tot + w_tot) % w_tot)
             ELSE 0 END AS r
      FROM weighted, (SELECT SUM({weight}) AS w_tot FROM weighted)
    )
  )
"""


NEYMAN_ALLOCATION_SQL = f"""
WITH per_cust AS (
  SELECT c.c_custkey, c.c_mktsegment AS segment,
         COALESCE(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100
                           AS BIGINT)), 0) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
strata AS (
  SELECT segment,
         CAST(COUNT(*) AS BIGINT) AS n_h,
         CAST(SUM(y) AS BIGINT) AS sy,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM per_cust GROUP BY segment
),
weighted AS MATERIALIZED (
  SELECT segment, n_h,
         CASE WHEN n_h * syy - CAST(sy AS HUGEINT) * sy > 0
              THEN round(sqrt(CAST(n_h * syy - CAST(sy AS HUGEINT) * sy
                                   AS DOUBLE)) / (n_h * 100.0), 6)
              ELSE 0.0 END AS sigma,
         CAST(round(CASE WHEN n_h * syy - CAST(sy AS HUGEINT) * sy > 0
              THEN round(sqrt(CAST(n_h * syy - CAST(sy AS HUGEINT) * sy
                                   AS DOUBLE)) / (n_h * 100.0), 6)
              ELSE 0.0 END * 1e6, 0) AS BIGINT) * n_h AS w
  FROM strata
),
ney AS ({_lr_sql("w", "alloc_neyman")}),
prop AS ({_lr_sql("n_h", "alloc_prop")})
SELECT w.segment, w.n_h, w.sigma, ney.alloc_neyman, prop.alloc_prop
FROM weighted w
JOIN ney ON ney.segment = w.segment
JOIN prop ON prop.segment = w.segment
ORDER BY w.segment
"""
