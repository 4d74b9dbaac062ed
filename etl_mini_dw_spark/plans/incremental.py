"""Incremental aggregate maintenance through the MERGE seam.

The warehouse pattern the reference's watermark machinery exists to
serve (`code/SQL_1…sql:280–281` delta predicate + `:924–990` keyed
update), applied to a rollup table: keep a materialized monthly revenue
aggregate current by recomputing ONLY the months touched since the
watermark and `merge_upsert`-ing them over the stored table
(etl/store.py). Cost at 100 TB is ∝ touched months (the month filter
pushes to the parquet scan; a production layout partitions the fact by
month so untouched partitions are never listed), not ∝ history.

The registered query runs both phases against a throwaway store and
returns the maintained table; the oracle is a FULL recompute over all
orders — equality proves the incremental path converges to the batch
answer, the invariant that matters for any incremental view.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mini_dw_spark.etl.store import ParquetStore
from etl_mini_dw_spark.sources.tables import typed_table
from etl_mini_dw_spark.streaming.machinery import scratch_dir

ROLLUP_WM = "1998-01-01 00:00:00"  # phase split: history before, delta after


def _monthly(df: DataFrame) -> DataFrame:
    return df.groupBy("order_month").agg(
        F.sum("o_totalprice").cast("decimal(38,2)").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def incremental_monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase maintained monthly rollup (initial load + merged delta)."""
    store = ParquetStore(scratch_dir(prefix="incr_rollup_"))
    orders = typed_table(spark, sf_dir, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    wm = F.lit(ROLLUP_WM).cast("timestamp")
    # phase 1: initial build from pre-watermark history
    store.write(_monthly(orders.filter(F.col("o_orderdate") < wm)), "monthly")
    # phase 2: recompute ONLY months with post-watermark orders, then MERGE.
    # The recompute reads ALL orders of a touched month (a month straddling
    # the watermark must not lose its old rows) via a broadcast semi-join;
    # the month list is tiny by construction.
    touched = (
        orders.filter(F.col("o_orderdate") >= wm).select("order_month").distinct()
    )
    delta = _monthly(
        orders.join(F.broadcast(touched), "order_month", "left_semi")
    )
    store.merge_upsert(spark, delta, "monthly", keys=["order_month"])
    return store.read(spark, "monthly").select(
        "order_month",
        F.col("revenue").cast("double").alias("revenue"),
        F.col("n_orders").cast("bigint").alias("n_orders"),
    )


# oracle: the full batch recompute the incremental path must converge to
INCREMENTAL_ROLLUP_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1
"""


# --- incremental JOIN-view maintenance ---------------------------------------
#
# The rollup above maintains a single-table aggregate by recomputing
# touched partitions; this maintains a JOIN view algebraically — the
# textbook IVM delta rule (Blakeley et al. 1986; the algebra behind
# materialized-view maintenance and streaming joins alike):
#
#   Δ(L ⋈ O) = ΔL ⋈ O_old  ∪  L_old ⋈ ΔO  ∪  ΔL ⋈ ΔO
#
# with the delta aggregate ADDED onto the stored view (revenue/count are
# additive), never recomputing history. The two CDC feeds are deliberately
# independent: lineitem deltas are time-watermarked (l_shipdate ≥ WM),
# order deltas are a KEYED correction batch (o_orderkey mod 5 = 0), so
# all three delta terms are non-empty and the no-double-counting algebra
# is genuinely exercised — a time-split on both sides would leave
# L_old ⋈ ΔO empty (shipdate ≥ orderdate).
#
# Scale: each delta term joins a small delta against one big side —
# broadcast-the-delta joins; history (L_old ⋈ O_old) is touched only in
# the one-time initial build. The final additive merge re-aggregates
# |nations| + |Δnations| rows. The oracle is the full batch recompute —
# equality proves the delta algebra converges to the batch answer.

IVM_WM = "1998-01-01 00:00:00"  # lineitem CDC watermark (l_shipdate)
IVM_ORDER_MOD = 5  # orders CDC keyed batch: o_orderkey mod 5 = 0


def incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nation, revenue, n_items): nation revenue view maintained through
    the three-term join-delta rule + additive merge, returned from the
    store after both phases."""
    store = ParquetStore(scratch_dir(prefix="ivm_join_"))
    rev = F.col("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount")
    )
    li = typed_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", rev.alias("rev"), "l_shipdate"
    )
    orders = typed_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = typed_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = typed_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    wm = F.lit(IVM_WM).cast("timestamp")
    l_old = li.filter(F.col("l_shipdate") < wm)
    l_new = li.filter(F.col("l_shipdate") >= wm)
    o_old = orders.filter(F.col("o_orderkey") % IVM_ORDER_MOD != 0)
    o_new = orders.filter(F.col("o_orderkey") % IVM_ORDER_MOD == 0)

    def joined(lpart: DataFrame, opart: DataFrame) -> DataFrame:
        return (
            lpart.join(opart, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
            .select(F.col("n_name").alias("nation"), "rev")
        )

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("nation").agg(
            F.sum("rev").cast("decimal(38,4)").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )

    # phase 1: initial view build from the old slices only
    store.write(agg(joined(l_old, o_old)), "nation_rev")
    # phase 2: three-term join delta, aggregated once, ADDED to the store
    delta = (
        joined(l_new, o_old)
        .unionByName(joined(l_old, o_new))
        .unionByName(joined(l_new, o_new))
    )
    merged = (
        store.read(spark, "nation_rev")
        .unionByName(agg(delta))
        .groupBy("nation")
        .agg(
            F.sum("revenue").cast("decimal(38,4)").alias("revenue"),
            F.sum("n_items").cast("bigint").alias("n_items"),
        )
    )
    store.write(merged, "nation_rev")
    return (
        store.read(spark, "nation_rev")
        .select(
            "nation",
            F.col("revenue").cast("double").alias("revenue"),
            "n_items",
        )
        .orderBy("nation")
    )


# oracle: the full batch join-aggregate the incremental path must equal
INCREMENTAL_JOIN_VIEW_SQL = """
SELECT n_name AS nation,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1
ORDER BY 1
"""
