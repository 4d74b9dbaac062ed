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

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mini_dw_spark.etl.store import ParquetStore
from etl_mini_dw_spark.sources.tables import typed_table

ROLLUP_WM = "1998-01-01 00:00:00"  # phase split: history before, delta after


def _monthly(df: DataFrame) -> DataFrame:
    return df.groupBy("order_month").agg(
        F.sum("o_totalprice").cast("decimal(38,2)").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def incremental_monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase maintained monthly rollup (initial load + merged delta)."""
    store = ParquetStore(tempfile.mkdtemp(prefix="incr_rollup_"))
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
