"""Compaction planner invariants: the bin-packed plan must conserve
rows/bytes, never grow the file count, and actually fix the small-file
problem it exists for."""

from __future__ import annotations

import pandas as pd

from etl_mini_dw_spark.plans import layout


def test_compaction_plan_invariants(spark, sf_dir):
    plan = layout.compaction_plan(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_shipdate"])
    # conservation: every lineitem row is in exactly one partition's plan
    assert int(plan.rows.sum()) == len(li)
    assert (plan.bytes == plan.rows * layout.COMPACT_ROW_BYTES).all()
    # packing never grows the file count and is keyed one-row-per-month
    assert plan.ym.is_unique
    assert (plan.bins_after <= plan.files_before).all()
    assert (plan.bins_after >= 1).all()
    # at most the final (residual) bin of each partition may be small
    assert (plan.small_after <= 1).all()
    # the plan solves the problem: strictly fewer small files wherever
    # the listing had a small-file problem to begin with
    problem = plan[plan.small_before > 1]
    assert not problem.empty  # fixture sanity: the tax exists
    assert (problem.small_after < problem.small_before).all()
    # fill ratio is a ratio of packed bytes to allotted capacity
    assert ((plan.fill_avg > 0) & (plan.fill_avg <= 1.0)).all()


def test_compaction_greedy_rule_replay(spark, sf_dir):
    """Replay the contiguous-greedy rule in pure python for one month
    and match the bin count — independent of both engines' SQL."""
    from pyspark.sql import functions as F

    from etl_mini_dw_spark.sources.tables import typed_table

    files = (
        typed_table(spark, sf_dir, "lineitem")
        .select(
            F.date_format("l_shipdate", "yyyy-MM").alias("ym"),
            F.pmod(F.col("l_orderkey"), F.lit(16)).alias("slot"),
        )
        .groupBy("ym", "slot")
        .count()
        .toPandas()
    )
    plan = layout.compaction_plan(spark, sf_dir).toPandas()
    ym = plan.ym.iloc[len(plan) // 2]
    month = files[files.ym == ym].sort_values("slot")
    cum = 0
    bins = set()
    for n in month["count"]:
        bins.add(cum // layout.COMPACT_TARGET)
        cum += int(n) * layout.COMPACT_ROW_BYTES
    assert int(plan[plan.ym == ym].bins_after.iloc[0]) == len(bins)


def test_layout_pruning_tradeoff_shape(spark, sf_dir):
    """The reason Z-order exists, as numbers: a partkey sort prunes
    partkey probes perfectly and suppkey probes not at all; Z-order
    prunes BOTH axes well below full scan."""
    rows = {
        (r.layout, r.probe_axis): r
        for r in layout.layout_pruning_tradeoff(spark, sf_dir).collect()
    }
    assert rows[("partkey_sort", "x")].frac <= 0.05
    assert rows[("partkey_sort", "y")].frac >= 0.95
    assert rows[("zorder", "x")].frac <= 0.10
    assert rows[("zorder", "y")].frac <= 0.50
    # and z-order strictly beats the sort on the unsorted axis
    assert rows[("zorder", "y")].frac < rows[("partkey_sort", "y")].frac
