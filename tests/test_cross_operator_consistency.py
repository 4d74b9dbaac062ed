"""Cross-operator consistency: independent implementations of the same
semantics must agree — the engine checks itself.

These catch a class of bug the per-query oracle can't: both an operator
AND its oracle drifting together (e.g. a shared misreading of gap
semantics) still differ from the INDEPENDENT formulation of the same
question elsewhere in the engine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mini_dw_spark.streaming import events as ev


def test_lag_sessionization_agrees_with_native_session_window(spark, sf_dir):
    """The lag/running-sum sessionization and Spark's native
    ``session_window`` implement the same gap rule — their (user,
    session_start, n_events) multisets must be identical."""
    lag_based = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in ev.sessionization(spark, sf_dir)
        .select("user_id", "session_start", "n_events")
        .collect()
    )
    native = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in ev.session_window_native(spark, sf_dir)
        .select("user_id", "session_start", "n_events")
        .collect()
    )
    assert lag_based == native


def test_rollup_tree_month_agrees_with_flagship_grain(spark, sf_dir):
    """rollup_tree's month revenue must equal the direct month aggregate
    computed from scratch (no staged day grain) — the lossless-
    re-aggregation claim, checked against an independent plan."""
    from etl_mini_dw_spark.plans.rollup_tree import rollup_tree
    from etl_mini_dw_spark.sources.tables import typed_table

    tree = {
        r["period"]: r["revenue"]
        for r in rollup_tree(spark, sf_dir).filter(F.col("grain") == "month").collect()
    }
    li = typed_table(spark, sf_dir, "lineitem")
    orders = typed_table(spark, sf_dir, "orders")
    direct = {
        r["m"]: r["rev"]
        for r in li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("m"))
        .agg(
            F.sum(F.expr("l_extendedprice * (1 - l_discount)"))
            .cast("decimal(38,4)")
            .cast("double")
            .alias("rev")
        )
        .collect()
    }
    assert tree == direct


def test_hll_rollup_agrees_with_exact_within_rsd(spark, sf_dir):
    """The sketch rollup's per-type estimates stay within the configured
    rsd band of the EXACT distinct counts (tighter than the generic 5%
    sanity bound in test_approx_sketches — lgk=14 gives ~0.8% rsd; allow
    3σ)."""
    from etl_mini_dw_spark.plans.sketches import hll_user_rollup
    from etl_mini_dw_spark.sources.tables import typed_table

    est = {
        r["event_type"]: r["approx_users"]
        for r in hll_user_rollup(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["u"]
        for r in typed_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    for et, e in exact.items():
        assert abs(est[et] - e) <= max(3, 3 * 0.008 * e), (et, est[et], e)
