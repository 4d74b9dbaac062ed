"""SURVEY §5 item 4: initial-load-on-full-data ≡ split-load + incremental.

The reference documents this property informally (README re-run notes);
here it is exact: the two-phase fact state equals the direct full build
row-for-row, and the two-phase dim state equals the full build on every
non-delete-detected key (delete detection closes at detection time — the
reference's own documented divergence, `code/SQL_1…sql:974–987`).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mini_dw_spark import fixtures_spec as spec
from etl_mini_dw_spark.operators import fact, scd2


def _sym_diff_count(a, b):
    return a.exceptAll(b).count() + b.exceptAll(a).count()


def test_fact_two_phase_equals_full(spark, sf_dir):
    full = fact.fact_initial(spark, sf_dir)
    two = fact.fact_two_phase(spark, sf_dir).drop("change_tag").select(*full.columns)
    assert _sym_diff_count(full, two) == 0


def test_dim_two_phase_equals_full_except_deletes(spark, sf_dir):
    for key, dim in spec.DIMS.items():
        full = scd2.dim_initial(spark, sf_dir, dim)
        two = scd2.dim_two_phase(spark, sf_dir, dim, spec.MID, spec.NOW_FIXED)
        deleted_nks = [r[0] for r in two.filter(F.col("change_tag") == "deleted").select(dim.nk).collect()]
        cols = [dim.nk, *spec.attr_cols(dim), "is_current", "active_from", "active_to"]
        a = full.filter(~F.col(dim.nk).isin(deleted_nks)).select(*cols)
        b = two.filter(~F.col(dim.nk).isin(deleted_nks)).select(*cols)
        assert _sym_diff_count(a, b) == 0, key


import pytest


@pytest.mark.parametrize(
    "split",
    ["1993-06-01 00:00:00", "1995-01-01 00:00:00", "1997-06-01 00:00:00"],
)
def test_dim_two_phase_split_invariant(spark, sf_dir, split):
    """The incremental-equals-full property must hold at ANY split point,
    not just the registry's MID — early splits exercise a near-empty
    phase 1, late splits a near-empty delta."""
    dim = spec.DIMS["customer"]
    full = scd2.dim_initial(spark, sf_dir, dim)
    two = scd2.dim_two_phase(spark, sf_dir, dim, split, spec.NOW_FIXED)
    deleted_nks = [
        r[0]
        for r in two.filter(F.col("change_tag") == "deleted").select(dim.nk).collect()
    ]
    cols = [dim.nk, *spec.attr_cols(dim), "is_current", "active_from", "active_to"]
    a = full.filter(~F.col(dim.nk).isin(deleted_nks)).select(*cols)
    b = two.filter(~F.col(dim.nk).isin(deleted_nks)).select(*cols)
    assert _sym_diff_count(a, b) == 0, split


def test_join_view_ivm_equals_batch_and_exercises_all_terms(spark, sf_dir):
    """The three-term join delta must (a) equal the batch recompute and
    (b) actually populate all three terms — a time-split on both feeds
    would silently leave L_old ⋈ ΔO empty."""
    from pyspark.sql import functions as F2

    from etl_mini_dw_spark.plans import incremental
    from etl_mini_dw_spark.sources.tables import typed_table

    maintained = incremental.incremental_join_view(spark, sf_dir)
    li = typed_table(spark, sf_dir, "lineitem")
    orders = typed_table(spark, sf_dir, "orders")
    customer = typed_table(spark, sf_dir, "customer")
    nation = typed_table(spark, sf_dir, "nation")
    rev = F2.col("l_extendedprice") * (
        F2.lit(1).cast("decimal(4,2)") - F2.col("l_discount")
    )
    batch = (
        li.join(orders, F2.col("l_orderkey") == F2.col("o_orderkey"))
        .join(F2.broadcast(customer), F2.col("o_custkey") == F2.col("c_custkey"))
        .join(F2.broadcast(nation), F2.col("c_nationkey") == F2.col("n_nationkey"))
        .groupBy(F2.col("n_name").alias("nation"))
        .agg(
            F2.sum(rev).cast("decimal(38,4)").cast("double").alias("revenue"),
            F2.count(F2.lit(1)).cast("bigint").alias("n_items"),
        )
    )
    assert _sym_diff_count(maintained, batch) == 0
    # all three delta terms non-empty
    wm = F2.lit(incremental.IVM_WM).cast("timestamp")
    l_new = li.filter(F2.col("l_shipdate") >= wm)
    l_old = li.filter(F2.col("l_shipdate") < wm)
    o_new = orders.filter(F2.col("o_orderkey") % incremental.IVM_ORDER_MOD == 0)
    o_old = orders.filter(F2.col("o_orderkey") % incremental.IVM_ORDER_MOD != 0)
    for lpart, opart, label in [
        (l_new, o_old, "dL-Oold"),
        (l_old, o_new, "Lold-dO"),
        (l_new, o_new, "dL-dO"),
    ]:
        assert (
            lpart.join(opart, F2.col("l_orderkey") == F2.col("o_orderkey")).limit(1).count() == 1
        ), label
