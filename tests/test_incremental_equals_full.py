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
