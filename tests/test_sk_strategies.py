"""SK-assignment strategy equivalence (r6 VERDICT task #5).

``assign_surrogate_keys(strategy='bucketed')`` must be VALUE-IDENTICAL
to the default ordered row_number path — the bucket key is monotone in
nk and within-bucket ordering matches the global ordering, so prefix
sum + per-bucket row_number is the same permutation, not just the same
invariants. Pinned here exactly (full-frame equality) plus the C1–C3
validation battery on the bucketed two-phase lifecycle.
"""

from __future__ import annotations

import pytest

from etl_mini_dw_spark import fixtures_spec as spec
from etl_mini_dw_spark.operators import scd2
from etl_mini_dw_spark.plans import validation

SPLIT = "1998-01-01 00:00:00"
NOW = "2002-01-01 00:00:00"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("dim", spec.DIMS.values(), ids=list(spec.DIMS))
def test_bucketed_initial_equals_ordered(spark, sf_dir, dim):
    ordered = scd2.dim_initial(spark, sf_dir, dim)
    bucketed = scd2.dim_initial(spark, sf_dir, dim, sk_strategy="bucketed")
    assert ordered.columns == bucketed.columns
    assert _rows(ordered) == _rows(bucketed)


def test_bucketed_two_phase_equals_ordered_and_validates(spark, sf_dir):
    dim = spec.CUSTOMER
    ordered = scd2.dim_two_phase(spark, sf_dir, dim, SPLIT, NOW)
    bucketed = scd2.dim_two_phase(
        spark, sf_dir, dim, SPLIT, NOW, sk_strategy="bucketed"
    )
    # exact equality ⇒ batch stability: phase-1 keys survive phase 2
    # unchanged on both paths, and inserted keys are the same values
    assert _rows(ordered) == _rows(bucketed)
    # the reference's Stage-5 battery on the bucketed lifecycle output
    nk, sk = dim.nk, dim.sk
    assert validation.duplicate_current_per_nk(bucketed, nk).count() == 0
    assert validation.duplicate_version_windows(bucketed, nk).count() == 0
    assert validation.overlapping_windows(bucketed, nk, sk).count() == 0
    assert validation.null_validity(bucketed, nk).count() == 0
    # C1: dense unique SKs 1..n
    n = bucketed.count()
    sks = sorted(r[0] for r in bucketed.select(sk).collect())
    assert sks == list(range(1, n + 1))


def test_bucketed_sk_plan_has_no_global_row_window(spark, sf_dir):
    """The bucketed path's row-level windows must be keyed by the nk
    bucket — the only global window runs over the bucket histogram."""
    import io
    import re
    from contextlib import redirect_stdout

    df = scd2.dim_initial(spark, sf_dir, spec.CUSTOMER, sk_strategy="bucketed")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert re.search(r"windowspecdefinition\(_skb#\d+L?,", plan), plan[:3000]
