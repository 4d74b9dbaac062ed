"""Event-sourced SCD2: late-splice ≡ full rebuild, and the rebuild
reconstructs the temporal source exactly (all three dims)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_mini_dw_spark.fixtures_spec import DIMS, attr_cols
from etl_mini_dw_spark.operators.scd2_events import (
    events_from_versions,
    scd2_from_events,
    scd2_retro_correct,
)
from etl_mini_dw_spark.sources import staging


def _rows(df, dim):
    cols = [dim.nk, *attr_cols(dim), "active_from", "active_to", "is_current"]
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("dim_key", ["customer", "salesperson", "product"])
def test_event_rebuild_reconstructs_source_history(spark, sf_dir, dim_key):
    """Deriving windows from the event stream must reproduce the temporal
    source's own (valid_from, valid_to, is_current) windows exactly."""
    dim = DIMS[dim_key]
    shaped = staging._warehouse_shape(dim, staging.src_versions(spark, sf_dir, dim))
    rebuilt = scd2_from_events(events_from_versions(shaped, dim), dim)
    truth = shaped.select(
        dim.nk,
        *attr_cols(dim),
        F.col("valid_from").alias("active_from"),
        F.col("valid_to").alias("active_to"),
        "is_current",
    )
    assert _rows(rebuilt, dim) == _rows(truth, dim)


@pytest.mark.parametrize("dim_key", ["customer", "salesperson", "product"])
def test_late_splice_equals_full_rebuild(spark, sf_dir, dim_key):
    """Splicing the late archive batch into the on-time-only state must land
    exactly on the full-history rebuild (the incremental-equals-full
    property, event-sourced edition)."""
    dim = DIMS[dim_key]
    shaped = staging._warehouse_shape(dim, staging.src_versions(spark, sf_dir, dim))
    on_time = shaped.filter(F.col("is_current"))
    archive = shaped.filter(~F.col("is_current"))
    windows0 = scd2_from_events(events_from_versions(on_time, dim), dim)
    late_attr = archive.select(
        dim.nk,
        *attr_cols(dim),
        F.col("valid_from").alias("event_ts"),
        F.lit(False).alias("tomb"),
    )
    gone = archive.join(on_time.select(dim.nk).distinct(), dim.nk, "left_anti")
    from etl_mini_dw_spark.operators.scd2_events import _null_attrs

    late_tombs = (
        gone.groupBy(dim.nk)
        .agg(F.max("valid_to").alias("event_ts"))
        .select(dim.nk, *_null_attrs(dim), "event_ts", F.lit(True).alias("tomb"))
    )
    corrected = scd2_retro_correct(
        windows0, late_attr.unionByName(late_tombs), dim
    )
    full = scd2_from_events(events_from_versions(shaped, dim), dim)
    assert _rows(corrected, dim) == _rows(full, dim)


def test_untouched_keys_pass_through_unchanged(spark, sf_dir):
    """Retro-correction must not rewrite keys outside the late batch."""
    dim = DIMS["customer"]
    shaped = staging._warehouse_shape(dim, staging.src_versions(spark, sf_dir, dim))
    windows = scd2_from_events(events_from_versions(shaped, dim), dim)
    # late batch touching exactly one key: re-deliver its earliest event
    one_key = (
        windows.select(dim.nk).orderBy(dim.nk).limit(1).collect()[0][0]
    )
    late = (
        shaped.filter(F.col(dim.nk) == one_key)
        .select(
            dim.nk,
            *attr_cols(dim),
            F.col("valid_from").alias("event_ts"),
            F.lit(False).alias("tomb"),
        )
        .limit(1)
    )
    corrected = scd2_retro_correct(windows, late, dim)
    others_before = _rows(windows.filter(F.col(dim.nk) != one_key), dim)
    others_after = _rows(corrected.filter(F.col(dim.nk) != one_key), dim)
    assert others_before == others_after


def test_bitemporal_matrix_semantics(spark, sf_dir):
    """The tx axis must actually change history: at the early valid
    as-of, the live-only reconstruction (t1) is missing every key whose
    early versions only arrived with the archive batch, so its ALL
    count is strictly below t2's; per-category counts never exceed
    their t2 counterpart at that as-of. And each (known_at, valid_asof)
    group's ALL row equals the sum of its category rows."""
    from etl_mini_dw_spark.operators import scd2_events

    rows = scd2_events.bitemporal_asof_matrix(spark, sf_dir).collect()
    by = {}
    for r in rows:
        by.setdefault((r.known_at, r.valid_asof), {})[r.category] = r.n_keys
    early = scd2_events.BITEMP_VALID_ASOF[0]
    for key, cats in by.items():
        assert cats["ALL"] == sum(v for c, v in cats.items() if c != "ALL")
    t1_early = by[("t1_live_only", early)]
    t2_early = by[("t2_full", early)]
    assert t1_early["ALL"] < t2_early["ALL"]
    for c, v in t1_early.items():
        assert v <= t2_early.get(c, 0) or c == "ALL"
