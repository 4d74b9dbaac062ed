"""Property-based check of the event-sourced SCD2 splice: for RANDOM
edit histories and a RANDOM late-batch split, splicing the late events
into the initially-built history must equal the one-shot rebuild from
all events. Generalizes the fixed-fixture splice tests — truncation,
mid-history insertion, tombstone-first, all-late keys and empty late
batches all arise from the generator."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from etl_mini_dw_spark.fixtures_spec import DIMS, attr_cols
from etl_mini_dw_spark.operators.scd2_events import scd2_from_events, scd2_retro_correct

DIM = DIMS["customer"]
BASE = datetime(2000, 1, 1)

_history = st.dictionaries(
    st.integers(min_value=1, max_value=4),  # nk
    st.lists(  # per-key events: (day offset, attr variant, tombstone?)
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=3),
            st.booleans(),
        ),
        min_size=1,
        max_size=5,
        unique_by=lambda e: e[0],
    ),
    min_size=1,
    max_size=4,
)


def _events_df(spark, hist):
    schema = T.StructType(
        [T.StructField(DIM.nk, T.IntegerType())]
        + [T.StructField(a, T.StringType()) for a in attr_cols(DIM)]
        + [
            T.StructField("event_ts", T.TimestampType()),
            T.StructField("tomb", T.BooleanType()),
        ]
    )
    def _attr_val(attr: str, variant: int) -> str:
        # numeric-typed attrs (…id) must stay castable downstream
        return str(variant) if attr.endswith("id") else f"{attr}-{variant}"

    rows = [
        (
            nk,
            *[_attr_val(a, variant) for a in attr_cols(DIM)],
            BASE + timedelta(days=day),
            tomb,
        )
        for nk, evs in hist.items()
        for day, variant, tomb in evs
    ]
    return spark.createDataFrame(rows, schema)


def _rows(df):
    # events_from_versions casts numeric-typed attrs on the splice path
    # while the raw generated frame keeps strings — compare canonically
    cols = [DIM.nk, *attr_cols(DIM), "active_from", "active_to", "is_current"]
    return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(hist=_history, split_day=st.integers(min_value=-1, max_value=31))
def test_random_splice_equals_full_rebuild(spark, hist, split_day):
    events = _events_df(spark, hist).localCheckpoint()
    split_ts = BASE + timedelta(days=split_day)
    initial = events.filter(events.event_ts <= split_ts)
    late = events.filter(events.event_ts > split_ts)
    spliced = scd2_retro_correct(scd2_from_events(initial, DIM), late, DIM)
    full = scd2_from_events(events, DIM)
    assert _rows(spliced) == _rows(full)
