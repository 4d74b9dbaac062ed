"""Property-based check of the fact as-of dimension resolve: for RANDOM
SCD2 histories (with gaps) and RANDOM fact event times, the half-open
[active_from, active_to) join must pick exactly the version covering the
event — boundary events land on the NEWER version, uncovered events on
the unknown member."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from etl_mini_dw_spark.fixtures_spec import UNKNOWN_NK
from etl_mini_dw_spark.operators.fact import DIM_LINKS, resolve_dimensions

BASE = datetime(2000, 1, 1)
HIGH = datetime(9999, 12, 31)
UNK_SK = -100

# per key: list of (start_day, duration_days, gap_after?) → windows with
# optional holes; last window may be open (duration None)
_histories = st.dictionaries(
    st.integers(min_value=1, max_value=3),
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=5), st.booleans()),
        min_size=1,
        max_size=4,
    ),
    min_size=1,
    max_size=3,
)
_events = st.lists(
    st.tuples(st.integers(min_value=0, max_value=4), st.integers(min_value=0, max_value=40)),
    min_size=1,
    max_size=8,
)


def _windows(hist):
    """hist → {nk: [(sk, from_dt, to_dt)]} with gaps where flagged."""
    out, sk = {}, 0
    for nk, segs in sorted(hist.items()):
        day, rows = 0, []
        for dur, gap in segs:
            sk += 1
            start = BASE + timedelta(days=day)
            end = BASE + timedelta(days=day + dur)
            rows.append((sk, start, end))
            day += dur + (2 if gap else 0)
        # reopen the tail: last window becomes open-ended
        sk += 1
        rows.append((sk, BASE + timedelta(days=day), HIGH))
        out[nk] = rows
    return out


def _expected_sk(wins, nk, ts):
    for sk, lo, hi in wins.get(nk, []):
        if lo <= ts < hi:
            return sk
    return UNK_SK


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(hist=_histories, events=_events)
def test_asof_resolve_matches_model(spark, hist, events):
    wins = _windows(hist)
    dim_schema = "customer_nk INT, customer_id INT, active_from TIMESTAMP, active_to TIMESTAMP"

    def _dim(nk_name, sk_name, rows):
        data = [(UNKNOWN_NK, UNK_SK, datetime(1900, 1, 1), HIGH)] + rows
        return spark.createDataFrame(
            data,
            T.StructType(
                [
                    T.StructField(nk_name, T.IntegerType()),
                    T.StructField(sk_name, T.IntegerType()),
                    T.StructField("active_from", T.TimestampType()),
                    T.StructField("active_to", T.TimestampType()),
                ]
            ),
        )

    cust_rows = [(nk, sk, lo, hi) for nk, ws in wins.items() for sk, lo, hi in ws]
    dims = {}
    for fk_col, dim_spec, _nk_col in DIM_LINKS:
        rows = cust_rows if fk_col == "sales_customerid" else []
        dims[fk_col] = _dim(dim_spec.nk, dim_spec.sk, rows)

    fact_rows = [
        (i, nk, -999, -999, BASE + timedelta(days=day))
        for i, (nk, day) in enumerate(events)
    ]
    facts = spark.createDataFrame(
        fact_rows,
        T.StructType(
            [
                T.StructField("row_id", T.IntegerType()),
                T.StructField("customer_nk", T.IntegerType()),
                T.StructField("salesperson_nk", T.IntegerType()),
                T.StructField("product_nk", T.IntegerType()),
                T.StructField("sales_lasteditedwhen", T.TimestampType()),
            ]
        ),
    )
    got = {
        r.row_id: r.sales_customerid
        for r in resolve_dimensions(facts, dims).collect()
    }
    for i, (nk, day) in enumerate(events):
        assert got[i] == _expected_sk(wins, nk, BASE + timedelta(days=day)), (
            i,
            nk,
            day,
            wins,
        )
