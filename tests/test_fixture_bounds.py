"""Fixture-bounds guard for the role-playing DimDate joins.

`revenue_by_role_playing_dates` (plans/analytics.py) inner-joins the
generated DimDate (bounded DATE_START..DATE_END) on order AND ship
dates; a date outside the dim range would silently drop rows on the
Spark side only (ADVICE r3). This pins the testdata inside the bounds
at every shipped scale factor, so the inner join is provably lossless
here — on a real deployment the same assertion belongs in the
expectations suite (plans/expectations.py) against the live dim range.
"""

from __future__ import annotations

import datetime
import glob
import os

import pytest

from etl_mini_dw_spark import fixtures_spec as spec

_SF_DIRS = sorted(
    d for d in glob.glob("/root/testdata/sf*") if os.path.isdir(d)
)


@pytest.mark.parametrize("sf_dir", _SF_DIRS, ids=[os.path.basename(d) for d in _SF_DIRS])
def test_order_and_ship_dates_inside_dim_range(sf_dir):
    import duckdb

    con = duckdb.connect()
    try:
        lo, hi = con.execute(
            f"""
            SELECT MIN(d), MAX(d) FROM (
                SELECT CAST(o_orderdate AS DATE) AS d
                FROM read_parquet('{sf_dir}/orders.parquet')
                UNION ALL
                SELECT CAST(l_shipdate AS DATE)
                FROM read_parquet('{sf_dir}/lineitem.parquet')
            )
            """
        ).fetchone()
    finally:
        con.close()
    start = datetime.date.fromisoformat(spec.DATE_START)
    end = datetime.date.fromisoformat(spec.DATE_END)
    assert start <= lo and hi <= end, (
        f"{sf_dir}: order/ship dates [{lo}, {hi}] escape DimDate range "
        f"[{start}, {end}] — the role-playing inner join would drop rows"
    )


def test_dormant_window_is_populated(spark, sf_dir):
    """ext_sales_opportunity's premise: this fixture has customers whose
    LAST order predates DORMANT_CUT (every customer has ordered at least
    once, so the literal Q22 'never ordered' would be empty — pinned
    here so a fixture change resurfaces the assumption)."""
    from pyspark.sql import functions as F

    from etl_mini_dw_spark.plans.classic import DORMANT_CUT
    from etl_mini_dw_spark.sources.tables import typed_table

    orders = typed_table(spark, sf_dir, "orders")
    last = orders.groupBy("o_custkey").agg(F.max("o_orderdate").alias("mx"))
    n_dormant = last.filter(F.col("mx") < DORMANT_CUT).count()
    n_never = (
        typed_table(spark, sf_dir, "customer")
        .join(
            orders.select(F.col("o_custkey").alias("c_custkey")).distinct(),
            "c_custkey",
            "left_anti",
        )
        .count()
    )
    assert n_never == 0  # the literal Q22 predicate IS empty here
    assert n_dormant > 0  # the recent-window variant is not
