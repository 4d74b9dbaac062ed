"""The spark.sql surface: registered views answer raw SQL correctly and
predicate pushdown survives the view boundary."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from etl_mini_dw_spark.api import register_warehouse_views


def test_views_register_and_answer_sql(spark, sf_dir):
    names = register_warehouse_views(spark, sf_dir)
    assert {"lineitem", "dim_date", "dim_customer", "mart_customer_current"} <= set(names)
    n = spark.sql("SELECT COUNT(*) FROM mart_customer_current").first()[0]
    assert n > 0
    # a join across layers through pure SQL
    row = spark.sql(
        """
        SELECT COUNT(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= DATE '1995-01-01'
        """
    ).first()
    assert row[0] > 0


def test_pushdown_survives_view_boundary(spark, sf_dir):
    """A filter written in SQL against the TYPED VIEW must still reach the
    parquet scan as a pushed filter."""
    register_warehouse_views(spark, sf_dir)
    df = spark.sql("SELECT l_quantity FROM lineitem WHERE l_shipdate <= DATE '1995-06-30'")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, plan[:2000]
