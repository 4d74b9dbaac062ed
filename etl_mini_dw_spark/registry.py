"""Central query registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 (and every extension) gets:
- a ``QUERIES[name]`` callable ``(spark, sf_dir) -> DataFrame``
- an ``ORACLE_SQL[name]`` DuckDB-runnable equivalent (omitted only for
  genuinely non-SQL-expressible ops → driver does a rows-only check).

Column names/types are aligned on both sides (the driver sorts columns by
name and value-hashes), so every computed column is explicitly aliased and
cast identically in the DataFrame code and the SQL text.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_mini_dw_spark.plans import analytics

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def _register(name: str, fn: Callable[[SparkSession, str], DataFrame], sql: str | None) -> None:
    QUERIES[name] = fn
    if sql is not None:
        ORACLE_SQL[name] = sql


_register(
    "flagship_revenue_by_month_segment",
    analytics.flagship_revenue_by_month_segment,
    analytics.FLAGSHIP_ORACLE_SQL,
)
_register("q1_pricing_summary", analytics.q1_pricing_summary, analytics.Q1_ORACLE_SQL)
