"""Run every registered query against its DuckDB oracle at sf0.001.

This is the local replica of the driver's CORRECTNESS gate (BASELINE.md):
each ``queries()`` entry must hash-match its ``oracle_sql()`` entry.
"""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, duck_connection


def _cases():
    from etl_mini_dw_spark.registry import ORACLE_SQL, QUERIES

    return [(name, QUERIES[name], ORACLE_SQL.get(name)) for name in sorted(QUERIES)]


@pytest.mark.parametrize("name,fn,sql", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, sf_dir, name, fn, sql):
    df = fn(spark, sf_dir)
    if sql is None:
        # driver does a rows-only check for these
        assert df.count() >= 0
        return
    con = duck_connection(sf_dir)
    try:
        compare(df, con, sql, name)
    finally:
        con.close()
