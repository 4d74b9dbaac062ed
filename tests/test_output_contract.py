"""Driver-harness output contract for every registered query.

The external driver compares Spark vs DuckDB output through a
pandas-based canonicalizer that sorts every column; cells that are
Python lists/dicts (ArrayType, MapType, StructType) crash its
``sort_values`` (``TypeError: unhashable type: 'list'``), and raw
DATE / nanosecond-9999 timestamps break dtype alignment. Round 4 lost
its only driver row to exactly this: ``ext_token_postings`` projected a
raw ``array<bigint>`` even though every VALUE matched the oracle.

This test closes the CLASS, not the instance: every query that has an
oracle (i.e. participates in the compared-output path) must expose only
scalar, sortable column types. Queries without an ``oracle_sql`` entry
get a rows-only driver check, so container columns there are fine
(the multimodal pair intentionally returns binary/array payloads).

Schema inspection is lazy — ``fn(spark, sf_dir).schema`` builds the
plan without executing it — so this sweep is cheap even over all
registered queries.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

# Forbidden anywhere in a compared-output schema (including nested).
_FORBIDDEN = (T.ArrayType, T.MapType, T.StructType)


def _cases():
    from etl_mini_dw_spark.registry import ORACLE_SQL, QUERIES

    return [
        (name, QUERIES[name])
        for name in sorted(QUERIES)
        if ORACLE_SQL.get(name) is not None
    ]


def _violations(schema: T.StructType) -> list[str]:
    bad = []
    for field in schema.fields:
        dt = field.dataType
        if isinstance(dt, _FORBIDDEN):
            bad.append(f"{field.name}: {dt.simpleString()} (container)")
        elif isinstance(dt, T.DateType):
            bad.append(f"{field.name}: date (raw DATE breaks dtype align)")
        elif isinstance(dt, T.BinaryType):
            bad.append(f"{field.name}: binary (bytes cells are not portable)")
    return bad


@pytest.mark.parametrize("name,fn", _cases(), ids=[c[0] for c in _cases()])
def test_compared_output_schema_is_driver_safe(spark, sf_dir, name, fn):
    df = fn(spark, sf_dir)
    bad = _violations(df.schema)
    assert not bad, (
        f"{name} exposes driver-unsafe column types in compared output: "
        f"{bad} — stringify (array_join/concat_ws Spark-side, "
        f"array_to_string DuckDB-side) or project through _ts_as_str"
    )
