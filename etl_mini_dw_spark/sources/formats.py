"""Landing-file format seam: CSV / JSON-lines ingest next to parquet.

The reference ingests from live OLTP tables only; a Spark warehouse also
lands flat files. Rules baked in (and tested by round-trip):

- **Schemas are explicit, never inferred.** Inference reads the data
  twice and silently drifts types between landings (a 100 TB anti-
  pattern and a correctness bug: a date column inferred as string on a
  malformed landing poisons every downstream cast). Callers pass the
  DDL string; `spark.read.schema(...)` streams the file once.
- **Malformed rows are quarantined, not dropped**: PERMISSIVE mode with
  ``columnNameOfCorruptRecord`` keeps bad lines inspectable
  (`read_csv(..., keep_corrupt=True)`), so a poisoned landing is a
  filter away from both repair and alerting.
- **Writers mirror readers** (header CSV, lines JSON) so a round trip
  is loss-free for the supported types; timestamps serialize ISO-8601
  in UTC (session tz is pinned by `_ensure_session_confs`).

These are thin, deliberately: the value is the contract, and that the
rest of the engine (`typed_table` casts, staging views, every operator)
composes with any source the seam returns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_mini_dw_spark.sources.tables import _ensure_session_confs

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    *,
    header: bool = True,
    delimiter: str = ",",
    keep_corrupt: bool = False,
) -> DataFrame:
    """Explicit-schema CSV scan; malformed rows quarantined to
    ``_corrupt_record`` when ``keep_corrupt`` (else NULL-filled)."""
    _ensure_session_confs(spark)
    schema = schema_ddl + (f", {CORRUPT_COL} string" if keep_corrupt else "")
    reader = (
        spark.read.schema(schema)
        .option("header", header)
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
    )
    if keep_corrupt:
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, *, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", header).csv(path)


def read_jsonl(
    spark: SparkSession, path: str, schema_ddl: str, *, keep_corrupt: bool = False
) -> DataFrame:
    """Explicit-schema JSON-lines scan (one object per line — the only
    JSON layout that splits across executors; multiline JSON is a
    single-task read and is deliberately not offered here)."""
    _ensure_session_confs(spark)
    schema = schema_ddl + (f", {CORRUPT_COL} string" if keep_corrupt else "")
    reader = spark.read.schema(schema).option("mode", "PERMISSIVE")
    if keep_corrupt:
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — columnar like parquet (schema travels in the file, so
    no DDL needed); predicate pushdown and column pruning apply the
    same way. The other columnar landing format a warehouse inherits."""
    _ensure_session_confs(spark)
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_parquet_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """Read landings whose schemas evolved (columns added over time):
    ``mergeSchema`` unions the footer schemas, older files yield NULL for
    later-added columns. The ONLY schema flexibility this seam offers —
    type CHANGES still fail loudly (by design: silent coercion poisons
    downstream casts; an evolved landing adds columns, it never mutates
    them). Merge cost is footer-only, not data."""
    _ensure_session_confs(spark)
    return spark.read.option("mergeSchema", "true").parquet(*paths)
