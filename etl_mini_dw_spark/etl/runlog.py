"""Run log (SURVEY §2.11 X7; reference `code/SQL_1…sql:574–586,1012–1023`).

One row per run: name, start/end, rows inserted/updated/deleted,
SUCCESS/FAIL + error message. The reference counts via ``@@ROWCOUNT``;
here the loaders tag every output row with ``change_tag`` and the
orchestrator aggregates the tags in the same action that materializes the
table — metrics cost no extra pass over the data.

Scale notes: counters are LongType (a 100 TB fact load overflows int32),
and each run APPENDS one new parquet file to the log directory — O(1)
per run, never a read+rewrite of the whole history. The ``run_id``
max+1 read is a scan of a tiny metadata table (1 row/run), the same
scalar lookup the reference's IDENTITY performs.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_mini_dw_spark.etl.store import ParquetStore

RUNLOG_TABLE = "etl_run_log"

SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.LongType(), False),
        T.StructField("run_name", T.StringType(), False),
        T.StructField("start_time", T.TimestampType(), True),
        T.StructField("end_time", T.TimestampType(), True),
        T.StructField("rows_inserted", T.LongType(), True),
        T.StructField("rows_updated", T.LongType(), True),
        T.StructField("rows_deleted", T.LongType(), True),
        T.StructField("run_status", T.StringType(), True),
        T.StructField("run_error_message", T.StringType(), True),
    ]
)


def append(
    spark: SparkSession,
    store: ParquetStore,
    run_name: str,
    start_time: datetime,
    end_time: datetime,
    rows_inserted: int = 0,
    rows_updated: int = 0,
    rows_deleted: int = 0,
    status: str = "SUCCESS",
    error: str | None = None,
) -> None:
    """S8 literal-row append; run_id = IDENTITY replacement (max+1)."""
    next_id = 1
    if store.exists(RUNLOG_TABLE):
        next_id = (
            store.read(spark, RUNLOG_TABLE).agg(F.max("run_id")).first()[0] or 0
        ) + 1
    row = spark.createDataFrame(
        [
            (
                next_id,
                run_name,
                start_time,
                end_time,
                rows_inserted,
                rows_updated,
                rows_deleted,
                status,
                error,
            )
        ],
        SCHEMA,
    )
    # one new file per run — never a rewrite of the existing log
    row.write.mode("append").parquet(store.path(RUNLOG_TABLE))
