"""Parquet table store with atomic swap (SURVEY §7 hard-parts 1 & 7).

The reference mutates warehouse tables in place under BEGIN TRAN/COMMIT
(`code/SQL_1…sql:924–990`). Spark tables are immutable and Delta Lake is
not on this classpath, so the engine's write protocol is:

    compute full post-state lazily → write to a temp dir →
    rename current generation aside (``._old_*``) → rename temp into
    place → drop the old generation

A mid-run failure leaves the current generation readable — the same
all-or-nothing observable behavior as the reference's ROLLBACK. The swap
is two renames (not one atomic op); the only torn state is "final
missing, exactly one ``._old_*`` present" (crash between the renames),
which ``_recover`` detects and rolls back on the next read/exists/write.
``._tmp_*`` leftovers are in-flight writes that never committed and are
garbage-collected on the next write. At 100 TB the same protocol holds
per-table; on object stores you'd swap a manifest/metastore pointer
instead of a directory (exactly what Delta/Iceberg formalize — this
store is the minimal stand-in).
"""

from __future__ import annotations

import glob
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

    def _recover(self, name: str) -> None:
        """Roll a torn swap back to the previous generation.

        Crash window A (after ``final → old``, before ``tmp → final``):
        final is missing and exactly one ``._old_*`` holds the previous
        generation — restore it. Crash window B (after ``tmp → final``,
        before the old generation is dropped): final exists and the
        stranded ``._old_*`` is superseded — drop it.
        """
        final = self.path(name)
        olds = sorted(glob.glob(f"{final}._old_*"))
        if os.path.isdir(final):
            for old in olds:  # window B: superseded generations
                shutil.rmtree(old, ignore_errors=True)
        elif len(olds) == 1:  # window A: restore the previous generation
            os.rename(olds[0], final)

    def exists(self, name: str) -> bool:
        self._recover(name)
        return os.path.isdir(self.path(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        self._recover(name)
        return spark.read.parquet(self.path(name))

    def write(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> None:
        """Materialize ``df`` as the new generation of ``name``, atomically-ish."""
        self._recover(name)
        final = self.path(name)
        for stale in glob.glob(f"{final}._tmp_*"):  # uncommitted in-flight writes
            shutil.rmtree(stale, ignore_errors=True)
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
        if os.path.isdir(self.path(name)):
            shutil.rmtree(self.path(name), ignore_errors=True)
        for leftover in glob.glob(f"{self.path(name)}._old_*") + glob.glob(
            f"{self.path(name)}._tmp_*"
        ):
            shutil.rmtree(leftover, ignore_errors=True)
