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
        stranded ``._old_*`` is superseded — drop it. Partition-level
        swaps (``swap_partitions``) leave ``._oldpart_<sub>`` dirs INSIDE
        the table dir (leading dot ⇒ invisible to Spark's file listing);
        the sub name encodes the partition dir, so the same two windows
        are recovered per partition.
        """
        final = self.path(name)
        olds = sorted(glob.glob(f"{final}._old_*"))
        if os.path.isdir(final):
            for old in olds:  # window B: superseded generations
                shutil.rmtree(old, ignore_errors=True)
        elif len(olds) == 1:  # window A: restore the previous generation
            os.rename(olds[0], final)
        for old in glob.glob(os.path.join(final, "._oldpart_*")):
            sub = os.path.basename(old)[len("._oldpart_"):]
            dst = os.path.join(final, sub)
            if os.path.isdir(dst):  # window B (partition)
                shutil.rmtree(old, ignore_errors=True)
            else:  # window A (partition)
                os.rename(old, dst)

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

    def swap_partitions(
        self, df: DataFrame, name: str, partition_col: str, values: list
    ) -> None:
        """MERGE-shaped write: replace ONLY the partition directories named
        in ``values`` with ``df``'s rows (``df`` must hold exactly those
        partitions' post-state). Untouched partitions are not read, not
        rewritten, not even listed — the poor-man's `MERGE INTO` whose
        cost is ∝ touched partitions, which is what makes an incremental
        fact load feasible when the table is 100 TB and the delta touches
        three days. Per-partition swap uses the same rename protocol as
        ``write`` (see ``_recover`` for the torn windows); cross-partition
        atomicity is what a real table format's commit log would add.
        """
        assert values, "swap_partitions requires a non-empty touched set"
        self._recover(name)
        final = self.path(name)
        tmp = f"{final}._tmp_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)
        for v in values:
            sub = f"{partition_col}={v}"
            src = os.path.join(tmp, sub)
            if not os.path.isdir(src):
                continue  # delta claimed the partition but produced no rows
            dst = os.path.join(final, sub)
            old = os.path.join(final, f"._oldpart_{sub}")
            if os.path.isdir(dst):
                os.rename(dst, old)
            os.rename(src, dst)
            if os.path.isdir(old):
                shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)

    def drop(self, name: str) -> None:
        if os.path.isdir(self.path(name)):
            shutil.rmtree(self.path(name), ignore_errors=True)
        for leftover in glob.glob(f"{self.path(name)}._old_*") + glob.glob(
            f"{self.path(name)}._tmp_*"
        ):
            shutil.rmtree(leftover, ignore_errors=True)
