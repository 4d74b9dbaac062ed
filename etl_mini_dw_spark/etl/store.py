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

    def write(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None = None,
        keep_generations: int = 0,
    ) -> None:
        """Materialize ``df`` as the new generation of ``name``, atomically-ish.

        ``keep_generations=N`` retains the last N superseded generations as
        dot-prefixed snapshot dirs (invisible to Spark's file listing) —
        the parquet backend's time travel, matching Delta's ``versionAsOf``
        capability behind the same seam (`read_generation`). Snapshot dirs
        are named by a monotonic counter, never a clock, so retention is
        deterministic and replay-safe.
        """
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
            if keep_generations > 0:
                gens = self.generations(name)
                nxt = int(os.path.basename(gens[-1]).rsplit("_", 1)[1]) + 1 if gens else 1
                os.rename(old, f"{final}._gen_{nxt:06d}")
            else:
                shutil.rmtree(old, ignore_errors=True)
        if keep_generations > 0:
            # prune only under an explicit retention policy: a default
            # write must not wipe snapshots another caller retained
            self._prune_generations(name, keep_generations)

    def generations(self, name: str) -> list[str]:
        """Retained past-generation dirs, oldest → newest."""
        return sorted(glob.glob(f"{self.path(name)}._gen_*"))

    def read_generation(self, spark: SparkSession, name: str, back: int = 1) -> DataFrame:
        """Time travel: the table state ``back`` swaps ago (0 = current).

        Only generations written with ``keep_generations`` are reachable;
        asking past the retention horizon raises — silently serving the
        oldest RETAINED state would misreport history.
        """
        if back == 0:
            return self.read(spark, name)
        gens = self.generations(name)
        if back > len(gens):
            raise ValueError(f"only {len(gens)} retained generations, asked back={back}")
        return spark.read.parquet(gens[-back])

    def _prune_generations(self, name: str, keep: int) -> None:
        gens = self.generations(name)
        drop = gens if keep <= 0 else gens[:-keep]
        for g in drop:
            shutil.rmtree(g, ignore_errors=True)

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
        for leftover in (
            glob.glob(f"{self.path(name)}._old_*")
            + glob.glob(f"{self.path(name)}._tmp_*")
            + glob.glob(f"{self.path(name)}._gen_*")
        ):
            shutil.rmtree(leftover, ignore_errors=True)

    def data_files(self, name: str) -> list[str]:
        """Paths of the table's parquet data files (recursing into
        partition dirs; dot-prefixed swap dirs are invisible by glob)."""
        self._recover(name)
        final = self.path(name)
        return sorted(
            f
            for f in glob.glob(os.path.join(final, "**", "*.parquet"), recursive=True)
            if "._old" not in f and "._tmp" not in f
        )

    def compact(
        self, spark: SparkSession, name: str, target_file_bytes: int = 128 * 2**20
    ) -> tuple[int, int]:
        """Small-file compaction: rewrite the table into
        ``ceil(total_bytes / target_file_bytes)`` files via ``coalesce``
        (no shuffle — coalesce only glues scan splits together) and the
        same atomic swap as ``write``. Returns (files_before, files_after).

        The 100 TB operational reality this serves: streaming sinks and
        per-batch MERGEs accrete thousands of KB-scale files per table,
        and scan cost becomes file-open-bound. Production (Delta
        ``OPTIMIZE``) bin-packs per partition with a commit log;
        this is the same rewrite with directory-swap atomicity. No-op
        (zero rewrite cost) when the table already meets the target.
        """
        files = self.data_files(name)
        total = sum(os.path.getsize(f) for f in files)
        n_target = max(1, -(-total // target_file_bytes))
        if n_target >= len(files):
            return (len(files), len(files))
        # post-state must be materialized before the swap unlinks its input
        post = self.read(spark, name).coalesce(n_target).localCheckpoint()
        self.write(post, name)
        return (len(files), len(self.data_files(name)))

    def write_clustered(
        self, df: DataFrame, name: str, cluster_by: list[str], n_files: int
    ) -> None:
        """Clustered write: range-partition on ``cluster_by`` into
        ``n_files`` output files, sorted within each — the production
        Z-order/data-skipping write path. Each file's footer min/max on
        the cluster columns is tight and files are pairwise ~disjoint,
        so a reader's skip predicate prunes whole files
        (``plans/layout.py`` computes the resulting zone map).
        repartitionByRange samples the keys for balanced bounds — one
        shuffle, no global sort."""
        out = df.repartitionByRange(n_files, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
        self.write(out, name)

    def merge_upsert(
        self, spark: SparkSession, df: DataFrame, name: str, keys: list[str]
    ) -> None:
        """Keyed MERGE (upsert): rows in ``df`` replace same-key rows in the
        table; all other current rows survive; new keys insert.

        Parquet has no row-level commit log, so the merge is
        read-current → anti-join out the touched keys → union the new
        image → atomic swap. Correct and all-or-nothing, but cost is
        ∝ table size, not ∝ delta size — the structural reason a 100 TB
        warehouse wants a transactional format: ``DeltaStore`` below
        expresses the SAME call as a log-commit MERGE whose rewrite cost
        is ∝ touched files. Callers write to the seam; the backend choice
        is deployment config (`make_store`).
        """
        if not self.exists(name):
            self.write(df, name)
            return
        current = self.read(spark, name)
        post = current.join(df.select(*keys).distinct(), keys, "left_anti").unionByName(df)
        # localCheckpoint: the post-state must be fully computed BEFORE the
        # swap renames the generation it is reading from out from under it
        self.write(post.localCheckpoint(), name)

    def delete_keys(
        self, spark: SparkSession, name: str, keys_df: DataFrame, keys: list[str]
    ) -> None:
        """Keyed DELETE (the right-to-be-forgotten seam): remove every row
        whose key appears in ``keys_df``; everything else survives.

        Parquet path: read-current → anti-join → atomic swap (cost ∝
        table, same structural limit as ``merge_upsert`` and the same
        reason production wants the Delta backend, where this call is a
        commit-log ``DELETE WHERE`` rewriting only matched files). The
        anti-join broadcasts when the key set is small — the common
        erasure-request shape.
        """
        if not self.exists(name):
            return
        current = self.read(spark, name)
        post = current.join(keys_df.select(*keys).distinct(), keys, "left_anti")
        self.write(post.localCheckpoint(), name)


def delta_available() -> bool:
    """True iff the delta-spark bindings are importable on this classpath."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    return True


class DeltaStore(ParquetStore):
    """Same store contract on a Delta Lake table layout (SURVEY §7 #9).

    Inherits the directory layout/paths; replaces the rename-swap
    protocol with Delta's transaction log: ``write`` is a single
    ACID overwrite commit, ``merge_upsert`` is a native ``MERGE INTO``
    (rewrites only the files holding matched keys — cost ∝ delta, the
    100 TB answer), ``swap_partitions`` is ``replaceWhere`` (partition
    overwrite as one commit, no rename windows to recover). Concurrent
    writers serialize through optimistic commit-log conflict checks —
    the property the parquet swap cannot give.

    Requires delta-spark on the classpath (not available in this
    container — import-gated; tests skip, the seam and call shapes are
    exercised against ParquetStore which shares the contract).
    """

    def __init__(self, base_dir: str) -> None:
        if not delta_available():
            raise ImportError("delta-spark is not on this classpath; use ParquetStore")
        super().__init__(base_dir)

    def _recover(self, name: str) -> None:  # Delta's log makes torn swaps impossible
        return None

    def exists(self, name: str) -> bool:
        return os.path.isdir(os.path.join(self.path(name), "_delta_log"))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.format("delta").load(self.path(name))

    def write(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> None:
        writer = df.write.format("delta").mode("overwrite").option(
            "overwriteSchema", "true"
        )
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(self.path(name))

    def swap_partitions(
        self, df: DataFrame, name: str, partition_col: str, values: list
    ) -> None:
        assert values, "swap_partitions requires a non-empty touched set"
        in_list = ", ".join(repr(v) for v in values)
        (
            df.write.format("delta")
            .mode("overwrite")
            .option("replaceWhere", f"{partition_col} IN ({in_list})")
            .save(self.path(name))
        )

    def compact(
        self, spark: SparkSession, name: str, target_file_bytes: int = 128 * 2**20
    ) -> tuple[int, int]:
        """Delta bin-packing compaction: one OPTIMIZE commit, readers
        never see a partial rewrite and concurrent appends conflict-check
        against the commit log instead of racing a directory rename."""
        from delta.tables import DeltaTable
        from pyspark.sql import functions as F

        def snapshot_files() -> int:  # on-disk files include pre-VACUUM history
            return self.read(spark, name).select(F.input_file_name()).distinct().count()

        before = snapshot_files()
        spark.conf.set("spark.databricks.delta.optimize.maxFileSize", str(target_file_bytes))
        DeltaTable.forPath(spark, self.path(name)).optimize().executeCompaction()
        return (before, snapshot_files())

    def merge_upsert(
        self, spark: SparkSession, df: DataFrame, name: str, keys: list[str]
    ) -> None:
        if not self.exists(name):
            self.write(df, name)
            return
        from delta.tables import DeltaTable

        cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
        (
            DeltaTable.forPath(spark, self.path(name))
            .alias("t")
            .merge(df.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )

    def delete_keys(
        self, spark: SparkSession, name: str, keys_df: DataFrame, keys: list[str]
    ) -> None:
        """Commit-log DELETE: rewrites only the files holding matched
        keys — erasure cost ∝ matches, the 100 TB answer."""
        if not self.exists(name):
            return
        from delta.tables import DeltaTable

        cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
        (
            DeltaTable.forPath(spark, self.path(name))
            .alias("t")
            .merge(keys_df.select(*keys).distinct().alias("s"), cond)
            .whenMatchedDelete()
            .execute()
        )


def make_store(base_dir: str, backend: str = "auto") -> ParquetStore:
    """Store factory: ``parquet`` | ``delta`` | ``auto`` (delta if importable)."""
    if backend == "delta" or (backend == "auto" and delta_available()):
        return DeltaStore(base_dir)
    if backend not in ("auto", "parquet"):
        raise ValueError(f"unknown store backend: {backend!r}")
    return ParquetStore(base_dir)


class IdempotentForeachBatch:
    """Exactly-once-effective ``foreachBatch`` wrapper.

    Structured Streaming guarantees at-least-once delivery to
    ``foreachBatch``: after a restart the last micro-batch is REPLAYED
    with the same ``batch_id``, and Spark's own docs put the dedup
    burden on the sink. This wrapper records committed batch ids as
    marker files; a replayed id is skipped. The marker is written AFTER
    the wrapped function returns, so the one remaining torn window
    (crash between apply and marker) re-applies the batch — which is
    why the wrapped operation should be idempotent by key (a keyed
    ``merge_upsert`` is): guard + keyed MERGE = exactly-once effect.
    At scale the marker dir lives next to the checkpoint on the same
    object store; one tiny file per batch.
    """

    def __init__(self, commits_dir: str, fn) -> None:
        self.commits_dir = commits_dir
        self.fn = fn
        self.skipped: list[int] = []
        os.makedirs(commits_dir, exist_ok=True)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.commits_dir, f"{batch_id}.done")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._marker(batch_id)):
            self.skipped.append(batch_id)
            return
        self.fn(batch_df, batch_id)
        open(self._marker(batch_id), "w").close()
