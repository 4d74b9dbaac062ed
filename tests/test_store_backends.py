"""Store-backend seam: keyed MERGE semantics + the Delta gate.

`merge_upsert` must behave identically on every backend: rows in the
delta replace same-key current rows, unmatched current rows survive,
new keys insert (the reference's UPDATE-from-join + INSERT pair,
`code/SQL_1…sql:924–990`, as one call). The Delta backend exercises the
same contract through a native MERGE INTO when delta-spark is on the
classpath; in this container it is not AND cannot be (package installs
are prohibited in this environment — verified r8, not just "absent"),
so those tests skip permanently here: the parquet path carries the full
contract (including the crash-safety sweep in test_store_crash_safety),
and the DeltaStore call shapes are compile-checked by import. On any
deployment with delta-spark installed, the skips lift automatically and
the same assertions run against the Delta commit log.
"""

from __future__ import annotations

import pytest

from etl_mini_dw_spark.etl.store import (
    DeltaStore,
    ParquetStore,
    delta_available,
    make_store,
)


@pytest.fixture()
def store(tmp_path):
    return ParquetStore(str(tmp_path / "store"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, grp string, v double")


def test_merge_upsert_bootstraps_missing_table(spark, store):
    store.merge_upsert(spark, _df(spark, [(1, "a", 1.0)]), "t", ["k"])
    assert store.read(spark, "t").count() == 1


def test_merge_upsert_updates_inserts_and_preserves(spark, store):
    store.write(_df(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)]), "t")
    store.merge_upsert(spark, _df(spark, [(2, "a", 20.0), (4, "b", 4.0)]), "t", ["k"])
    got = {r["k"]: r["v"] for r in store.read(spark, "t").collect()}
    assert got == {1: 1.0, 2: 20.0, 3: 3.0, 4: 4.0}


def test_merge_upsert_composite_key(spark, store):
    store.write(_df(spark, [(1, "a", 1.0), (1, "b", 2.0)]), "t")
    store.merge_upsert(spark, _df(spark, [(1, "b", 20.0)]), "t", ["k", "grp"])
    got = {(r["k"], r["grp"]): r["v"] for r in store.read(spark, "t").collect()}
    assert got == {(1, "a"): 1.0, (1, "b"): 20.0}


def test_merge_upsert_is_idempotent(spark, store):
    store.write(_df(spark, [(1, "a", 1.0)]), "t")
    delta = _df(spark, [(1, "a", 10.0), (2, "a", 2.0)])
    store.merge_upsert(spark, delta, "t", ["k"])
    first = sorted(map(tuple, store.read(spark, "t").collect()))
    store.merge_upsert(spark, delta, "t", ["k"])
    assert sorted(map(tuple, store.read(spark, "t").collect())) == first


def test_make_store_backend_selection(tmp_path):
    assert isinstance(make_store(str(tmp_path / "p"), "parquet"), ParquetStore)
    with pytest.raises(ValueError):
        make_store(str(tmp_path / "x"), "iceberg")
    if not delta_available():
        with pytest.raises(ImportError):
            make_store(str(tmp_path / "d"), "delta")
        # auto falls back to parquet when the bindings are absent
        assert type(make_store(str(tmp_path / "a"), "auto")) is ParquetStore


@pytest.mark.skipif(not delta_available(), reason="delta-spark not on classpath")
def test_delta_merge_upsert(spark, tmp_path):
    store = DeltaStore(str(tmp_path / "delta"))
    store.write(_df(spark, [(1, "a", 1.0), (2, "a", 2.0)]), "t")
    store.merge_upsert(spark, _df(spark, [(2, "a", 20.0), (3, "b", 3.0)]), "t", ["k"])
    got = {r["k"]: r["v"] for r in store.read(spark, "t").collect()}
    assert got == {1: 1.0, 2: 20.0, 3: 3.0}


@pytest.mark.skipif(not delta_available(), reason="delta-spark not on classpath")
def test_warehouse_on_delta_backend(spark, sf_dir, tmp_path):
    from etl_mini_dw_spark.etl.orchestrate import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"), sf_dir, backend="delta")
    wh.init()
    wh.run_all()
    assert wh.missing_tables() == []


def test_compact_reduces_files_and_preserves_values(spark, store):
    df = spark.range(10_000).selectExpr(
        "cast(id as int) k", "cast(id % 7 as string) grp", "cast(id as double) v"
    )
    store.write(df.repartition(40), "t")
    assert len(store.data_files("t")) == 40
    before, after = store.compact(spark, "t", target_file_bytes=256 * 2**20)
    assert before == 40 and after < 5
    got = store.read(spark, "t")
    assert got.count() == 10_000
    assert got.selectExpr("sum(v)").first()[0] == sum(range(10_000))


def test_compact_noop_when_already_compact(spark, store):
    store.write(spark.range(100).selectExpr("id k").coalesce(1), "t")
    before, after = store.compact(spark, "t")
    assert (before, after) == (1, 1)


def test_write_clustered_files_are_disjoint_on_cluster_key(spark, store):
    import pyarrow.parquet as pq

    df = spark.range(50_000).selectExpr("cast(id * 37 % 50000 as bigint) ck", "id v")
    store.write_clustered(df, "t", ["ck"], n_files=8)
    files = store.data_files("t")
    assert len(files) == 8
    # footer min/max per file — the zone map a skipping reader prunes on
    ranges = []
    total = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        lo = min(md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups))
        total += md.num_rows
        ranges.append((lo, hi))
    assert total == 50_000
    ranges.sort()
    for (_, hi_a), (lo_b, _) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b  # pairwise disjoint ⇒ any point predicate hits ONE file


def test_delete_keys_removes_only_matches(spark, store):
    store.write(_df(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)]), "t")
    store.delete_keys(spark, "t", spark.createDataFrame([(2,), (9,)], "k int"), ["k"])
    got = sorted(r["k"] for r in store.read(spark, "t").collect())
    assert got == [1, 3]


def test_delete_keys_missing_table_is_noop(spark, store):
    store.delete_keys(spark, "nope", spark.createDataFrame([(1,)], "k int"), ["k"])
    assert not store.exists("nope")


def test_idempotent_foreach_batch_skips_replayed_ids(spark, store, tmp_path):
    from etl_mini_dw_spark.etl.store import IdempotentForeachBatch

    applied = []

    def fn(batch_df, batch_id):
        applied.append(batch_id)
        store.merge_upsert(spark, batch_df, "t", ["k"])

    sink = IdempotentForeachBatch(str(tmp_path / "commits"), fn)
    b0 = _df(spark, [(1, "a", 1.0)])
    sink(b0, 0)
    sink(b0, 0)  # streaming replay after restart: same batch id
    sink(_df(spark, [(2, "a", 2.0)]), 1)
    assert applied == [0, 1]
    assert sink.skipped == [0]
    assert store.read(spark, "t").count() == 2
