"""Focused tests for the r09 streaming-machinery knobs
(etl_mini_dw_spark/streaming/machinery.py): state-sized stream shuffle
partitions and tmpfs-preferring scratch dirs. These are optimization
internals — values of the streaming queries themselves are pinned by
tests/test_oracle_parity.py."""

from __future__ import annotations

import os

from etl_mini_dw_spark.streaming import machinery


def test_stream_shuffle_sets_and_restores(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_STREAM_SHUFFLE", raising=False)
    before = spark.conf.get("spark.sql.shuffle.partitions")
    expect = max(1, min(8, spark.sparkContext.defaultParallelism))
    with machinery.stream_shuffle(spark):
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(expect)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_stream_shuffle_restores_on_error(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        with machinery.stream_shuffle(spark):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_stream_shuffle_env_override(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE", "3")
    assert machinery.stream_shuffle_partitions(spark) == 3


def test_scratch_dir_env_override(monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_TMP", str(tmp_path))
    d = machinery.scratch_dir("unit_test_")
    assert d.startswith(str(tmp_path))
    assert os.path.isdir(d)


def test_scratch_dir_unique_per_call(monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_TMP", str(tmp_path))
    assert machinery.scratch_dir("a_") != machinery.scratch_dir("a_")


def test_stream_shuffle_env_clamped_to_one(spark, monkeypatch):
    # ADVICE r9: '0' or a negative value must not set an invalid
    # spark.sql.shuffle.partitions
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE", "0")
    assert machinery.stream_shuffle_partitions(spark) == 1
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE", "-4")
    assert machinery.stream_shuffle_partitions(spark) == 1


def test_stream_shuffle_env_non_integer_raises_clear(spark, monkeypatch):
    import pytest

    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE", "lots")
    with pytest.raises(ValueError, match="SPARK_GRAFT_STREAM_SHUFFLE"):
        machinery.stream_shuffle_partitions(spark)


def test_scratch_dir_skips_full_shm(monkeypatch, tmp_path):
    # ADVICE r9: a small/full /dev/shm must fall back to the system
    # tempdir instead of ENOSPC-ing mid-query
    monkeypatch.delenv("SPARK_GRAFT_STREAM_TMP", raising=False)
    monkeypatch.setattr(machinery, "_shm_usable", lambda path="/dev/shm": False)
    monkeypatch.setattr(
        machinery.tempfile, "gettempdir", lambda: str(tmp_path)
    )
    d = machinery.scratch_dir("unit_full_shm_")
    assert not d.startswith("/dev/shm")
    assert os.path.isdir(d)


def test_scratch_purges_only_stale_entries(monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_TMP", str(tmp_path))
    stale = tmp_path / "old_run"
    stale.mkdir()
    old = 2 * machinery._PURGE_AGE_SECONDS
    os.utime(stale, (os.path.getmtime(stale) - old, os.path.getmtime(stale) - old))
    fresh = tmp_path / "live_run"
    fresh.mkdir()
    machinery.scratch_dir("unit_purge_")
    assert not stale.exists()
    assert fresh.exists()
