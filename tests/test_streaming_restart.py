"""Checkpoint-restart recovery: a streaming query stopped mid-stream and
restarted from the same checkpoint must process every source row exactly
once through an idempotent (batch-id-guarded) foreachBatch sink."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from etl_mini_dw_spark.sources.tables import events_ts_to_timestamp
from etl_mini_dw_spark.streaming.events import _sentinel_landing_dir


def test_restart_from_checkpoint_is_exactly_once(spark, sf_dir, tmp_path):
    landing = _sentinel_landing_dir(spark, sf_dir)
    out = str(tmp_path / "out")
    markers = tmp_path / "applied"
    markers.mkdir()
    ckpt = str(tmp_path / "ckpt")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def _stream():
        return (
            spark.readStream.schema(raw_schema)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "*.parquet")
            .parquet(landing)
            .transform(events_ts_to_timestamp)
            .select("event_id")
        )

    def _sink(batch_df, batch_id):
        marker = markers / str(batch_id)
        if marker.exists():  # replayed batch after restart — skip
            return
        batch_df.write.mode("append").parquet(out)
        marker.touch()

    # run 1: stop after the FIRST batch commits (mid-stream)
    q = (
        _stream()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(_sink)
        .start()
    )
    deadline = time.time() + 120
    while not (markers / "0").exists() and time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    assert (markers / "0").exists(), "first batch never committed"

    # run 2: same checkpoint — must pick up the remaining files only
    q2 = (
        _stream()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(_sink)
        .start()
    )
    q2.processAllAvailable()
    q2.stop()

    got = [r.event_id for r in spark.read.parquet(out).collect()]
    expected = [
        r.event_id
        for r in spark.read.schema(raw_schema).parquet(f"{landing}/*.parquet").collect()
    ]
    assert sorted(got) == sorted(expected)  # every row exactly once
    assert len(got) == len(set(got))
