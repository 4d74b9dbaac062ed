"""Checkpoint-restart recovery: a streaming query stopped mid-stream and
restarted from the same checkpoint must land every source row exactly
once. The sink commits each micro-batch ATOMICALLY (write to a staging
dir, rename into place keyed by batch id): a kill that interrupts the
write leaves only staging debris, and the replayed batch overwrites it —
the same write-then-atomic-swap protocol as the store's MERGE sink. A
plain `mode("append")` sink provably fails this test (a mid-write kill
double-lands the replayed batch)."""

from __future__ import annotations

import os
import time

from etl_mini_dw_spark.sources.tables import events_ts_to_timestamp
from etl_mini_dw_spark.streaming.events import _sentinel_landing_dir


def test_restart_from_checkpoint_is_exactly_once(spark, sf_dir, tmp_path):
    landing = _sentinel_landing_dir(spark, sf_dir)
    out = tmp_path / "out"
    out.mkdir()
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
        final = out / f"b{batch_id}"
        if final.exists():  # replayed, already committed — idempotent skip
            return
        staging = out / f"tmp{batch_id}"
        batch_df.write.mode("overwrite").parquet(str(staging))
        os.rename(staging, final)  # atomic commit

    def _run(stop_after_first: bool):
        q = (
            _stream()
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(_sink)
            .start()
        )
        if stop_after_first:
            deadline = time.time() + 120
            while not (out / "b0").exists() and time.time() < deadline:
                time.sleep(0.2)
            q.stop()
        else:
            q.processAllAvailable()
            q.stop()

    _run(stop_after_first=True)  # killed mid-stream
    assert (out / "b0").exists(), "first batch never committed"
    _run(stop_after_first=False)  # resume from the same checkpoint

    committed = [str(p) for p in out.iterdir() if p.name.startswith("b")]
    got = [r.event_id for r in spark.read.parquet(*committed).collect()]
    expected = [
        r.event_id
        for r in spark.read.schema(raw_schema).parquet(f"{landing}/*.parquet").collect()
    ]
    assert sorted(got) == sorted(expected)  # every row exactly once
    assert len(got) == len(set(got))
