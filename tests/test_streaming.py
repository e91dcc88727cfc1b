"""The streaming twin must converge to the batch result (same unresolved
plan, incremental execution)."""

from __future__ import annotations

from etl_master_spark.streaming.windows import events_hourly, events_hourly_stream


def test_stream_equals_batch(spark, sf_dir, tmp_path):
    stream = events_hourly_stream(spark, sf_dir)
    q = (
        stream.writeStream.format("memory")
        .queryName("events_hourly_stream_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["hour_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM events_hourly_stream_test").collect()
    }
    want = {
        (r["hour_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in events_hourly(spark, sf_dir).collect()
    }
    assert got == want
