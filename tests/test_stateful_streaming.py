"""applyInPandasWithState sessionization: state across micro-batches."""

import datetime as dt

from pyspark.sql import functions as F

from compress_otel_collector_spark.streaming.stateful import (
    sessionize_stream,
)

BASE = dt.datetime(2026, 1, 1)


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, "user_id long, ts timestamp").write.mode(
        "append").parquet(path)


def test_sessionize_stream_state_across_batches(spark, tmp_path):
    input_dir = str(tmp_path / "events_in")
    out_dir = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "ckpt")

    def minutes(m):
        return BASE + dt.timedelta(minutes=m)

    # user 1: two sessions (gap > 1h between minute 10 and minute 100);
    # user 2: one long session
    _write_events(spark, input_dir, [
        (1, minutes(0)), (1, minutes(5)), (1, minutes(10)),
        (2, minutes(0)), (2, minutes(30)),
    ])
    _write_events(spark, input_dir, [
        (1, minutes(100)), (1, minutes(101)),
        (2, minutes(60)), (2, minutes(90)),
    ])

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = (
        sessionize_stream(stream, gap_sec=3600)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    sessions = spark.read.parquet(out_dir)
    rows = {(r["user_id"], r["n_events"]) for r in sessions.collect()}
    # user 1's first session (3 events) closed when minute-100 arrived;
    # user 2 never exceeded the gap → no closed session emitted yet
    assert (1, 3) in rows
    assert all(u != 2 for u, _ in rows)

    # a later event > 1h after user 2's last closes their session
    _write_events(spark, input_dir, [(2, minutes(600))])
    q = (
        sessionize_stream(
            spark.readStream.schema("user_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1).parquet(input_dir),
            gap_sec=3600)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {(r["user_id"], r["n_events"])
            for r in spark.read.parquet(out_dir).collect()}
    assert (2, 4) in rows  # minutes 0,30,60,90 closed as one session
