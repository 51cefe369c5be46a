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


def test_stream_equals_batch_sessionize_on_events_table(spark, sf_dir,
                                                        tmp_path):
    """Stream ≡ batch: draining the real events table through the stateful
    sessionizer (3 sequential availableNow runs over time-ordered file
    chunks, state checkpointed across runs) must emit exactly the sessions
    the batch window derivation closes — every session except each user's
    last (still open at drain end). Same pattern as windowed_counts'
    stream≡batch gate, extended to the custom stateful operator."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from compress_otel_collector_spark.sources.tables import load_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))

    # batch side: 1h-gap sessions per user via window functions
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = ts_us - F.lag(ts_us, 1).over(w)
    flagged = ev.withColumn("ts_us", ts_us).withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 3600 * 1_000_000), 1).otherwise(0))
    sess_id = F.sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    sessions = (
        flagged.withColumn("sid", sess_id)
        .groupBy("user_id", "sid")
        .agg(F.min("ts_us").alias("session_start_us"),
             F.max("ts_us").alias("session_end_us"),
             F.count("*").alias("n_events"))
    )
    last_sid = sessions.groupBy("user_id").agg(F.max("sid").alias("sid"))
    closed_batch = sessions.join(last_sid, ["user_id", "sid"], "left_anti")
    want = {(r["user_id"], r["session_start_us"], r["session_end_us"],
             r["n_events"]) for r in closed_batch.collect()}

    # stream side: 3 time-ordered chunks, one availableNow drain each —
    # the checkpoint carries open-session state across the runs
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    import datetime as dt
    step = (hi - lo) / 3
    cuts = [lo + step, lo + 2 * step, hi + dt.timedelta(seconds=1)]
    input_dir = str(tmp_path / "events_in")
    out_dir = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "ckpt")
    prev = None
    for cut in cuts:
        chunk = ev.where(
            (F.col("ts") <= cut)
            & ((F.lit(prev).cast("timestamp").isNull())
               if prev is None else (F.col("ts") > prev)))
        chunk.coalesce(1).write.mode("append").parquet(input_dir)
        q = (
            sessionize_stream(
                spark.readStream.schema("user_id long, ts timestamp")
                .parquet(input_dir),
                gap_sec=3600)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        prev = cut

    got = {(r["user_id"], r["session_start_us"], r["session_end_us"],
            r["n_events"])
           for r in spark.read.parquet(out_dir).collect()}
    assert got == want
