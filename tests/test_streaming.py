"""Structured Streaming pipeline: checkpointed, resumable, incremental."""

from pyspark.sql import functions as F

from compress_otel_collector_spark.plans.pipeline import read_routed
from compress_otel_collector_spark.sources.tables import synthetic_pages
from compress_otel_collector_spark.streaming.stream import (
    run_streaming_pipeline,
)


def test_streaming_drain_and_resume(spark, tmp_path):
    input_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    synthetic_pages(spark, 300, partitions=3).write.parquet(input_dir)
    run_streaming_pipeline(spark, input_dir, out_dir, ckpt)
    total1 = read_routed(spark, out_dir).agg(
        F.sum("n_spans")).collect()[0][0]
    assert total1 == 300

    # rerun with the same checkpoint → nothing reprocessed
    run_streaming_pipeline(spark, input_dir, out_dir, ckpt)
    total2 = read_routed(spark, out_dir).agg(
        F.sum("n_spans")).collect()[0][0]
    assert total2 == 300

    # new files arrive → only they are processed on the next drain
    synthetic_pages(spark, 100, partitions=1).withColumn(
        "doc_id", F.col("doc_id") + 1000
    ).write.mode("append").parquet(input_dir)
    run_streaming_pipeline(spark, input_dir, out_dir, ckpt)
    total3 = read_routed(spark, out_dir).agg(
        F.sum("n_spans")).collect()[0][0]
    assert total3 == 400


def test_stream_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: replaying a batch id must overwrite
    its own partitions, not append duplicates (dynamic partition overwrite
    on the leading batch_id column)."""
    from compress_otel_collector_spark.plans.pipeline import (
        encode_stage,
        enrich_stage,
        parse_stage,
        span_stage,
    )
    from compress_otel_collector_spark.streaming.stream import (
        route_stream_batch,
    )

    out_dir = str(tmp_path / "out")
    pages = synthetic_pages(spark, 120, partitions=2)
    spans = span_stage(enrich_stage(parse_stage(pages), spark))
    encoded = encode_stage(spans, n_salts=2, arms=False)

    route_stream_batch(encoded, out_dir, batch_id=0)
    total1 = read_routed(spark, out_dir).agg(F.sum("n_spans")).collect()[0][0]
    route_stream_batch(encoded, out_dir, batch_id=0)  # simulated replay
    total2 = read_routed(spark, out_dir).agg(F.sum("n_spans")).collect()[0][0]
    assert total1 == total2 == 120

    # a *new* batch id still appends
    route_stream_batch(encoded, out_dir, batch_id=1)
    total3 = read_routed(spark, out_dir).agg(F.sum("n_spans")).collect()[0][0]
    assert total3 == 240


def test_streaming_refuses_bucket_layout_mismatch(spark, tmp_path):
    """The streaming path honors the same bucket-layout meta marker as the
    batch path: resuming a sink with a different n_buckets must refuse."""
    import pytest

    input_dir = str(tmp_path / "pages_in2")
    out_dir = str(tmp_path / "out2")
    synthetic_pages(spark, 60, partitions=1).write.parquet(input_dir)
    run_streaming_pipeline(spark, input_dir, out_dir,
                           str(tmp_path / "ck1"), n_buckets=8)
    with pytest.raises(ValueError, match="bucket layouts"):
        run_streaming_pipeline(spark, input_dir, out_dir,
                               str(tmp_path / "ck2"), n_buckets=4)


def test_windowed_watermark_aggregation(spark, tmp_path):
    """Event-time windows + watermark over a real stream: the complete-mode
    drain must equal the batch computation; an append-mode drain emits only
    watermark-finalized windows (a subset)."""
    from compress_otel_collector_spark.streaming.stream import (
        windowed_route_counts,
    )

    import time as _time

    input_dir = str(tmp_path / "wpages")
    pages = synthetic_pages(spark, 500, partitions=4)
    # feed the stream in EVENT-TIME ORDER (warc_ts is monotone in doc_id;
    # chunks written sequentially so mtimes strictly increase and the file
    # source replays them in order). Out-of-order files are legitimate
    # watermark semantics — rows later than max-seen − watermark DROP, so
    # append-mode counts would be partial and the exact-subset assertion
    # below would flake (observed with tied mtimes).
    from pyspark.sql import functions as F
    for i in range(4):
        (pages.where((F.col("doc_id") >= i * 125)
                     & (F.col("doc_id") < (i + 1) * 125))
         .coalesce(1).write.mode("append").parquet(input_dir))
        _time.sleep(1.1)
    batch = {
        (r["window_start_us"], r["lang"], r["n_pages"])
        for r in windowed_route_counts(
            spark.read.parquet(input_dir)).collect()
    }
    assert len(batch) > 5

    stream = (
        spark.readStream.schema(spark.read.parquet(input_dir).schema)
        .option("maxFilesPerTrigger", 1).parquet(input_dir)
    )
    q = (
        windowed_route_counts(stream)
        .writeStream.format("memory").queryName("winagg")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["window_start_us"], r["lang"], r["n_pages"])
        for r in spark.sql("SELECT * FROM winagg").collect()
    }
    assert got == batch

    q2 = (
        windowed_route_counts(stream)
        .writeStream.format("memory").queryName("winagg_append")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q2.awaitTermination()
    finalized = {
        (r["window_start_us"], r["lang"], r["n_pages"])
        for r in spark.sql("SELECT * FROM winagg_append").collect()
    }
    # append emits only windows older than max-event-time - watermark
    assert finalized <= batch
    assert len(finalized) < len(batch)
