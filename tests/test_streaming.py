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
