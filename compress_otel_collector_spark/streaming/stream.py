"""Structured Streaming wrapper for the encode pipeline.

The reference collector is itself a streaming system (OTLP receiver →
batch processor → exporter, SURVEY.md §3.1) whose state is per-batch only —
diff/pool state resets every ``Encode()`` call. That maps exactly onto
``foreachBatch``: each micro-batch runs the same parse → enrich → encode →
route stages, blobs stay batch-scoped, and Spark's checkpoint gives the
collector's missing resumability (exactly-once sink appends per batch id).

``trigger(availableNow=True)`` drains whatever input exists and stops — the
batch/stream unification point: the same job is a backfill today and a
continuous tailer in production. No event-time watermarks are needed
(north_rule: resumability = checkpoint + lineage, not late-data windows);
the aggregate stage is recomputed from the routed sink, not kept as
streaming state.

``foreachBatch`` is at-least-once: a crash after the sink write but before
the checkpoint commit replays the batch. The sink is therefore written with
the batch id as the leading partition column under **dynamic partition
overwrite** — a replayed batch overwrites exactly its own partitions instead
of appending duplicates, which makes the routed output effectively
exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import (
    _read_meta,
    _write_meta,
    encode_pages,
    enrich_stage,
    parse_stage,
)
from ..sources.tables import synthetic_pages


def route_stream_batch(encoded: DataFrame, out_dir: str,
                       batch_id: int) -> None:
    """Idempotent routed-sink write for one micro-batch.

    ``batch_id`` is the leading partition column and the write uses dynamic
    partition overwrite, so replaying a batch (foreachBatch's at-least-once
    contract) replaces its own partitions byte-for-byte instead of appending
    duplicate blobs. At cluster scale this is the same guarantee an Iceberg
    ``overwritePartitions`` snapshot commit gives.
    """
    (
        encoded.withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id", "lang", "host_bucket")
        .parquet(f"{out_dir}/routed")
    )


def pages_stream(spark: SparkSession, input_dir: str,
                 max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream over a pages parquet directory."""
    schema = synthetic_pages(spark, 0).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def run_streaming_pipeline(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 8,
    n_salts: int = 4,
    arms: bool = False,
    dedup_horizon: str | None = None,
):
    """Drain the input with availableNow; resumable via checkpoint.

    Each micro-batch runs the full stage chain and writes the routed sink
    idempotently (see ``route_stream_batch``) — rerunning after a crash
    replays only unprocessed files, and a replayed batch overwrites rather
    than duplicates. Returns the terminated StreamingQuery.

    ``dedup_horizon`` (e.g. ``"1 hour"``) inserts the
    :func:`dedup_pages_stream` stage before the encode chain: crawler
    re-deliveries of the same text within the event-time horizon are
    dropped ACROSS micro-batches, with the dedup state store riding the
    same checkpoint as the file-source offsets — a resumed job neither
    re-emits already-kept pages nor forgets which texts it saw.
    """
    # same bucket-layout guard as the batch path: resuming a sink with a
    # different n_buckets would silently split routes across two bucketings
    meta_path = f"{out_dir.rstrip('/')}/_pipeline_meta.json"
    prior = _read_meta(spark, meta_path)
    if prior is not None:
        if prior.get("n_buckets") != n_buckets:
            raise ValueError(
                f"sink at {out_dir} was written with n_buckets="
                f"{prior.get('n_buckets')}; resuming with n_buckets="
                f"{n_buckets} would mix bucket layouts — pass the original "
                "value or use a fresh output dir"
            )
    else:
        _write_meta(spark, meta_path, {"n_buckets": n_buckets})

    stream = pages_stream(spark, input_dir)
    if dedup_horizon is not None:
        stream = dedup_pages_stream(stream, horizon=dedup_horizon) \
            .drop("text_hash")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        enriched = enrich_stage(parse_stage(batch_df), spark,
                                n_buckets=n_buckets)
        encoded = encode_pages(enriched, n_salts=n_salts, arms=arms)
        route_stream_batch(encoded, out_dir, batch_id)

    query = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def dedup_pages_stream(pages: DataFrame, horizon: str = "1 hour",
                       ts_col: str = "warc_ts",
                       text_col: str = "text") -> DataFrame:
    """Cross-micro-batch exact content dedup for continuous ingestion.

    The batch dedup family (``operators.dedup``) assumes the corpus is
    at rest; a crawler tail re-delivers the same page minutes apart in
    DIFFERENT micro-batches, where per-batch ``dropDuplicates`` can't
    see the earlier copy. This keeps the first arrival per ``md5(text)``
    across batches using ``dropDuplicatesWithinWatermark``: the state
    store holds one 16-byte-key entry per distinct text seen within the
    event-time ``horizon``, and the watermark EVICTS entries whose event
    time falls behind it.

    Documented trade (what makes this viable at 100 TB/day): state is
    bounded by ingest-rate × horizon, not stream lifetime — a duplicate
    re-arriving AFTER its key was evicted is emitted again. Exactness
    beyond the horizon belongs to the batch compaction pass
    (``dedup_keep_first``), the standard lambda split. Scale shape: one
    shuffle on the hash key into the state store; keys are md5-uniform,
    so no skew surface.

    Streaming-only by contract (batch DataFrames should use
    ``operators.dedup.dedup_keep_first`` — Spark rejects
    ``dropDuplicatesWithinWatermark`` on batch plans); gate tests pin
    stream ≡ batch ``dropDuplicates`` when all duplicates arrive within
    the horizon, and re-emission beyond it.
    """
    return (
        pages.withColumn("text_hash", F.md5(F.col(text_col)))
        .withWatermark(ts_col, horizon)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )


def windowed_route_counts(pages: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours",
                          n_buckets: int = 8) -> DataFrame:
    """Event-time windowed aggregation with a late-data watermark.

    Streaming counterpart of the batch ``route_counts``: pages per
    (event-time window, lang) with ``warc_ts`` as event time. The watermark
    bounds state — windows older than (max event time − watermark) finalize
    and drop from the store, so state size is O(active windows × routes)
    regardless of stream length; late rows inside the watermark still land
    in their window, later ones are dropped (counted by Spark's
    numDroppedRows metric). Works identically on a batch DataFrame (the
    watermark is a no-op there), which is how the oracle checks it.
    """
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("w"),
            "lang",
        )
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "lang", "n_pages",
        )
    )
