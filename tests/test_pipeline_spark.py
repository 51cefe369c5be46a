"""End-to-end Spark tests for the flagship pipeline (FIXTURES.md F5)."""

import pytest
from pyspark.sql import functions as F

from compress_otel_collector_spark.plans.pipeline import (
    aggregate_stage,
    encode_stage,
    enrich_stage,
    parse_stage,
    read_routed,
    roundtrip_check,
    run_pipeline,
    span_stage,
)
from compress_otel_collector_spark.sources.tables import (
    pages_from_documents,
    synthetic_pages,
)


@pytest.fixture(scope="module")
def pages(spark, sf_dir):
    return pages_from_documents(spark, sf_dir).cache()


class TestParse:
    def test_byte_identical_extraction(self, pages):
        parsed = parse_stage(pages)
        bad = parsed.where(F.col("text_extracted") != F.col("text")).count()
        assert bad == 0
        assert parsed.count() == pages.count()

    def test_pandas_udf_parity(self, pages):
        native = parse_stage(pages, use_pandas_udf=False)
        arrow = parse_stage(pages, use_pandas_udf=True)
        diff = (
            native.select("doc_id", "text_extracted")
            .exceptAll(arrow.select("doc_id", "text_extracted"))
            .count()
        )
        assert diff == 0

    def test_synthetic_pages_parse(self, spark):
        sp = synthetic_pages(spark, 500, partitions=4)
        parsed = parse_stage(sp)
        assert parsed.where(
            F.col("text_extracted") != F.col("text")).count() == 0
        # ~5% empty-text rows exist (null-coercion fixture)
        empties = parsed.where(F.col("text") == "").count()
        assert 10 <= empties <= 40


class TestEnrich:
    def test_broadcast_join_and_buckets(self, spark, pages):
        enriched = enrich_stage(parse_stage(pages), spark)
        assert enriched.where(F.col("lang") == "en").select(
            "lang_name").distinct().collect()[0][0] == "English"
        buckets = [r[0] for r in
                   enriched.select("host_bucket").distinct().collect()]
        assert all(0 <= b < 8 for b in buckets)
        plan = enriched._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_unknown_lang_keeps_nulls(self, spark):
        sp = synthetic_pages(spark, 200)
        enriched = enrich_stage(parse_stage(sp), spark)
        unknown = enriched.where(F.col("lang") == "unknown")
        assert unknown.count() > 0
        assert unknown.where(F.col("lang_name").isNotNull()).count() == 0


class TestEncodeRoute:
    @pytest.fixture(scope="class")
    def encoded(self, spark, pages):
        spans = span_stage(enrich_stage(parse_stage(pages), spark))
        return encode_stage(spans, n_salts=4).cache()

    def test_span_counts_preserved(self, pages, encoded):
        assert (
            encoded.agg(F.sum("n_spans")).collect()[0][0] == pages.count()
        )

    def test_compression_arms(self, encoded):
        row = encoded.agg(
            F.sum("zstd_bytes").alias("z"),
            F.sum("json_zstd_bytes").alias("j"),
            F.sum("raw_bytes").alias("r"),
            F.sum("n_spans").alias("n"),
            F.count("*").alias("blobs"),
        ).collect()[0]
        # The dictionary codec's uncompressed blob must be far smaller than
        # raw JSON would be (~4x measured); after zstd the two converge
        # because random md5-derived ids set the entropy floor on this data
        # shape — pin a sanity band rather than a false "always beats" claim
        # (the bench reports the true ratio against BASELINE.md).
        assert row["z"] < row["r"]                 # zstd helps the blob
        assert row["z"] < row["j"] * 1.6           # same order as JSON+zstd
        # ≈100 B/span marginal cost + ≈2 kB fixed meta (pool-id paths) per blob
        assert row["r"] < row["n"] * 150 + row["blobs"] * 2000

    def test_roundtrip_equality_full_fidelity(self, spark, pages, encoded):
        """Every reference-reconstructed span field (trace.go:61-187)
        crosses the equality gate, in one Spark job."""
        from compress_otel_collector_spark.plans.pipeline import (
            expected_roundtrip,
            roundtrip_counts,
        )

        decoded = roundtrip_check(encoded)
        spans = span_stage(enrich_stage(parse_stage(pages), spark))
        row = roundtrip_counts(decoded, expected_roundtrip(spans)).collect()[0]
        assert row["decoded_spans"] == pages.count()
        assert row["missing"] == 0 and row["extra"] == 0

    def test_roundtrip_gate_detects_corruption(self, spark, pages, encoded):
        """The gate must actually fail when a field is wrong (no vacuous 0s).
        """
        from compress_otel_collector_spark.plans.pipeline import (
            expected_roundtrip,
            roundtrip_counts,
        )

        decoded = roundtrip_check(encoded)
        spans = span_stage(enrich_stage(parse_stage(pages), spark))
        wrong = expected_roundtrip(spans).withColumn(
            "status_code", F.col("status_code") + 1)
        row = roundtrip_counts(decoded, wrong).collect()[0]
        assert row["missing"] > 0 and row["extra"] > 0

    def test_roundtrip_hash_mode_agrees_with_exact(self, spark, pages,
                                                   encoded):
        """The 128-bit-fingerprint compare (the scale path) must report the
        same (decoded, missing, extra) as the full-column groupBy on both a
        clean roundtrip and a corrupted one — including a null-vs-value
        column slide, the case naive xxhash64 over raw columns would miss
        (Spark hash functions skip nulls)."""
        from compress_otel_collector_spark.plans.pipeline import (
            expected_roundtrip,
            roundtrip_counts,
        )

        decoded = roundtrip_check(encoded)
        spans = span_stage(enrich_stage(parse_stage(pages), spark))
        for expected in (
            expected_roundtrip(spans),
            expected_roundtrip(spans).withColumn(
                "status_code", F.col("status_code") + 1),
            # slide: value moves from one column into an adjacent null one
            expected_roundtrip(spans)
            .withColumn("event_phase", F.col("event_name"))
            .withColumn("event_name", F.lit(None).cast("string")),
        ):
            h = roundtrip_counts(decoded, expected).collect()[0]
            e = roundtrip_counts(decoded, expected, exact=True).collect()[0]
            assert h.asDict() == e.asDict()

    def test_blob_is_decodable_magic(self, encoded):
        import pyarrow as pa

        row = encoded.select("blob", "raw_bytes").first()
        blob = pa.Codec("zstd").decompress(
            bytes(row["blob"]), decompressed_size=int(row["raw_bytes"]))
        assert b"cprval" in bytes(blob)


class TestRunResume:
    def test_run_and_resume(self, spark, pages, tmp_path):
        out = str(tmp_path / "out")
        agg1 = run_pipeline(spark, pages, out, arms=False).cache()
        total1 = agg1.agg(F.sum("pages")).collect()[0][0]
        assert total1 == pages.count()

        # re-run: everything complete → nothing recomputed, counts unchanged
        agg2 = run_pipeline(spark, pages, out, arms=False)
        assert agg2.agg(F.sum("pages")).collect()[0][0] == total1

        # invalidate one route (delete its partition dir) → only it recomputed
        import shutil
        from pathlib import Path

        routed = Path(out) / "routed"
        victim = sorted(routed.glob("lang=en/host_bucket=*"))[0]
        shutil.rmtree(victim)
        before = read_routed(spark, out).count()
        agg3 = run_pipeline(spark, pages, out, arms=False)
        assert agg3.agg(F.sum("pages")).collect()[0][0] == total1
        after = read_routed(spark, out).count()
        assert after > before  # victim partition re-materialized

    def test_sink_counts_match_input_groups(self, spark, pages, tmp_path):
        out = str(tmp_path / "out2")
        agg = run_pipeline(spark, pages, out, arms=False)
        expected = (
            span_stage(enrich_stage(parse_stage(pages), spark))
            .groupBy("lang", "host_bucket").count()
        )
        got = agg.select("lang", "host_bucket", F.col("pages").alias("count"))
        assert got.exceptAll(expected).count() == 0
        assert expected.exceptAll(got).count() == 0


def test_dense_events_roundtrip(spark):
    """events_every=1: EVERY span carries an event — the dense-events wire
    path must stay correct (and is pinned fast by the vectorized cell
    builder; bench criterion: within 1.5x of sparse)."""
    from compress_otel_collector_spark.plans.pipeline import (
        encode_stage,
        enrich_stage,
        expected_roundtrip,
        parse_stage,
        roundtrip_check,
        roundtrip_counts,
        span_stage,
    )

    pages = synthetic_pages(spark, 400, partitions=2)
    spans = span_stage(enrich_stage(parse_stage(pages), spark))
    encoded = encode_stage(spans, n_salts=2, arms=False, events_every=1)
    row = roundtrip_counts(
        roundtrip_check(encoded),
        expected_roundtrip(spans, events_every=1),
    ).collect()[0]
    assert row["decoded_spans"] == 400
    assert row["missing"] == 0 and row["extra"] == 0


def test_resume_with_null_lang_routes(spark, tmp_path):
    """ADVICE r1: rows with NULL lang route under the null key; the resume
    anti-join must match them null-safely or every rerun re-appends them."""
    pages = synthetic_pages(spark, 200, partitions=2).withColumn(
        "lang",
        F.when(F.col("doc_id") % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("lang")),
    )
    out = str(tmp_path / "out_null_lang")
    total1 = run_pipeline(spark, pages, out, arms=False).agg(
        F.sum("pages")).collect()[0][0]
    assert total1 == 200
    # rerun: completed routes (including lang=NULL ones) must be skipped
    total2 = run_pipeline(spark, pages, out, arms=False).agg(
        F.sum("pages")).collect()[0][0]
    assert total2 == 200
    nulls = read_routed(spark, out).where(
        F.col("lang").isNull()).agg(F.sum("n_spans")).collect()[0][0]
    assert nulls == 40  # 200/5 null-lang pages, written exactly once


def test_pipeline_resume_probe_restores_only_victim(spark, sf_dir):
    """The driver-ledger resume probe must show: one route deleted, resume
    restores it exactly, and no other route's blobs change (null-safe
    anti-join skip), across a real run→delete→rerun cycle."""
    import __spark_entry__ as entrymod

    row = entrymod.queries()["pipeline_resume"](spark, sf_dir).collect()[0]
    assert row["routes_after_delete"] == row["routes_total"] - 1
    assert row["routes_after_resume"] == row["routes_total"]
    assert row["pages_resumed"] == row["pages_first"]
    assert row["victim_pages_resumed"] == row["victim_pages_first"] > 0
    assert row["other_routes_changed"] == 0


class TestEncodePagesNarrow:
    """encode_pages (narrow shuffle payload) ≡ encode_stage(span_stage(...))
    — same spans, same routes, same full-fidelity roundtrip."""

    def test_wide_and_narrow_paths_agree(self, spark, pages):
        # routes and span counts must match exactly; bytes legitimately
        # differ (encode_pages sorts each partition by (lang, bucket,
        # doc_id) for group cohesion under AQE coalescing + monotone diff
        # deltas) but must never be WORSE than the wide path beyond noise
        from compress_otel_collector_spark.plans.pipeline import encode_pages

        enriched = enrich_stage(parse_stage(pages), spark)
        wide = encode_stage(span_stage(enriched), n_salts=4, arms=False)
        narrow = encode_pages(enriched, n_salts=4, arms=False)
        w = {tuple(r[:2]): r["n"] for r in wide.groupBy(
            "lang", "host_bucket").agg(F.sum("n_spans").alias("n"))
            .collect()}
        n = {tuple(r[:2]): r["n"] for r in narrow.groupBy(
            "lang", "host_bucket").agg(F.sum("n_spans").alias("n"))
            .collect()}
        assert w == n
        wz = wide.agg(F.sum("zstd_bytes")).collect()[0][0]
        nz = narrow.agg(F.sum("zstd_bytes")).collect()[0][0]
        assert nz <= wz * 1.05, (nz, wz)

    def test_narrow_path_roundtrip_full_fidelity(self, spark, pages):
        from compress_otel_collector_spark.plans.pipeline import (
            encode_pages,
            expected_roundtrip,
            roundtrip_counts,
        )

        enriched = enrich_stage(parse_stage(pages), spark)
        decoded = roundtrip_check(encode_pages(enriched, n_salts=4,
                                               arms=False))
        row = roundtrip_counts(
            decoded, expected_roundtrip(span_stage(enriched))).collect()[0]
        assert row["decoded_spans"] == pages.count()
        assert row["missing"] == 0 and row["extra"] == 0


class TestMalformedUtf8Pages:
    """One malformed-UTF-8 page must never fail the job: at 10^12 crawled
    pages bad bytes are a certainty. Both parse variants replace invalid
    sequences with U+FFFD and agree; the page flows through the full
    encode→decode roundtrip."""

    def _pages(self, spark):
        rows = [
            (1, "https://a/1", b"<html><body><p>good text</p></body></html>"),
            (2, "https://a/2",
             b"<html><body><p>bad \xff\xfe bytes</p></body></html>"),
            (3, "https://a/3", b"\xff\x80 no html at all"),
        ]
        from pyspark.sql import functions as F
        return spark.createDataFrame(
            rows, "doc_id long, url string, html binary").select(
            "doc_id", "url", "html",
            F.lit("en").alias("lang"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id"))
            .alias("warc_ts"),
            F.lit("x").alias("text"),
        )

    def test_both_parse_variants_tolerate_and_agree(self, spark):
        pages = self._pages(spark)
        native = {r["doc_id"]: r["text_extracted"] for r in
                  parse_stage(pages).select("doc_id", "text_extracted")
                  .collect()}
        pandas_v = {r["doc_id"]: r["text_extracted"] for r in
                    parse_stage(pages, use_pandas_udf=True)
                    .select("doc_id", "text_extracted").collect()}
        assert native == pandas_v
        assert native[1] == "good text"
        assert "bad " in native[2] and "�" in native[2]
        assert native[3] == ""  # no <p> → empty extraction, row kept

    def test_malformed_page_survives_the_wire(self, spark):
        from compress_otel_collector_spark.plans.pipeline import (
            encode_pages,
            expected_roundtrip,
            roundtrip_counts,
        )

        pages = self._pages(spark)
        enriched = enrich_stage(pages.withColumn(
            "text", F.col("html").cast("string")), spark)
        # text column mirrors html so n_chars is well-defined; route the
        # hostile pages through encode→decode and demand exact equality
        enriched = parse_stage(enriched.drop("text_extracted")
                               if "text_extracted" in enriched.columns
                               else enriched)
        encoded = encode_pages(enriched, n_salts=2, arms=False)
        decoded = roundtrip_check(encoded)
        row = roundtrip_counts(
            decoded,
            expected_roundtrip(span_stage(enriched))).collect()[0]
        assert row["decoded_spans"] == 3
        assert row["missing"] == 0 and row["extra"] == 0


class TestDirtyDataGuards:
    """Null url / warc_ts / html must not fail the task (the codec's
    non-nullable startTimeUnixNano / traceId fields would otherwise throw
    in the encoder's type check on the first dirty page of 10^12)."""

    def test_dirty_pages_route_or_drop_deterministically(self, spark):
        from compress_otel_collector_spark.plans.pipeline import (
            encode_pages,
            expected_roundtrip,
            roundtrip_counts,
        )

        rows = [
            # (doc_id, url, html, warc_ts_s or None)
            (1, "https://a/1", b"<p>ok</p>", 1_700_000_000),
            (2, "https://a/2", b"<p>no ts</p>", None),   # null warc_ts
            (3, None, b"<p>no url</p>", 1_700_000_001),  # null url → dropped
            (4, "https://a/4", None, 1_700_000_002),     # null html → dropped
        ]
        pages = spark.createDataFrame(
            rows, "doc_id long, url string, html binary, ts long").select(
            "doc_id", "url", "html",
            F.lit("en").alias("lang"),
            F.timestamp_seconds(F.col("ts")).alias("warc_ts"),
            F.lit("x").alias("text"),
        )
        enriched = enrich_stage(parse_stage(pages), spark)
        kept = [r["doc_id"] for r in enriched.select("doc_id").collect()]
        assert sorted(kept) == [1, 2]
        encoded = encode_pages(enriched, n_salts=2, arms=False)
        row = roundtrip_counts(
            roundtrip_check(encoded),
            expected_roundtrip(span_stage(enriched))).collect()[0]
        assert row["decoded_spans"] == 2
        assert row["missing"] == 0 and row["extra"] == 0
        # the null-ts page carries the epoch-0 sentinel, not a crash
        decoded = roundtrip_check(encoded)
        ts0 = decoded.where(F.col("n_chars") == 5).select(
            "start_ns").collect()[0][0]
        assert ts0 == 0
