"""Per-arm timing breakdown for the comparison arms (r5 verdict #4).

Answers, with numbers, what `pipeline_arms`'s overhead over
`pipeline_synth` is made of: for each (lang, host_bucket) group of the
SAME pre-encode frame the shipped job consumes
(`plans.pipeline._pre_encode_frame` → `_group_spans_frame`), time

  - the production side: codec encode + zstd of the custom blob,
  - each arm component via `_arm_sizes(timings=...)`: gzip(blob),
    proto build, proto zstd, JSON build, JSON zstd, Arrow IPC build,
    Arrow zstd.

Single-threaded on collected batches — identical code path to the
executor loop, so component SHARES transfer to the 32-core bench run
(absolute walls don't; the host throttle memo applies). Prints one JSON
line; ~1-2 min.

Usage: python scripts/profile_arms.py [n_pages]  (default 300_000)
"""

import json
import sys
import time

sys.path.insert(0, ".")


def main(n_pages: int = 300_000) -> None:
    import pyarrow as pa
    from pyspark.sql import SparkSession

    import bench
    from compress_otel_collector_spark.plans.pipeline import (
        _arm_sizes,
        _group_spans_frame,
        _pre_encode_frame,
        encode_span_dataframe,
        enrich_stage,
        parse_stage,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    pages = spark.read.parquet(bench.materialize_pages(spark, n_pages))
    enriched = enrich_stage(parse_stage(pages), spark)
    pdf = _pre_encode_frame(enriched, n_salts=8).toPandas()

    zstd = pa.Codec("zstd")
    gzip = pa.Codec("gzip", compression_level=6)
    timings: dict = {}
    t_frame = t_encode = t_zstd = 0.0
    n_groups = 0
    for (lang, bucket), g in pdf.groupby(["lang", "host_bucket"],
                                         sort=True, dropna=False):
        t0 = time.perf_counter()
        spans, attrs_spec = _group_spans_frame(g, lang, bucket, 10, 7)
        t1 = time.perf_counter()
        blob = encode_span_dataframe(
            spans, attributes_spec=attrs_spec,
            resource_attrs_for=lambda _k: {
                "service.name": f"crawler-{lang}",
                "host.bucket": int(bucket),
            })
        t2 = time.perf_counter()
        zstd.compress(blob, asbytes=True)
        t3 = time.perf_counter()
        _arm_sizes(spans, lang, bucket, blob, zstd, gzip, timings=timings)
        t_frame += t1 - t0
        t_encode += t2 - t1
        t_zstd += t3 - t2
        n_groups += 1

    arms_total = sum(timings.values())
    prod_total = t_frame + t_encode + t_zstd
    out = {
        "n_pages": n_pages,
        "n_groups": n_groups,
        "production_sec": {
            "group_frame": round(t_frame, 3),
            "codec_encode": round(t_encode, 3),
            "blob_zstd": round(t_zstd, 3),
            "total": round(prod_total, 3),
        },
        "arms_sec": {k: round(v, 3) for k, v in sorted(
            timings.items(), key=lambda kv: -kv[1])},
        "arms_total_sec": round(arms_total, 3),
        "arms_share": {k: round(v / arms_total, 3) for k, v in sorted(
            timings.items(), key=lambda kv: -kv[1])},
        "arms_over_production": round(arms_total / prod_total, 3),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300_000)
