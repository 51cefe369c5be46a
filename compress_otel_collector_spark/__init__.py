"""compress_otel_collector_spark — a PySpark-native analytics & telemetry-codec engine.

A from-scratch rebuild of the capabilities of ``beet233/compress-otel-collector``
(reference at /root/reference, Go) as an idiomatic PySpark engine:

- ``codec/``      pure-Python + vectorized (numpy/Arrow) implementation of the
                  reference's schema-driven value-tree dictionary-encoding wire
                  format (sleb128 varints, value pools, shared pools, diff
                  encoding, free-map string pool, zstd framing).
- ``sources/``    deterministic synthetic Common-Crawl-style pages table,
                  lookup dims, and /root/testdata parquet loaders.
- ``functions/``  reusable Spark Column expressions (host extraction, hashing,
                  tokenization, tagged attribute values).
- ``operators/``  relational + training-data operators: dedup (exact / MinHash-
                  LSH / SimHash / n-gram Jaccard / embedding), similarity
                  search, text analysis, multimodal plumbing.
- ``plans/``      the flagship parse → enrich → encode → route → aggregate
                  pipeline with per-partition lineage and resumability.
- ``streaming/``  Structured Streaming wrapper (availableNow + checkpoint).

Everything here derives from public knowledge only: the PySpark API and the
reference repo's observable behavior.
"""

__version__ = "0.1.0"
