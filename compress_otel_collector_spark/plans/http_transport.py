"""HTTP transport analog (the reference's exporter→receiver hop).

The reference exporter POSTs every encoded frame to a receiver URL
(compress-otel-exporter/trace.go:183-200: ``http.Post(url, "*/*", buffer)``)
and the receiver is an HTTP server that decodes each request body
(compress-otel-receiver/trace.go:21-50). This module is the Spark-side
equivalent:

- :func:`http_post_sink` — ``foreachPartition`` sink: each task POSTs its
  blobs (the uncompressed ``cprval`` frame, exactly the reference's POST
  body) with bounded retries; delivery counts come back through a Spark
  accumulator, never a collect.
- :func:`start_test_receiver` — an in-process receiver that decodes every
  body with the real decoder and tallies spans, for tests and local runs.

Scale note: the production sink remains the partitioned parquet/Iceberg
route (plans.pipeline.route_stage) — an HTTP hop serializes through one
endpoint and is the reference's demo transport, not a 100 TB design. It is
here for API parity (SURVEY O24/O25 letter) and for streaming fan-out to
side services; each task posts independently so the pattern itself is
shuffle-free.
"""

from __future__ import annotations

import time
import urllib.error
import urllib.request

from pyspark.sql import DataFrame


def http_post_sink(encoded: DataFrame, url: str, max_retries: int = 3,
                   timeout: float = 10.0, backoff: float = 0.2) -> int:
    """POST every blob's raw frame to ``url``; returns frames delivered.

    Body = the uncompressed ``cprval`` frame (reference parity: the Go
    exporter posts the raw Encode() buffer, trace.go:183-195). Retries with
    linear backoff per blob; a blob that still fails raises, failing the
    task (Spark's retry model then owns redelivery — the receiver must
    tolerate at-least-once, as any HTTP ingest does).
    """
    sc = encoded.sparkSession.sparkContext
    delivered = sc.accumulator(0)

    def post_partition(rows) -> None:
        import pyarrow as pa

        zstd = pa.Codec("zstd")
        for row in rows:
            frame = zstd.decompress(bytes(row["blob"]),
                                    decompressed_size=int(row["raw_bytes"]))
            body = frame.to_pybytes() if hasattr(frame, "to_pybytes") \
                else bytes(frame)
            last_err = None
            for attempt in range(max_retries):
                req = urllib.request.Request(
                    url, data=body,
                    headers={"Content-Type": "*/*"},  # trace.go:195
                    method="POST",
                )
                try:
                    with urllib.request.urlopen(req, timeout=timeout) as rsp:
                        rsp.read()
                    delivered.add(1)
                    last_err = None
                    break
                except (urllib.error.URLError, OSError) as e:
                    last_err = e
                    time.sleep(backoff * (attempt + 1))
            if last_err is not None:
                raise last_err

    encoded.select("blob", "raw_bytes").foreachPartition(post_partition)
    return delivered.value


def start_test_receiver():
    """In-process analog of the reference receiver (trace.go:21-50):
    decodes every POST body with the real decoder, tallies spans.

    Returns (url, state, shutdown) where ``state`` has ``frames`` and
    ``spans`` counters updated per request.
    """
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from ..codec.decoder import decode
    from ..codec.definition import trace_model

    model = trace_model()
    state = type("ReceiverState", (), {"frames": 0, "spans": 0})()
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 (http.server API)
            body = self.rfile.read(int(self.headers["Content-Length"]))
            try:
                doc = decode(body, model)
            except Exception:
                self.send_response(500)
                self.end_headers()
                return
            n = sum(
                len(ss.get("spans") or [])
                for rs in doc.get("resourceSpans") or []
                for ss in rs.get("scopeSpans") or []
            )
            with lock:
                state.frames += 1
                state.spans += n
            self.send_response(200)
            self.end_headers()

        def log_message(self, *args):  # silence per-request stderr
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_port}/"
    return url, state, server.shutdown
