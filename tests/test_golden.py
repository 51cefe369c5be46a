"""Golden blob tests — FIXTURES.md F4.6.

The canonical (sorted-key, deterministic-topological-order) encodings of two
fixed documents are pinned as hex fixtures. Any wire-format change breaks
these on purpose. Decode-only assertions guard the reader independently of
the writer.
"""

from pathlib import Path

from compress_otel_collector_spark.codec import (
    decode,
    encode,
    normalize,
    trace_model,
)
from tests.test_codec_roundtrip import span, traces

FIXTURES = Path(__file__).parent / "fixtures"

T = 1_700_000_000_000_000_000


def doc_1span():
    return traces([span(1)])


def doc_3span():
    return traces([
        span(0, startTimeUnixNano=T, endTimeUnixNano=T + 10),
        span(1, startTimeUnixNano=T + 5, endTimeUnixNano=T + 15),
        span(2, startTimeUnixNano=T + 3, endTimeUnixNano=T + 13),
    ])


def _golden(name):
    return bytes.fromhex((FIXTURES / name).read_text().strip())


def test_encode_matches_golden_1span():
    assert encode(doc_1span(), trace_model()) == _golden("golden_1span.hex")


def test_encode_matches_golden_3span():
    assert encode(doc_3span(), trace_model()) == _golden(
        "golden_3span_diff.hex"
    )


def test_decode_only_golden_blobs():
    m = trace_model()
    assert decode(_golden("golden_1span.hex"), m) == normalize(doc_1span(), m)
    assert decode(_golden("golden_3span_diff.hex"), m) == normalize(
        doc_3span(), m
    )


def test_magic_present_after_meta():
    blob = _golden("golden_1span.hex")
    assert b"cprval" in blob


def test_negative_delta_on_wire():
    # doc_3span start times T, T+5, T+3 → deltas on the wire are absolute(T),
    # +5 (0x05), -2 (sleb128 0x7E). encode.go:144-165.
    blob = _golden("golden_3span_diff.hex")
    data = blob.split(b"cprval", 1)[1]
    assert b"\x05" in data and b"\x7e" in data
