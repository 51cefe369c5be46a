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


def test_truncated_and_garbage_blobs_raise_codec_error():
    """Corrupt input must fail with CodecError, never a silent wrong tree
    or an unbounded read (reference reader errors on short data,
    receiver/reader.go:18-35)."""
    import pytest

    from compress_otel_collector_spark.codec import (
        encode,
        trace_model,
    )
    from compress_otel_collector_spark.codec.decoder import decode
    from compress_otel_collector_spark.codec.values import CodecError
    from tests.test_reference_golden import DOC

    m = trace_model()
    blob = encode(DOC, m)
    for cut in (1, len(blob) // 3, len(blob) - 1):
        with pytest.raises(CodecError):
            decode(blob[:cut], m)
    with pytest.raises(CodecError):
        decode(b"\x00\x01garbage-without-magic\x7f" * 4, m)


def test_any_truncation_raises_only_codec_error():
    """Property: decoding ANY prefix of a valid blob fails with CodecError
    (never IndexError/KeyError/hangs) — the reader is fully bounds-checked.
    """
    import pytest
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from compress_otel_collector_spark.codec import encode, trace_model
    from compress_otel_collector_spark.codec.decoder import decode
    from compress_otel_collector_spark.codec.values import CodecError
    from tests.test_reference_golden import DOC

    m = trace_model()
    blob = encode(DOC, m)

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=0, max_value=len(blob) - 1))
    def check(cut):
        with pytest.raises(CodecError):
            decode(blob[:cut], m)

    check()


def test_byte_flips_raise_only_codec_error():
    """Property: flipping any single byte of a valid blob either still
    decodes (a flip can land on another valid tree) or raises CodecError —
    never UnicodeDecodeError / RecursionError / IndexError (ADVICE r2: the
    truncation-only property missed invalid utf-8 and nesting bombs)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from compress_otel_collector_spark.codec import encode, trace_model
    from compress_otel_collector_spark.codec.decoder import decode
    from compress_otel_collector_spark.codec.values import CodecError
    from tests.test_reference_golden import DOC

    m = trace_model()
    blob = encode(DOC, m)

    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(min_value=0, max_value=len(blob) - 1),
        st.integers(min_value=1, max_value=255),
    )
    def check(pos, mask):
        corrupt = bytearray(blob)
        corrupt[pos] ^= mask
        try:
            decode(bytes(corrupt), m)
        except CodecError:
            pass  # the only legal failure mode

    check()


def test_invalid_utf8_raises_codec_error():
    import pytest

    from compress_otel_collector_spark.codec.decoder import _Reader
    from compress_otel_collector_spark.codec.values import CodecError

    r = _Reader(b"\xff\xfe\x01\x02")
    with pytest.raises(CodecError):
        r.read_string(4)


def test_free_value_nesting_bomb_raises_codec_error():
    """A corrupt blob that nests free arrays past the depth cap must raise
    CodecError, not RecursionError."""
    import pytest

    from compress_otel_collector_spark.codec.decoder import (
        _MAX_FREE_DEPTH,
        _Reader,
        _free_value_decode,
    )
    from compress_otel_collector_spark.codec.values import CodecError

    # tag ARRAY(6) + count 1, repeated far past the cap
    bomb = (b"\x06\x01") * (_MAX_FREE_DEPTH + 10)
    with pytest.raises(CodecError):
        _free_value_decode([], _Reader(bomb))
