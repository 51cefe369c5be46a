"""Batch (vectorized) encoder vs scalar encoder: decoded equality.

The batch encoder assigns pool indices column-major (the scalar/reference
encoder row-major), so blobs differ byte-wise but MUST decode to the same
normalized document. Also pins determinism and dictionary compression wins.
"""

import numpy as np
import pandas as pd
import pytest

from compress_otel_collector_spark.codec import (
    decode,
    encode,
    normalize,
    trace_model,
)
from compress_otel_collector_spark.codec.batch import (
    DEFAULT_SCOPE,
    SPAN_COLUMNS,
    encode_span_dataframe,
)

T = 1_700_000_000_000_000_000


def make_pdf(n=50, with_events=True, with_links=True, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        tid = bytes([i % 11]) * 16
        sid = bytes([(i + 1) % 7]) * 8
        events = []
        if with_events and i % 3 == 0:
            events = [
                {
                    "timeUnixNano": T + i * 1000 + 17,
                    "name": f"ev{i % 2}",
                    "attributes": {"retry": i % 2 == 0},
                    "droppedAttributesCount": 0,
                },
                {
                    "timeUnixNano": 0,  # null-coerced
                    "name": "",
                    "attributes": {},
                    "droppedAttributesCount": int(i % 4),
                },
            ]
        links = []
        if with_links and i % 5 == 0:
            links = [
                {
                    "traceId": bytes([i % 3]) * 16,
                    "spanId": bytes([i % 4 + 1]) * 8,
                    "traceState": "vendor=x" if i % 2 else "",
                    "attributes": {"rel": "follows"},
                    "droppedAttributesCount": 0,
                }
            ]
        rows.append(
            {
                "trace_id": tid,
                "span_id": sid,
                "parent_span_id": b"" if i % 4 == 0 else bytes([i % 5]) * 8,
                "trace_state": "" if i % 3 else "congo=t61",
                "name": f"GET /p{i % 4}",
                "kind": i % 6,
                "start_ns": T + int(rng.integers(0, 10_000)),
                "end_ns": T + int(rng.integers(10_000, 20_000)),
                "attributes": {
                    "http.url": f"https://h{i % 9}.example.com/p{i}",
                    "http.status_code": 200 if i % 7 else 404,
                    "score": float(i % 3) / 2.0,
                },
                "dropped_attributes_count": 0,
                "events": events,
                "dropped_events_count": 0,
                "links": links,
                "dropped_links_count": int(i % 2),
                "status_message": "" if i % 2 else "OK",
                "status_code": i % 3,
                "lang": ["en", "zh", "de"][i % 3],
            }
        )
    return pd.DataFrame(rows)


def pdf_to_document(pdf, group_col=None, resource_attrs_for=None,
                    scope=None, schema_url=None):
    """Build the equivalent value-tree document for the scalar encoder."""
    scope = scope if scope is not None else DEFAULT_SCOPE
    if resource_attrs_for is None:
        resource_attrs_for = lambda key: {  # noqa: E731
            "service.name": f"crawler-{key}" if key is not None else "crawler"
        }
    if group_col is not None and len(pdf):
        pdf = pdf.sort_values(group_col, kind="stable")
        groups = [(k, g) for k, g in pdf.groupby(group_col, sort=False)]
    else:
        groups = [(None, pdf)]
    resource_spans = []
    for key, g in groups:
        spans = []
        for _, r in g.iterrows():
            spans.append(
                {
                    "traceId": bytes(r["trace_id"]),
                    "spanId": bytes(r["span_id"]),
                    "traceState": r["trace_state"],
                    "parentSpanId": bytes(r["parent_span_id"]),
                    "name": r["name"],
                    "kind": int(r["kind"]),
                    "startTimeUnixNano": int(r["start_ns"]),
                    "endTimeUnixNano": int(r["end_ns"]),
                    "attributes": r["attributes"],
                    "droppedAttributesCount": int(
                        r["dropped_attributes_count"]),
                    "events": list(r["events"]),
                    "droppedEventsCount": int(r["dropped_events_count"]),
                    "links": list(r["links"]),
                    "droppedLinksCount": int(r["dropped_links_count"]),
                    "status": {
                        "message": r["status_message"],
                        "code": int(r["status_code"]),
                    },
                }
            )
        resource_spans.append(
            {
                "resource": {
                    "attributes": resource_attrs_for(key),
                    "droppedAttributesCount": 0,
                },
                "scopeSpans": [
                    {"scope": scope, "spans": spans,
                     "schemaUrl": schema_url or ""}
                ],
                "schemaUrl": schema_url or "",
            }
        )
    return {"resourceSpans": resource_spans}


@pytest.mark.parametrize("group_col", [None, "lang"])
def test_batch_matches_scalar_decoded(group_col):
    pdf = make_pdf(60)
    blob = encode_span_dataframe(pdf, group_col=group_col)
    doc = pdf_to_document(pdf, group_col=group_col)
    scalar_blob = encode(doc, trace_model())
    m = trace_model()
    assert decode(blob, m) == decode(scalar_blob, m) == normalize(doc, m)


def test_batch_deterministic():
    pdf = make_pdf(40)
    assert encode_span_dataframe(pdf, group_col="lang") == \
        encode_span_dataframe(pdf, group_col="lang")


def test_batch_no_events_links():
    pdf = make_pdf(25, with_events=False, with_links=False)
    blob = encode_span_dataframe(pdf)
    m = trace_model()
    assert decode(blob, m) == normalize(pdf_to_document(pdf), m)


def test_batch_empty():
    pdf = make_pdf(0)
    blob = encode_span_dataframe(pdf)
    assert decode(blob, trace_model()) == {"resourceSpans": None}


def test_batch_single_row():
    pdf = make_pdf(1)
    m = trace_model()
    assert decode(encode_span_dataframe(pdf), m) == normalize(
        pdf_to_document(pdf), m
    )


def test_schema_url_plumbs_through():
    pdf = make_pdf(5)
    blob = encode_span_dataframe(
        pdf, group_col="lang", schema_url="https://example.com/schema"
    )
    out = decode(blob, trace_model())
    assert out["resourceSpans"][0]["schemaUrl"] == "https://example.com/schema"
    assert (
        out["resourceSpans"][0]["scopeSpans"][0]["schemaUrl"]
        == "https://example.com/schema"
    )


def test_dictionary_compression_wins():
    """Repetitive batches (the web-text case) must shrink via pools."""
    pdf = make_pdf(400)
    blob = encode_span_dataframe(pdf, group_col="lang")
    # ~25 distinct attribute dicts / ids pooled across 400 spans: the blob
    # must be far smaller than 400 × the single-span cost.
    single = len(encode_span_dataframe(make_pdf(1)))
    assert len(blob) < 0.25 * 400 * single


def test_all_columns_documented():
    assert set(SPAN_COLUMNS) <= set(make_pdf(1).columns)


def test_null_str_attribute_raises():
    """A null in a 'str' attr: column must raise, not corrupt (factorize
    maps NaN to code -1, which would silently alias the last pool entry)."""
    from compress_otel_collector_spark.codec.values import CodecError

    pdf = make_pdf(4, with_events=False, with_links=False)
    pdf = pdf.drop(columns=["attributes"])
    pdf["attr:http.url"] = ["a", "b", None, "d"]
    with pytest.raises(CodecError, match="null value"):
        encode_span_dataframe(pdf, attributes_spec={"http.url": "str"})


def test_nul_containing_strings_stay_distinct():
    """pandas' string hashtable hashes C strings — factorize conflates
    'a' with 'a\\x00b' and '' with '\\x00'. Web text legitimately contains
    NULs; every string pool must keep them distinct (found by the
    batch≡scalar hypothesis property, pinned here deterministically)."""
    m = trace_model()
    rows = []
    cases = [("", "", "", "x"), ("\x00", "a\x00b", "\x00z", "x\x00"),
             ("a", "a\x00", "z", "\x00\x00"), ("a\x00b", "a", "z\x00", "x")]
    for i, (nm, ts, sm, av) in enumerate(cases):
        rows.append({
            "trace_id": bytes([i + 1]) * 16, "span_id": bytes([i + 1]) * 8,
            "parent_span_id": b"", "trace_state": ts, "name": nm, "kind": 2,
            "start_ns": 1, "end_ns": 2,
            "attributes": {"k": av, "k\x002": 1},
            "dropped_attributes_count": 0,
            "events": [{"timeUnixNano": 5, "name": nm, "attributes": {},
                        "droppedAttributesCount": 0}],
            "dropped_events_count": 0,
            "links": [], "dropped_links_count": 0,
            "status_message": sm, "status_code": 0, "lang": "en"})
    pdf = pd.DataFrame(rows)
    got = decode(encode_span_dataframe(pdf), m)
    doc = pdf_to_document(pdf)
    assert got == decode(encode(doc, m), m) == normalize(doc, m)
    names = [sp["name"] for rs in got["resourceSpans"]
             for ss in rs["scopeSpans"] for sp in ss["spans"]]
    assert names == ["", "\x00", "a", "a\x00b"]  # name is non-nullable


def test_nul_strings_in_columnar_attributes():
    """Same NUL-exactness through the columnar attributes fast path
    (attr:<key> columns + attributes_spec)."""
    m = trace_model()
    pdf = make_pdf(4)
    pdf = pdf.drop(columns=["attributes"])
    pdf["attr:v"] = ["a", "a\x00b", "a\x00", "a"]
    pdf["attr:n"] = [1, 2, 3, 4]
    blob = encode_span_dataframe(
        pdf, attributes_spec={"v": "str", "n": "int"})
    got = decode(blob, m)
    vals = [(sp["attributes"]["v"], sp["attributes"]["n"])
            for rs in got["resourceSpans"] for ss in rs["scopeSpans"]
            for sp in ss["spans"]]
    assert vals == [("a", 1), ("a\x00b", 2), ("a\x00", 3), ("a", 4)]


def test_factorize_fast_and_nul_paths_agree():
    """_factorize_exact's raw-factorize fast path (no NUL anywhere) and
    its bytes-reencode slow path must produce identical codes/uniques on
    the same NUL-free input — and the slow path stays exact when a NUL
    forces it (r6: the fast path skips the per-value utf-8 re-encode)."""
    from compress_otel_collector_spark.codec.batch import _factorize_exact

    clean = ["b", "a", None, "b", "", "c", "a"]
    codes, uniq = _factorize_exact(clean)
    assert uniq == ["b", "a", "", "c"]
    assert codes.tolist() == [0, 1, -1, 0, 2, 3, 1]
    dirty = ["a", "a\x00b", None, "a\x00", "a", ""]
    codes, uniq = _factorize_exact(dirty)
    assert uniq == ["a", "a\x00b", "a\x00", ""]
    assert codes.tolist() == [0, 1, -1, 2, 0, 3]


def test_oversized_string_pool_entry_roundtrips():
    """A pooled string larger than the vectorized padded-matrix cap
    (_MAX_PAYLOAD_PAD) must take the per-entry fallback and still decode
    byte-exactly (r6: pool entries are pre-joined into one blob when the
    padded assembly applies)."""
    from compress_otel_collector_spark.codec.batch import _MAX_PAYLOAD_PAD

    m = trace_model()
    pdf = make_pdf(6, with_events=False, with_links=False)
    long_name = "n" * (_MAX_PAYLOAD_PAD + 7)
    pdf.loc[2, "name"] = long_name
    blob = encode_span_dataframe(pdf)
    got = decode(blob, m)
    names = [sp["name"] for rs in got["resourceSpans"]
             for ss in rs["scopeSpans"] for sp in ss["spans"]]
    assert names[2] == long_name
    assert len(names) == 6


def test_len_prefixed_blob_matches_naive_join():
    """The vectorized length-prefixed pool assembly must be byte-equal to
    the naive per-entry form for arbitrary payloads (r6 entry_blobs)."""
    import random

    from compress_otel_collector_spark.codec.batch import _len_prefixed_blob
    from compress_otel_collector_spark.codec.varint import encode_sleb128

    rng = random.Random(11)
    for trial in range(20):
        raws = [bytes(rng.randrange(256) for _ in range(rng.choice(
            [0, 1, 2, 7, 63, 64, 127, 128, 300]))) for _ in range(
            rng.randrange(1, 40))]
        got = _len_prefixed_blob(raws)
        want = b"".join(encode_sleb128(len(r)) + r for r in raws)
        assert got == want, f"trial {trial}"
    # over-cap payload falls back to None
    assert _len_prefixed_blob([b"x" * 5000]) is None


def test_factorize_exact_property_vs_pure_python():
    """_factorize_exact (both its join-scan fast path and the bytes
    re-encode path) against a pure-Python exact dedup over adversarial
    value mixes: NULs, the '\\x01' join separator, empties, None, bytes,
    and str/bytes lookalikes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from compress_otel_collector_spark.codec.batch import _factorize_exact

    val = st.one_of(
        st.none(),
        st.text(alphabet="ab\x00\x01é", max_size=4),
        st.binary(max_size=3),
    )

    @settings(max_examples=300, deadline=None)
    @given(st.lists(val, max_size=24))
    def prop(vals):
        codes, uniq = _factorize_exact(vals)
        seen: dict = {}
        want_codes, want_uniq = [], []
        for v in vals:
            if v is None:
                want_codes.append(-1)
                continue
            k = (type(v).__name__, v)
            if k not in seen:
                seen[k] = len(want_uniq)
                want_uniq.append(v)
            want_codes.append(seen[k])
        assert codes.tolist() == want_codes
        assert uniq == want_uniq

    prop()


def test_len_prefixed_blob_padded_budget_fallback():
    """One near-cap payload among many tiny ones must NOT take the padded
    path (r7: the m*w transient would be multi-GB for a ~1M-unique pool) —
    and the per-entry fallback it triggers stays wire-identical."""
    from compress_otel_collector_spark.codec.batch import (
        _PAD_BYTE_BUDGET,
        _len_prefixed_blob,
    )
    from compress_otel_collector_spark.codec.varint import encode_sleb128

    w = 4096
    m = _PAD_BYTE_BUDGET // w + 2  # padded just over budget, payload ~w
    raws = [b"y" * w] + [b""] * (m - 1)
    assert _len_prefixed_blob(raws) is None
    # under-budget padding still vectorizes, byte-equal to naive
    small = [b"y" * 64] + [b""] * 100
    assert _len_prefixed_blob(small) == b"".join(
        encode_sleb128(len(r)) + r for r in small)


def test_empty_input_with_attributes_spec_skips_pool():
    """Empty input with attributes_spec set must emit the same wire bytes
    as the no-spec empty encode — the never-used-pool skip is uniform
    across the columnar and generic paths (r7 ADVICE fix)."""
    pdf = make_pdf(2).iloc[:0]
    plain = encode_span_dataframe(pdf)
    specced = pdf.drop(columns=["attributes"]).assign(**{
        "attr:v": pd.Series([], dtype=object),
        "attr:n": pd.Series([], dtype=object),
    })
    blob = encode_span_dataframe(
        specced, attributes_spec={"v": "str", "n": "int"})
    assert blob == plain
    assert decode(blob, trace_model()) == {"resourceSpans": None}
