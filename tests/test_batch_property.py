"""Property-based batch↔scalar equivalence over randomized span batches."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from compress_otel_collector_spark.codec import decode, encode, normalize, \
    trace_model
from compress_otel_collector_spark.codec.batch import encode_span_dataframe
from tests.test_batch_codec import pdf_to_document

T = 1_700_000_000_000_000_000

_attr_value = st.one_of(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.booleans(),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.binary(max_size=8),
    st.text(max_size=12),
    st.none(),
)


@st.composite
def span_rows(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    rows = []
    for i in range(n):
        has_events = draw(st.booleans())
        events = []
        if has_events:
            for j in range(draw(st.integers(1, 2))):
                events.append({
                    "timeUnixNano": draw(st.integers(0, 2**62)),
                    "name": draw(st.text(max_size=6)),
                    "attributes": draw(st.dictionaries(
                        st.text(max_size=5), _attr_value, max_size=2)),
                    "droppedAttributesCount": draw(st.integers(0, 3)),
                })
        links = []
        if draw(st.booleans()):
            for _ in range(draw(st.integers(1, 2))):
                links.append({
                    "traceId": draw(st.binary(min_size=0, max_size=16)),
                    "spanId": draw(st.binary(min_size=0, max_size=8)),
                    "traceState": draw(st.text(max_size=6)),
                    "attributes": draw(st.dictionaries(
                        st.text(max_size=5), _attr_value, max_size=2)),
                    "droppedAttributesCount": draw(st.integers(0, 3)),
                })
        rows.append({
            "trace_id": draw(st.binary(min_size=0, max_size=16)),
            "span_id": draw(st.binary(min_size=0, max_size=8)),
            "parent_span_id": draw(st.binary(min_size=0, max_size=8)),
            "trace_state": draw(st.text(max_size=8)),
            "name": draw(st.text(max_size=8)),
            "kind": draw(st.integers(0, 5)),
            "start_ns": T + draw(st.integers(-10**6, 10**6)),
            "end_ns": T + draw(st.integers(-10**6, 10**6)),
            "attributes": draw(st.dictionaries(
                st.text(max_size=6), _attr_value, max_size=3)),
            "dropped_attributes_count": draw(st.integers(0, 2)),
            "events": events,
            "dropped_events_count": draw(st.integers(0, 2)),
            "links": links,
            "dropped_links_count": draw(st.integers(0, 2)),
            "status_message": draw(st.text(max_size=6)),
            "status_code": draw(st.integers(0, 2)),
            "lang": draw(st.sampled_from(["en", "zh", "de"])),
        })
    return pd.DataFrame(rows)


@settings(max_examples=40, deadline=None)
@given(pdf=span_rows(), grouped=st.booleans())
def test_batch_equals_scalar_on_random_batches(pdf, grouped):
    group_col = "lang" if grouped else None
    blob = encode_span_dataframe(pdf, group_col=group_col)
    doc = pdf_to_document(pdf, group_col=group_col)
    m = trace_model()
    assert decode(blob, m) == decode(encode(doc, m), m) == normalize(doc, m)


@st.composite
def typed_attr_columns(draw):
    """Random typed attribute columns for the columnar fast path."""
    n = draw(st.integers(min_value=1, max_value=10))
    ints = draw(st.lists(st.integers(-(2**63), 2**63 - 1),
                         min_size=n, max_size=n))
    strs = draw(st.lists(st.text(max_size=10), min_size=n, max_size=n))
    dbls = draw(st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        min_size=n, max_size=n))
    bools = draw(st.lists(st.booleans(), min_size=n, max_size=n))
    return n, ints, strs, dbls, bools


@settings(max_examples=40, deadline=None)
@given(cols=typed_attr_columns())
def test_columnar_attributes_equal_scalar(cols):
    """The PRODUCTION attributes path (attr:<key> columns + spec) must
    decode identically to the scalar encoder over the same attribute dicts
    — including embedded NULs, empty strings, int64 extremes, and zero
    values (which must NOT null-coerce inside free maps: only None does).
    """
    n, ints, strs, dbls, bools = cols
    base = {
        "trace_id": [bytes([i + 1]) * 16 for i in range(n)],
        "span_id": [bytes([i + 1]) * 8 for i in range(n)],
        "parent_span_id": [b""] * n,
        "trace_state": [""] * n,
        "name": ["q"] * n,
        "kind": [1] * n,
        "start_ns": [T + i for i in range(n)],
        "end_ns": [T + 10 + i for i in range(n)],
        "dropped_attributes_count": [0] * n,
        "events": [[]] * n,
        "dropped_events_count": [0] * n,
        "links": [[]] * n,
        "dropped_links_count": [0] * n,
        "status_message": [""] * n,
        "status_code": [0] * n,
        "lang": ["en"] * n,
    }
    columnar = pd.DataFrame(base)
    columnar["attr:i"] = pd.Series(ints, dtype=object)
    columnar["attr:s"] = pd.Series(strs, dtype=object)
    columnar["attr:d"] = pd.Series(dbls, dtype=object)
    columnar["attr:b"] = pd.Series(bools, dtype=object)
    blob = encode_span_dataframe(
        columnar, attributes_spec={"i": "int", "s": "str",
                                   "d": "double", "b": "bool"})

    scalar_pdf = pd.DataFrame(base)
    scalar_pdf["attributes"] = [
        {"i": ints[k], "s": strs[k], "d": dbls[k], "b": bools[k]}
        for k in range(n)
    ]
    doc = pdf_to_document(scalar_pdf)
    m = trace_model()
    assert decode(blob, m) == decode(encode(doc, m), m)
