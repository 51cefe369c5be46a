"""Fused roundtrip projector (plans/projector.py).

``project_blob`` must emit exactly the tuples ``project_doc`` derives from
the generic decoded tree — same order, same values, same Python types —
including on documents that exercise every branch of the span token walk
(null/empty events and links, multi-event spans where only the first
projects but all consume tokens, diff-encoded times across spans, absent
attributes), and it must fall back to the generic path whenever the data
region is not tokenizable.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from compress_otel_collector_spark.codec import encode, trace_model
from compress_otel_collector_spark.codec.decoder import decode
from compress_otel_collector_spark.codec.values import CodecError
from compress_otel_collector_spark.plans.projector import (
    project_blob,
    project_doc,
)
from tests.test_tokdecode import _mkdoc, _mkspan


def _both(doc):
    m = trace_model()
    blob = encode(doc, m)
    return project_blob(blob, m), project_doc(decode(blob, m))


class TestProjectorEquality:
    @pytest.mark.parametrize("n", [0, 1, 13, 200])
    def test_mixed_spans(self, n):
        fast, generic = _both(_mkdoc(n))
        assert fast == generic
        assert len(fast) == n

    def test_multi_event_multi_link_span(self):
        # only the FIRST event/link projects, but tokens for all must be
        # consumed — and the event time diff chain threads through the
        # non-projected ones
        doc = _mkdoc(2)
        sp = doc["resourceSpans"][0]["scopeSpans"][0]["spans"][0]
        sp["events"] = [
            {"timeUnixNano": 1000 + j, "name": f"e{j % 2}",
             "attributes": {"phase": f"p{j % 2}"},
             "droppedAttributesCount": None}
            for j in range(5)
        ]
        sp["links"] = [
            {"traceId": bytes.fromhex(f"{j % 3:032x}"), "spanId": None,
             "traceState": None, "attributes": {"rel": f"r{j % 2}"},
             "droppedAttributesCount": None}
            for j in range(4)
        ]
        fast, generic = _both(doc)
        assert fast == generic
        row = fast[0]
        assert row[17] == 5 and row[23] == 4  # n_events, n_links

    def test_empty_event_and_link_arrays(self):
        doc = _mkdoc(1)
        sp = doc["resourceSpans"][0]["scopeSpans"][0]["spans"][0]
        sp["events"] = []
        sp["links"] = []
        # encoder null-coerces empty arrays on nullable fields
        fast, generic = _both(doc)
        assert fast == generic

    def test_null_attributes_and_scope_fields(self):
        doc = _mkdoc(3)
        for sp in doc["resourceSpans"][0]["scopeSpans"][0]["spans"]:
            sp["attributes"] = None
            sp["traceState"] = None
        doc["resourceSpans"][0]["scopeSpans"][0]["scope"]["name"] = None
        fast, generic = _both(doc)
        assert fast == generic
        assert fast[0][0] is None  # url from absent attributes

    def test_empty_resource_spans(self):
        fast, generic = _both({"resourceSpans": None})
        assert fast == generic == []
        fast, generic = _both({"resourceSpans": []})
        assert fast == generic == []

    def test_multiple_resource_and_scope_groups(self):
        rs_template = _mkdoc(4)["resourceSpans"][0]
        doc = {"resourceSpans": []}
        for g in range(3):
            rs = {
                "resource": {"attributes": {"service.name": f"svc{g}",
                                            "host.bucket": g},
                             "droppedAttributesCount": None},
                "scopeSpans": [
                    {"scope": {"name": f"scope{g}.{s}", "version": "1",
                               "attributes": {},
                               "droppedAttributesCount": None},
                     "spans": [_mkspan(i + g * 10) for i in range(3)],
                     "schemaUrl": f"https://schema/{g}" if s == 0 else None}
                    for s in range(2)
                ],
                "schemaUrl": None,
            }
            doc["resourceSpans"].append(rs)
        del rs_template
        fast, generic = _both(doc)
        assert fast == generic
        assert len(fast) == 18
        assert {r[27] for r in fast} == {"svc0", "svc1", "svc2"}

    def test_bit63_delta_stays_on_fast_path(self):
        """A ≤ -2^55 diff delta (capped varint, raw 9th byte bit 7 set)
        used to force the whole blob onto the scalar path; since r5 the
        tokenizer scalar-parses just that segment and the fused walk
        continues — values must still match the generic path exactly."""
        doc = _mkdoc(2)
        spans = doc["resourceSpans"][0]["scopeSpans"][0]["spans"]
        spans[0]["startTimeUnixNano"] = 2 ** 60
        spans[1]["startTimeUnixNano"] = 0  # delta -2^60: bit-63 varint
        fast, generic = _both(doc)
        assert fast == generic
        assert fast[0][8] == 2 ** 60 and fast[1][8] == 0

    def test_python_types(self):
        fast, _ = _both(_mkdoc(5))
        row = fast[1]
        assert type(row[8]) is int          # start_ns
        assert isinstance(row[2], str)      # trace hex
        assert row[28] == 3                 # host.bucket int via pool

    @given(st.integers(min_value=0, max_value=10 ** 6))
    @settings(max_examples=40, deadline=None)
    def test_fuzz_equality(self, seed):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 15))
        doc = _mkdoc(n)
        spans = doc["resourceSpans"][0]["scopeSpans"][0]["spans"]
        for sp in spans:
            sp["startTimeUnixNano"] = int(rng.integers(0, 2 ** 62))
            sp["endTimeUnixNano"] = int(rng.integers(0, 2 ** 62))
            if rng.integers(0, 3) == 0:
                sp["events"] = None
            if rng.integers(0, 3) == 0:
                sp["links"] = None
            if rng.integers(0, 4) == 0:
                sp["attributes"] = {}
        fast, generic = _both(doc)
        assert fast == generic


class TestProjectorCorruption:
    def test_truncated_region_raises_codec_error(self):
        m = trace_model()
        blob = encode(_mkdoc(6), m)
        cut = blob[: blob.index(b"cprval") + 6 + 4]
        with pytest.raises(CodecError):
            project_blob(cut, m)

    def test_bad_pool_index_raises_codec_error(self):
        m = trace_model()
        blob = encode(_mkdoc(2), m)
        # flip the LAST data byte to a large varint-ish value repeatedly
        # until some pool bound trips; assert only CodecError ever surfaces
        for pos in range(blob.index(b"cprval") + 6, len(blob)):
            corrupt = bytearray(blob)
            corrupt[pos] = 0x7F
            try:
                project_blob(bytes(corrupt), m)
            except CodecError:
                pass


class TestWrongTypedPoolValues:
    def test_int_probe_raises_codec_error_both_paths(self):
        """A corrupt blob can decode successfully into a tree whose
        free-map values have the wrong TYPE (found by the byte-flip fuzz
        campaign: one flipped type tag turns `probe` into an int). Both
        projection paths must fail with CodecError, never a task-killing
        TypeError."""
        m = trace_model()
        doc = _mkdoc(2)
        sp = doc["resourceSpans"][0]["scopeSpans"][0]["spans"][0]
        sp["events"] = [{"timeUnixNano": 1, "name": "f",
                         "attributes": {"probe": 5},
                         "droppedAttributesCount": None}]
        blob = encode(doc, m)
        with pytest.raises(CodecError, match="unexpected shape"):
            project_blob(blob, m)
        with pytest.raises(CodecError, match="unexpected shape"):
            project_doc(decode(blob, m))

    @pytest.mark.parametrize("poison",
                             [5, {"hops": 7}, "str-probe", [1, 2], 2.5])
    def test_unreferenced_bad_pool_entry_projects_on_both_paths(
            self, poison):
        """r4 verdict #4: a wrong-shaped pool entry that NO projected
        position references (here: a non-first event's attributes, which
        the generic path never touches) must project identically on both
        paths — the fast path's eager pre-projection defers the shape
        error to first reference (_BAD marker) instead of failing the
        whole blob."""
        m = trace_model()
        doc = _mkdoc(3)
        sp = doc["resourceSpans"][0]["scopeSpans"][0]["spans"][0]
        sp["events"] = [
            {"timeUnixNano": 1, "name": "f",
             "attributes": {"phase": "connect"},
             "droppedAttributesCount": None},
            {"timeUnixNano": 2, "name": "g",
             "attributes": {"probe": poison},
             "droppedAttributesCount": None},
        ]
        blob = encode(doc, m)
        fast = project_blob(blob, m)
        generic = project_doc(decode(blob, m))
        assert fast == generic
        assert fast[0][17] == 2  # both events counted

    @pytest.mark.parametrize("poison",
                             [5, {"hops": 7}, "str-probe", [1, 2], 2.5])
    def test_referenced_bad_pool_entry_still_raises(self, poison):
        """The same wrong-shaped entry in the FIRST (projected) event must
        keep failing the typed way on both paths."""
        m = trace_model()
        doc = _mkdoc(3)
        sp = doc["resourceSpans"][0]["scopeSpans"][0]["spans"][0]
        sp["events"] = [
            {"timeUnixNano": 1, "name": "f",
             "attributes": {"probe": poison},
             "droppedAttributesCount": None},
        ]
        blob = encode(doc, m)
        with pytest.raises(CodecError, match="unexpected shape"):
            project_blob(blob, m)
        with pytest.raises(CodecError, match="unexpected shape"):
            project_doc(decode(blob, m))


class TestPinnedFuzzSeeds:
    """r5 verdict #8: one pinned seed from each offline fuzz property
    (scripts/fuzz_codec.py) as fast deterministic regression — the 10s
    codec subset catches a projector/decoder regression without the
    5-minute campaign."""

    def test_hostile_pool_campaign_seed7_prefix(self):
        import numpy as np
        from scripts.fuzz_codec import random_doc
        m = trace_model()
        poisons = (5, {"hops": 7}, "str-probe", [1, 2], 2.5)
        hrng = np.random.default_rng(7)
        for trial in range(40):
            doc = random_doc(hrng)
            spans = doc["resourceSpans"][0]["scopeSpans"][0]["spans"]
            if not spans:
                continue
            sp = spans[int(hrng.integers(0, len(spans)))]
            poison = poisons[int(hrng.integers(0, len(poisons)))]
            referenced = bool(hrng.integers(0, 2))
            bad_ev = {"timeUnixNano": 2, "name": "g",
                      "attributes": {"probe": poison},
                      "droppedAttributesCount": None}
            ok_ev = {"timeUnixNano": 1, "name": "f",
                     "attributes": {"phase": "connect"},
                     "droppedAttributesCount": None}
            sp["events"] = [bad_ev] if referenced else [ok_ev, bad_ev]
            blob = encode(doc, m)
            if referenced:
                with pytest.raises(CodecError):
                    project_blob(blob, m)
                with pytest.raises(CodecError):
                    project_doc(decode(blob, m))
            else:
                assert project_blob(blob, m) == \
                    project_doc(decode(blob, m)), f"trial {trial}"

    def test_byteflip_corruption_pinned_blob(self):
        # every 7th position × all 8 campaign masks over one pinned blob:
        # CodecError or success, never an escape (TypeError etc.)
        m = trace_model()
        blob = encode(_mkdoc(6), m)
        for pos in range(0, len(blob), 7):
            for mask in (0x01, 0x02, 0x40, 0x7F, 0x80, 0xC0, 0xFE, 0xFF):
                c = bytearray(blob)
                c[pos] ^= mask
                try:
                    decode(bytes(c), m)
                    project_blob(bytes(c), m)
                except CodecError:
                    pass
