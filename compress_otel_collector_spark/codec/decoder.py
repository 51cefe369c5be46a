"""Decoder for the value-tree dictionary wire format.

Wire parity: ``/root/reference/compress-otel-receiver/decode.go:12-334`` and
``reader.go:9-101`` (plus the sign-extension fix documented in
``varint.py``). Returns plain Python values (see ``values.py``); nullable
fields whose presence flag is 0 decode to ``None``.

Pool entries are decoded with ``use_pool=False`` (no root null flag, no root
pool indirection — decode.go:59-67) and a ``None`` diff state (diff-encoded
fields are schema-forbidden inside pools, enforced at schema load).
"""

from __future__ import annotations

import struct

from .definition import (
    ARRAY,
    BOOLEAN,
    BYTES,
    DOUBLE,
    INTEGER,
    OBJECT,
    STRING,
    Definition,
    SchemaError,
    field_path_to_definition,
)
from .values import CodecError
from .varint import decode_sleb128

_MAGIC = b"cprval"
_UNPACK_DOUBLE = struct.Struct("<d").unpack_from

#: free values (attribute maps) may nest arbitrarily on a VALID wire, but a
#: corrupt blob can synthesize pathological depth — cap it well below
#: Python's recursion limit so corruption raises CodecError, never
#: RecursionError. Real telemetry attribute trees are < 10 deep.
_MAX_FREE_DEPTH = 128


def _pool_get(pool, idx: int, what: str):
    """Bounds-checked pool lookup: a corrupt negative index would silently
    alias from the tail of the list (Python negative indexing)."""
    if not 0 <= idx < len(pool):
        raise CodecError(f"{what} index {idx} out of range 0..{len(pool)-1}")
    return pool[idx]


class _Reader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read_varint(self) -> int:
        try:
            v, self.pos = decode_sleb128(self.data, self.pos)
        except IndexError:
            raise CodecError("truncated varint") from None
        return v

    def read_bytes(self, n: int) -> bytes:
        if n < 0 or self.pos + n > len(self.data):
            raise CodecError("no data available for bytes")
        out = self.data[self.pos:self.pos + n]
        self.pos += n
        return out

    def read_string(self, n: int) -> str:
        try:
            return self.read_bytes(n).decode("utf-8")
        except UnicodeDecodeError as e:
            # corrupt input must always surface as CodecError, never a
            # codec-internal exception type (contract pinned by the
            # byte-flip property test)
            raise CodecError(f"invalid utf-8 in string: {e}") from None

    def read_bool(self) -> bool:
        return self.read_bytes(1)[0] != 0

    def read_double(self) -> float:
        if self.pos + 8 > len(self.data):
            raise CodecError("not enough data for double")
        (v,) = _UNPACK_DOUBLE(self.data, self.pos)
        self.pos += 8
        return v


def decode(blob: bytes, definition: Definition):
    """Decode one framed blob; inverse of :func:`encoder.encode`."""
    r = _Reader(bytes(blob))

    string_pool: list[str] = []
    for _ in range(r.read_varint()):
        string_pool.append(r.read_string(r.read_varint()))

    value_pools: dict[str, list] = {}
    for _ in range(r.read_varint()):
        pool_id = r.read_string(r.read_varint())
        try:
            pool_def = field_path_to_definition(pool_id, definition)
        except SchemaError as e:
            # a pool id the schema doesn't know = corrupt data, not a
            # schema-authoring mistake — surface it as a decode error
            raise CodecError(f"corrupt pool id on wire: {e}") from None
        entries: list = []
        value_pools[pool_id] = entries
        for _ in range(r.read_varint()):
            entries.append(
                _inner_decode(pool_def, pool_id, None, string_pool,
                              value_pools, r, use_pool=False)
            )

    if r.read_bytes(len(_MAGIC)) != _MAGIC:
        raise CodecError("magic error")
    return _inner_decode(definition, "", {}, string_pool, value_pools, r,
                         use_pool=True)


def _inner_decode(d: Definition, path: str, status, string_pool, value_pools,
                  r: _Reader, use_pool: bool):
    if d.nullable and use_pool:  # pool entries carry no root null flag
        if not r.read_bool():
            return None

    t = d.type
    if t == INTEGER:
        v = r.read_varint()
        if d.diff_encode:
            prev = status.get(path)
            if prev is not None:
                v += prev
            status[path] = v
        return v
    if t == BOOLEAN:
        return r.read_bool()
    if t == DOUBLE:
        return r.read_double()

    if d.is_pool_member and use_pool:
        pid = d.pool_id(path)
        if pid not in value_pools:
            raise CodecError(f"reference to missing pool {pid!r}")
        return _pool_get(value_pools[pid], r.read_varint(), f"pool {pid!r}")

    if t == BYTES:
        return r.read_bytes(r.read_varint())
    if t == STRING:
        return r.read_string(r.read_varint())
    if t == OBJECT:
        if d.is_free_map:
            return _free_map_decode(string_pool, r)
        prefix = path + " " if path else ""
        out = {}
        for name in d.sorted_field_names:
            out[name] = _inner_decode(d.fields[name], prefix + name, status,
                                      string_pool, value_pools, r, True)
        return out
    if t == ARRAY:
        n = r.read_varint()
        item_path = (path + " " if path else "") + "item"
        return [
            _inner_decode(d.item, item_path, status, string_pool, value_pools,
                          r, True)
            for _ in range(n)
        ]
    raise CodecError(f"unknown definition type {t}")


def _free_map_decode(string_pool, r: _Reader, depth: int = 0) -> dict:
    """decode.go:242-270."""
    if depth > _MAX_FREE_DEPTH:
        raise CodecError("free value nested deeper than "
                         f"{_MAX_FREE_DEPTH} levels")
    out = {}
    for _ in range(r.read_varint()):
        key = _pool_get(string_pool, r.read_varint(), "string pool")
        if not r.read_bool():
            out[key] = None
        else:
            out[key] = _free_value_decode(string_pool, r, depth + 1)
    return out


def _free_value_decode(string_pool, r: _Reader, depth: int = 0):
    """decode.go:272-334."""
    if depth > _MAX_FREE_DEPTH:
        raise CodecError("free value nested deeper than "
                         f"{_MAX_FREE_DEPTH} levels")
    tag = r.read_varint()
    if tag == INTEGER:
        return r.read_varint()
    if tag == BOOLEAN:
        return r.read_bool()
    if tag == DOUBLE:
        return r.read_double()
    if tag == BYTES:
        return r.read_bytes(r.read_varint())
    if tag == STRING:
        return _pool_get(string_pool, r.read_varint(), "string pool")
    if tag == OBJECT:
        return _free_map_decode(string_pool, r, depth + 1)
    if tag == ARRAY:
        return [_free_value_decode(string_pool, r, depth + 1)
                for _ in range(r.read_varint())]
    raise CodecError(f"unknown value type in free value: {tag}")
