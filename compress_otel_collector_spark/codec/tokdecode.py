"""Vectorized fast path for decoding the post-magic data region.

The scalar decoder (``decoder.py``) reads the data region byte-by-byte
through a compiled closure tree. For the trace model — and any schema whose
inline (non-pool-payload) leaves are only INTEGER / BOOLEAN / presence
flags / array counts / pool indices — the entire region after ``cprval`` is
a pure sleb128 token stream: presence and boolean bytes (0/1) are valid
single-byte tokens, and every string / bytes / double / free-map payload
lives inside the meta-block pools, never inline. (Wire layout:
``/root/reference/compress-otel-exporter/encode.go:50-115``; region grammar
follows from the schema, ``model/trace.json`` — every STRING/BYTES/OBJECT
leaf under ``resourceSpans`` is pooled.)

Two stages:

1. :func:`tokenize` — numpy boundary scan over the whole region
   (terminator = byte < 0x80) + padded-matrix sleb128 value reconstruction,
   then ONE ``tolist()`` so the walker handles plain Python ints.
2. A walker function **generated from the Definition** (``exec``, once per
   schema): straight-line loads/branches per field, locals for pools and
   diff state — no per-field closure dispatch, no byte-level reads, no
   Reader object. Semantics are pinned identical to the scalar path by the
   roundtrip/golden/corrupt-input suites plus a dedicated scalar≡token
   property test.

Fallback contract: both stages may return ``None`` — the region is not
tokenizable when a continuation run exceeds 9 bytes, which a valid wire can
only produce via a 9-byte varint whose raw 9th byte has bit 7 set (values
with bit 63 set, i.e. diff deltas ≤ -2^55) and corrupt blobs can produce
arbitrarily. The caller then uses the scalar reader path, so correctness
never depends on tokenizability. Corrupt token streams surface as
``CodecError`` only: pool lookups are bounds-checked in the generated code
and token exhaustion raises ``IndexError`` which the caller converts.
"""

from __future__ import annotations

import numpy as np

from .definition import (
    ARRAY,
    BOOLEAN,
    INTEGER,
    OBJECT,
    Definition,
)
from .values import CodecError

#: sentinel pool for ids absent from the blob — len()==0 so every index
#: fails the bounds check and routes to _pool_fail, which reports the
#: missing-pool error (message parity with the scalar path).
_MISSING: tuple = ()


def _pool_fail(pool_id: str, idx: int, vp: dict) -> None:
    if pool_id not in vp:
        raise CodecError(f"reference to missing pool {pool_id!r}")
    n = len(vp[pool_id])
    raise CodecError(f"pool {pool_id!r} index {idx} out of range 0..{n - 1}")


def token_safe(d: Definition, use_pool: bool = True) -> bool:
    """True iff this subtree's inline wire form is pure flags + varints."""
    t = d.type
    if t in (INTEGER, BOOLEAN):
        return True
    if d.is_pool_member and use_pool:
        return True  # inline form is one varint index; payload is in a pool
    if t == OBJECT:
        if d.is_free_map:
            return False  # string-pool refs are fine but doubles/bytes not
        return all(token_safe(d.fields[n]) for n in d.sorted_field_names)
    if t == ARRAY:
        return token_safe(d.item)
    return False  # inline DOUBLE / BYTES / STRING


# --------------------------------------------------------------------------
# Stage 1: tokenizer
# --------------------------------------------------------------------------

def tokenize(data: bytes, start: int):
    """Token values of the sleb128 stream ``data[start:]`` as a Python list.

    Returns ``None`` when the simple boundary scan cannot be trusted (any
    token would exceed 9 bytes). Trailing unterminated continuation bytes
    are dropped — the walker hitting that truncation raises IndexError
    exactly where the scalar reader would raise "truncated varint".
    """
    b = np.frombuffer(data, dtype=np.uint8, count=len(data) - start,
                      offset=start)
    if b.size == 0:
        return []
    ends = np.flatnonzero(b < 0x80)
    if ends.size == 0:
        return None
    if b.size - int(ends[-1]) - 1 >= 9:
        # a trailing run of ≥9 continuation bytes may be a COMPLETE capped
        # 9-byte varint whose raw 9th byte has bit 7 set (reader.go:52-59)
        # — only the scalar reader can parse that
        return None
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    if int(lengths.max()) > 9:
        return None
    last = b[ends]
    if int(lengths.max()) == 1:
        # common all-flags/small-index shape: b - 2*(b & 0x40)
        v = last.astype(np.int64)
        return (v - ((v & 0x40) << 1)).tolist()
    # Stream decode: each byte contributes its 7 payload bits at
    # 7*(position-within-token); np.add.reduceat sums per token segment
    # (groups occupy disjoint bit ranges, so add == OR, no carry). The
    # trailing unterminated run, if any, is clipped before the scan.
    nb = ends[-1] + 1
    is_end = b[:nb] < 0x80
    # token_of(byte i) = terminators at-or-before i, minus 1 if i is itself
    # a terminator — i.e. cumsum(is_end) - is_end
    tok_of = np.cumsum(is_end)
    tok_of -= is_end
    pos_in_tok = np.arange(nb, dtype=np.int64) - starts[tok_of]
    contrib = (b[:nb] & 0x7F).astype(np.uint64) << (
        np.uint64(7) * pos_in_tok.astype(np.uint64))
    vals = np.add.reduceat(contrib, starts)
    nine = lengths == 9
    if nine.any():
        # 9th byte is RAW (reader.go:52-59): bit 7 lands on value bit 63
        vals[nine] += (last[nine].astype(np.uint64)
                       & np.uint64(0x80)) << np.uint64(56)
    need_sign = ((last & 0x40) != 0) & (lengths < 9)
    # two's-complement sign extension: subtract 1 << 7L (mod 2^64)
    vals[need_sign] -= np.uint64(1) << (
        np.uint64(7) * lengths[need_sign].astype(np.uint64))
    return vals.view(np.int64).tolist()


# --------------------------------------------------------------------------
# Stage 2: walker codegen
# --------------------------------------------------------------------------

class _Gen:
    __slots__ = ("lines", "n", "pools", "diffs")

    def __init__(self):
        self.lines: list[str] = []
        self.n = 0
        self.pools: dict[str, str] = {}   # pool id -> local var
        self.diffs: dict[str, str] = {}   # field path -> local var

    def var(self) -> str:
        self.n += 1
        return f"v{self.n}"

    def emit(self, depth: int, line: str) -> None:
        self.lines.append("    " * depth + line)

    def pool_var(self, pool_id: str) -> str:
        v = self.pools.get(pool_id)
        if v is None:
            v = f"p{len(self.pools)}"
            self.pools[pool_id] = v
        return v

    def diff_var(self, path: str) -> str:
        v = self.diffs.get(path)
        if v is None:
            v = f"d{len(self.diffs)}"
            self.diffs[path] = v
        return v


def _emit(g: _Gen, d: Definition, path: str, depth: int, out: str,
          use_pool: bool = True) -> None:
    """Emit statements assigning this node's decoded value to local ``out``."""
    if d.nullable and use_pool:  # pool entries carry no root null flag
        g.emit(depth, f"if toks[i] == 0:")
        g.emit(depth + 1, "i += 1")
        g.emit(depth + 1, f"{out} = None")
        g.emit(depth, "else:")
        g.emit(depth + 1, "i += 1")
        _emit_body(g, d, path, depth + 1, out, use_pool)
    else:
        _emit_body(g, d, path, depth, out, use_pool)


def _emit_body(g: _Gen, d: Definition, path: str, depth: int, out: str,
               use_pool: bool) -> None:
    t = d.type
    if t == INTEGER:
        g.emit(depth, f"{out} = toks[i]; i += 1")
        if d.diff_encode:
            dv = g.diff_var(path)
            g.emit(depth, f"if {dv} is not None: {out} += {dv}")
            g.emit(depth, f"{dv} = {out}")
        return
    if t == BOOLEAN:
        g.emit(depth, f"{out} = toks[i] != 0; i += 1")
        return
    if d.is_pool_member and use_pool:
        pid = d.pool_id(path)
        pv = g.pool_var(pid)
        g.emit(depth, f"{out} = toks[i]; i += 1")
        g.emit(depth, f"if 0 <= {out} < len({pv}): {out} = {pv}[{out}]")
        g.emit(depth, f"else: _pool_fail({pid!r}, {out}, vp)")
        return
    if t == OBJECT:
        prefix = path + " " if path else ""
        pairs = []
        for name in d.sorted_field_names:
            fv = g.var()
            _emit(g, d.fields[name], prefix + name, depth, fv)
            pairs.append(f"{name!r}: {fv}")
        g.emit(depth, f"{out} = {{{', '.join(pairs)}}}")
        return
    if t == ARRAY:
        item_path = (path + " " if path else "") + "item"
        nv, av, iv = g.var(), g.var(), g.var()
        g.emit(depth, f"{nv} = toks[i]; i += 1")
        g.emit(depth, f"{out} = []")
        g.emit(depth, f"{av} = {out}.append")
        g.emit(depth, f"for _ in range({nv}):")
        _emit(g, d.item, item_path, depth + 1, iv)
        g.emit(depth + 1, f"{av}({iv})")
        return
    raise CodecError(
        f"definition type {t} has no token form")  # pragma: no cover


def compile_walker(definition: Definition):
    """Generate ``walk(toks, vp) -> value`` for a token-safe Definition.

    Returns ``None`` when the schema has inline non-token leaves (the
    caller keeps the scalar path).
    """
    if not token_safe(definition):
        return None
    g = _Gen()
    root = g.var()
    _emit(g, definition, "", 1, root)
    g.emit(1, f"return {root}")
    prologue = ["def walk(toks, vp):", "    i = 0"]
    for pool_id, pv in g.pools.items():
        prologue.append(f"    {pv} = vp.get({pool_id!r}, _MISSING)")
    for dv in g.diffs.values():
        prologue.append(f"    {dv} = None")
    src = "\n".join(prologue + g.lines)
    ns = {"_MISSING": _MISSING, "_pool_fail": _pool_fail}
    exec(compile(src, "<tokdecode>", "exec"), ns)  # noqa: S102
    fn = ns["walk"]
    fn.__source__ = src  # for debugging / tests
    return fn
