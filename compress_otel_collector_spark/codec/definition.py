"""Schema (``Definition``) system for the value-tree codec.

Semantics parity with the reference's schema layer
(``/root/reference/model/definition.go:13-22`` struct, ``:78-137`` load +
validation, ``:199-254`` topological pool order, ``:257-296`` field-path
resolution) and its concrete OTel trace schema instance
(``/root/reference/model/trace.json:1-241``).

Seven value types (``/root/reference/model/value.go:13-23``)::

    INTEGER=0  BOOLEAN=1  DOUBLE=2  BYTES=3  STRING=4  OBJECT=5  ARRAY=6

A ``Definition`` node says how one position in the document tree is typed and
encoded:

- ``nullable``     → a 1-byte presence flag precedes the value on the wire.
- ``pooled``       → the value is dictionary-encoded into a pool keyed by the
                     node's space-joined field path (e.g.
                     ``"resourceSpans item resource"``).
- ``share_pooled`` + ``share_pool_id`` → several fields share one pool keyed
                     by the pool id (e.g. spanId + parentSpanId).
- ``diff_encode``  → integers are delta-encoded against the previous value at
                     the same field path within one encoded blob.
- ``fields``       → child definitions when ``type==OBJECT``. ``fields is
                     None`` marks a *free map*: a schemaless map<string, any>
                     encoded with per-entry type tags.
- ``item``         → the element definition when ``type==ARRAY``.

Deviations from the reference (each strictly stronger, documented):

- Topological pool order here is **deterministic** (sorted field names,
  post-order) — the reference iterates Go maps, so its order is random per
  process; its decoder only needs children-before-parents, which sorted
  post-order also satisfies.
- Extra validation: a ``diff_encode`` field may not live inside a pooled
  subtree (the reference decoder would crash there: it passes a nil diff-state
  for pool entries, ``decode.go:61,107``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Optional

INTEGER = 0
BOOLEAN = 1
DOUBLE = 2
BYTES = 3
STRING = 4
OBJECT = 5
ARRAY = 6

TYPE_NAMES = {
    INTEGER: "integer",
    BOOLEAN: "boolean",
    DOUBLE: "double",
    BYTES: "bytes",
    STRING: "string",
    OBJECT: "object",
    ARRAY: "array",
}


class SchemaError(ValueError):
    pass


@dataclass(frozen=True)
class Definition:
    type: int
    nullable: bool = False
    pooled: bool = False
    share_pooled: bool = False
    share_pool_id: str = ""
    diff_encode: bool = False
    # None fields on an OBJECT marks a free map (schemaless attributes).
    fields: Optional[dict[str, "Definition"]] = None
    item: Optional["Definition"] = None
    # cached sorted field names (encode/decode iterate objects in this order)
    sorted_field_names: tuple[str, ...] = field(default=(), compare=False)

    def __post_init__(self):
        if self.fields is not None:
            object.__setattr__(
                self, "sorted_field_names", tuple(sorted(self.fields))
            )

    @property
    def is_free_map(self) -> bool:
        return self.type == OBJECT and self.fields is None

    @property
    def is_pool_member(self) -> bool:
        return self.pooled or self.share_pooled

    def pool_id(self, path: str) -> str:
        return self.share_pool_id if self.share_pooled else path


def _from_obj(obj: dict) -> Definition:
    """Build a Definition from a parsed-JSON dict.

    Accepts both this package's lowercase keys and the reference config's
    CamelCase keys (``model/trace.json`` uses ``Type``/``Nullable``/...).
    """

    def get(*names, default=None):
        for n in names:
            if n in obj:
                return obj[n]
        return default

    fields_obj = get("fields", "Fields")
    item_obj = get("item", "ItemDefinition")
    return Definition(
        type=int(get("type", "Type")),
        nullable=bool(get("nullable", "Nullable", default=False)),
        pooled=bool(get("pooled", "Pooled", default=False)),
        share_pooled=bool(get("share_pooled", "SharePooled", default=False)),
        share_pool_id=get("share_pool_id", "SharePoolId", default="") or "",
        diff_encode=bool(get("diff_encode", "DiffEncode", default=False)),
        fields=(
            {k: _from_obj(v) for k, v in fields_obj.items()}
            if fields_obj is not None
            else None
        ),
        item=_from_obj(item_obj) if item_obj is not None else None,
    )


def load_definition(source) -> Definition:
    """Load + validate a Definition from a JSON string, dict, or file path."""
    if isinstance(source, Definition):
        d = source
    elif isinstance(source, dict):
        d = _from_obj(source)
    else:
        text = source
        if "\n" not in str(source) and str(source).endswith(".json"):
            with open(source) as f:
                text = f.read()
        d = _from_obj(json.loads(text))
    validate(d)
    return d


def validate(root: Definition) -> None:
    """Share-pool invariants (definition.go:103-137) + extra safety rules."""
    shared: dict[str, Definition] = {}

    def dfs(d: Definition, on_path: set[str], in_pooled_subtree: bool) -> None:
        if d.type not in TYPE_NAMES:
            raise SchemaError(f"unknown value type {d.type}")
        if d.pooled and d.type in (INTEGER, BOOLEAN, DOUBLE):
            raise SchemaError("scalar int/bool/double nodes cannot be pooled")
        if d.diff_encode and d.type != INTEGER:
            raise SchemaError("diff_encode only valid on integer nodes")
        if d.diff_encode and in_pooled_subtree:
            raise SchemaError(
                "diff_encode field inside a pooled subtree is undecodable"
            )
        if d.share_pooled:
            if not d.share_pool_id:
                raise SchemaError("share_pooled requires share_pool_id")
            if d.share_pool_id in on_path:
                raise SchemaError(
                    "illegal shared pool nested on one tree path: "
                    + d.share_pool_id
                )
            prev = shared.get(d.share_pool_id)
            if prev is not None and prev != d:
                raise SchemaError(
                    "different definitions share pool " + d.share_pool_id
                )
            shared.setdefault(d.share_pool_id, d)
            on_path = on_path | {d.share_pool_id}
        child_pooled = in_pooled_subtree or d.is_pool_member
        if d.type == ARRAY:
            if d.item is None:
                raise SchemaError("array definition requires item")
            dfs(d.item, on_path, child_pooled)
        if d.type == OBJECT and d.fields is not None:
            for f in d.sorted_field_names:
                dfs(d.fields[f], on_path, child_pooled)

    dfs(root, set(), False)


def topological_pool_order(root: Definition) -> list[str]:
    """All pool ids, children strictly before parents, deterministically.

    Parity: ``definition.go:222-254`` — post-order DFS appending the node's
    path after its children (so nested pool refs resolve at decode time,
    ``decode.go:43-68``); shared pool ids appended once on first encounter.
    The reference walks Go maps (random order); we walk sorted field names so
    the order — and therefore the encoded blob — is deterministic.
    """
    result: list[str] = []
    seen: set[str] = set()

    def dfs(d: Definition, path: str) -> None:
        child_prefix = path + " " if path else ""
        if d.type == OBJECT and d.fields is not None:
            for f in d.sorted_field_names:
                dfs(d.fields[f], child_prefix + f)
        elif d.type == ARRAY:
            dfs(d.item, child_prefix + "item")
        if d.pooled and path not in seen:
            seen.add(path)
            result.append(path)
        if d.share_pooled and d.share_pool_id not in seen:
            seen.add(d.share_pool_id)
            result.append(d.share_pool_id)

    dfs(root, "")
    return result


def field_path_to_definition(path: str, root: Definition) -> Definition:
    """Resolve a space-joined field path (or a shared-pool id) to its node.

    Parity: ``definition.go:257-296`` (``FieldStringToDefinition`` +
    ``dfsSharedPoolId`` fallback).
    """
    cur: Optional[Definition] = root
    for part in path.split(" "):
        if cur is None:
            break
        if part == "item":
            cur = cur.item
        elif cur.fields is not None and part in cur.fields:
            cur = cur.fields[part]
        else:
            cur = None
    if cur is not None:
        return cur

    def find_shared(d: Definition) -> Optional[Definition]:
        if d.share_pooled and d.share_pool_id == path:
            return d
        if d.type == OBJECT and d.fields is not None:
            for f in d.sorted_field_names:
                r = find_shared(d.fields[f])
                if r is not None:
                    return r
        if d.type == ARRAY and d.item is not None:
            return find_shared(d.item)
        return None

    found = find_shared(root)
    if found is None:
        raise SchemaError(f"unresolvable field path or pool id: {path!r}")
    return found


# --------------------------------------------------------------------------
# The concrete OTel trace schema instance. Field-for-field the same encoding
# directives as /root/reference/model/trace.json:1-241 (authored here as a
# Python literal; type codes per model/value.go:13-23).
# --------------------------------------------------------------------------

def _d(t, nullable=False, pooled=False, share=None, diff=False, fields=None,
       item=None) -> dict:
    out = {"type": t, "nullable": nullable, "pooled": pooled,
           "diff_encode": diff}
    if share:
        out["share_pooled"] = True
        out["share_pool_id"] = share
    if fields is not None:
        out["fields"] = fields
    if item is not None:
        out["item"] = item
    return out


def _attributes() -> dict:
    # free map: OBJECT with no fields (trace.json:20-24)
    return _d(OBJECT, nullable=True, pooled=True)


_SPAN_FIELDS = {
    "traceId": _d(BYTES, share="traceId"),
    "spanId": _d(BYTES, nullable=True, share="spanId"),
    "traceState": _d(STRING, nullable=True, share="traceState"),
    "parentSpanId": _d(BYTES, nullable=True, share="spanId"),
    "name": _d(STRING, pooled=True),
    "kind": _d(INTEGER, nullable=True),
    "startTimeUnixNano": _d(INTEGER, diff=True),
    "endTimeUnixNano": _d(INTEGER, diff=True),
    "attributes": _attributes(),
    "droppedAttributesCount": _d(INTEGER, nullable=True),
    "events": _d(ARRAY, nullable=True, item=_d(OBJECT, fields={
        "timeUnixNano": _d(INTEGER, nullable=True, diff=True),
        "name": _d(STRING, nullable=True, pooled=True),
        "attributes": _attributes(),
        "droppedAttributesCount": _d(INTEGER, nullable=True),
    })),
    "droppedEventsCount": _d(INTEGER, nullable=True),
    "links": _d(ARRAY, nullable=True, item=_d(OBJECT, pooled=True, fields={
        "traceId": _d(BYTES, share="traceId"),
        "spanId": _d(BYTES, nullable=True, share="spanId"),
        "traceState": _d(STRING, nullable=True, share="traceState"),
        "attributes": _attributes(),
        "droppedAttributesCount": _d(INTEGER, nullable=True),
    })),
    "droppedLinksCount": _d(INTEGER, nullable=True),
    "status": _d(OBJECT, pooled=True, fields={
        "message": _d(STRING, nullable=True, pooled=True),
        "code": _d(INTEGER),
    }),
}

TRACE_MODEL_DICT = _d(OBJECT, fields={
    "resourceSpans": _d(ARRAY, nullable=True, item=_d(OBJECT, fields={
        "resource": _d(OBJECT, pooled=True, fields={
            "attributes": _attributes(),
            "droppedAttributesCount": _d(INTEGER, nullable=True),
        }),
        "scopeSpans": _d(ARRAY, nullable=True, item=_d(OBJECT, fields={
            "scope": _d(OBJECT, pooled=True, fields={
                "name": _d(STRING, nullable=True, pooled=True),
                "version": _d(STRING, nullable=True, pooled=True),
                "attributes": _attributes(),
                "droppedAttributesCount": _d(INTEGER, nullable=True),
            }),
            "spans": _d(ARRAY, nullable=True, item=_d(OBJECT,
                                                      fields=_SPAN_FIELDS)),
            "schemaUrl": _d(STRING, nullable=True, pooled=True),
        })),
        "schemaUrl": _d(STRING, nullable=True, pooled=True),
    })),
})

_TRACE_MODEL: Optional[Definition] = None


def trace_model() -> Definition:
    """The validated OTel trace Definition (cached)."""
    global _TRACE_MODEL
    if _TRACE_MODEL is None:
        _TRACE_MODEL = load_definition(TRACE_MODEL_DICT)
    return _TRACE_MODEL
