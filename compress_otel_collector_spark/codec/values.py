"""Value-tree helpers: null coercion, canonical normal form, pool keys.

Values are plain Python: ``int`` (int64), ``bool``, ``float``, ``bytes``,
``str``, ``dict`` (object / free map), ``list`` (array), ``None``. The
reference's boxed ``model.Value`` structs (``model/value.go:26-190``) carry no
extra state, so native Python values are the faithful analog; type tags are
recovered from the Python type (``bool`` checked before ``int``).
"""

from __future__ import annotations

from .definition import (
    ARRAY,
    BOOLEAN,
    BYTES,
    DOUBLE,
    INTEGER,
    OBJECT,
    STRING,
    Definition,
)


class CodecError(ValueError):
    pass


def python_type_tag(value) -> int:
    """Reference type tag 0-6 for a free-map value (model/value.go:13-23)."""
    if isinstance(value, bool):  # bool before int: bool is an int subclass
        return BOOLEAN
    if isinstance(value, int):
        return INTEGER
    if isinstance(value, float):
        return DOUBLE
    if isinstance(value, (bytes, bytearray)):
        return BYTES
    if isinstance(value, str):
        return STRING
    if isinstance(value, dict):
        return OBJECT
    if isinstance(value, (list, tuple)):
        return ARRAY
    raise CodecError(f"unsupported value type: {type(value).__name__}")


def is_null_value(value) -> bool:
    """The reference's lossy null coercion (encode.go:600-614).

    For *nullable* fields: integer 0, empty string/bytes/object/array encode
    as null. Booleans (incl. False) and doubles (incl. 0.0) never coerce.
    """
    if isinstance(value, bool):
        return False
    if isinstance(value, int):
        return value == 0
    if isinstance(value, (str, bytes, bytearray, dict, list, tuple)):
        return len(value) == 0
    return False


def freeze(value):
    """Canonical hashable key for dictionary pools.

    Structural, type-tagged (so 1, True, 1.0 are distinct — the reference
    pools are keyed by typed deep hash + comparator, model/value.go:40-302).
    """
    if value is None:
        return None
    t = type(value)
    tag = _TAG_BY_TYPE.get(t)
    if tag is None:
        tag = python_type_tag(value)  # subclasses / tuples / bytearray
    if tag == OBJECT:
        return (OBJECT,
                tuple(sorted((k, freeze(v)) for k, v in value.items())))
    if tag == ARRAY:
        return (ARRAY, tuple(freeze(v) for v in value))
    if tag == BYTES:
        return (BYTES, bytes(value))
    return (tag, value)


_TAG_BY_TYPE = {
    bool: BOOLEAN, int: INTEGER, float: DOUBLE, bytes: BYTES, str: STRING,
    dict: OBJECT, list: ARRAY,
}


def normalize(value, definition: Definition):
    """Post-roundtrip normal form: what ``decode(encode(x))`` returns.

    Applies the nullable null coercion recursively so oracle comparisons can
    run against pre-encode data (SURVEY.md §2.3.1).
    """
    if definition.nullable and (value is None or is_null_value(value)):
        return None
    if value is None:
        raise CodecError("null value for non-nullable field")
    t = definition.type
    if t == OBJECT:
        if definition.is_free_map:
            if not isinstance(value, dict):
                raise CodecError("free map field requires dict")
            return {k: _normalize_free(v) for k, v in value.items()}
        out = {}
        for name in definition.sorted_field_names:
            out[name] = normalize(value.get(name), definition.fields[name])
        return out
    if t == ARRAY:
        return [normalize(v, definition.item) for v in value]
    if t == INTEGER:
        if isinstance(value, bool) or not isinstance(value, int):
            raise CodecError("integer field requires int")
        return value
    if t == BOOLEAN:
        if not isinstance(value, bool):
            raise CodecError("boolean field requires bool")
        return value
    if t == DOUBLE:
        return float(value)
    if t == BYTES:
        return bytes(value)
    if t == STRING:
        if not isinstance(value, str):
            raise CodecError("string field requires str")
        return value
    raise CodecError(f"unknown definition type {t}")


def _normalize_free(value):
    """Free-map values roundtrip without coercion; nested nulls only legal
    directly under a map key (encode.go:497-515; arrays tag each item)."""
    if value is None:
        return None
    tag = python_type_tag(value)
    if tag == OBJECT:
        return {k: _normalize_free(v) for k, v in value.items()}
    if tag == ARRAY:
        out = []
        for v in value:
            if v is None:
                raise CodecError("null inside a free array is not encodable")
            out.append(_normalize_free(v))
        return out
    if tag == BYTES:
        return bytes(value)
    if tag == DOUBLE:
        return float(value)
    return value
