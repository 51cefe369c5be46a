"""Wire-format codec for the value-tree dictionary encoding.

Parity target: /root/reference/compress-otel-exporter/encode.go and
/root/reference/compress-otel-receiver/decode.go (wire format documented in
each module's docstring with file:line cites).
"""

from .definition import (  # noqa: F401
    ARRAY,
    BOOLEAN,
    BYTES,
    DOUBLE,
    INTEGER,
    OBJECT,
    STRING,
    Definition,
    field_path_to_definition,
    load_definition,
    topological_pool_order,
    trace_model,
)
from .values import is_null_value, normalize, freeze  # noqa: F401
from .varint import encode_sleb128, decode_sleb128  # noqa: F401
from .encoder import encode  # noqa: F401
from .decoder import decode  # noqa: F401
