"""Logstash field-reference resolver: ``[a][b][0]`` paths -> Columns.

Reference semantics (logstash-core/src/main/java/org/logstash/
FieldReference.java:76-86 parse; Accessors.java:29-187 get/set):

* bare ``name`` and bracketed ``[name]`` address a top-level field;
* nested ``[a][b]`` walks maps/structs;
* an all-digit path part on a list is an index — non-negative 0-based,
  negative counts from the end (Accessors.java:152-187);
* referencing a missing top-level field resolves to nothing (callers
  decide: sprintf keeps the literal text, conditionals treat as null).

Spark mapping: struct/map access via ``getItem`` (works for both), list
indices via ``element_at`` (1-based, negative-from-end native — exactly the
reference's negative-index rule).  Pure Column expressions.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_PART = re.compile(r"\[([^\]]+)\]")


def parse_field_ref(name: str) -> list[str]:
    """``"[a][b][0]"`` -> ``["a", "b", "0"]``; bare ``"a"`` -> ``["a"]``.

    Mirrors FieldReference.parse — bare names are single-part references.
    """
    if name.startswith("["):
        parts = _PART.findall(name)
        if not parts:
            raise ValueError(f"bad field reference {name!r}")
        return parts
    return [name]


def _is_index(part: str) -> bool:
    return part.lstrip("-").isdigit()


def field_dtype(schema, name: str):
    """Resolve a field reference's DataType against a DataFrame schema.

    Returns None when any path part can't be statically resolved.  Used for
    the reference's compile-time type dispatch (EventCondition.java builds
    `in` as membership vs substring based on operand type)."""
    from pyspark.sql import types as T

    parts = parse_field_ref(name)
    dtype = None
    current = schema
    for i, p in enumerate(parts):
        if i == 0:
            if not isinstance(current, T.StructType) or p not in current.names:
                return None
            dtype = current[p].dataType
        elif _is_index(p):
            if isinstance(dtype, T.ArrayType):
                dtype = dtype.elementType
            else:
                return None
        elif isinstance(dtype, T.StructType) and p in dtype.names:
            dtype = dtype[p].dataType
        elif isinstance(dtype, T.MapType):
            dtype = dtype.valueType
        else:
            return None
    return dtype


def field_col(df_columns: list[str] | None, name: str) -> Column | None:
    """Resolve a field reference against a DataFrame's columns.

    Returns None when the top-level field doesn't exist (and df_columns is
    given) so callers can implement missing-field semantics; nested misses
    are nulls at runtime, like the reference's nil get."""
    parts = parse_field_ref(name)
    if df_columns is not None and parts[0] not in df_columns:
        return None
    col = F.col(parts[0])
    for p in parts[1:]:
        if _is_index(p):
            i = int(p)
            # element_at is 1-based and supports negative-from-end, the
            # exact Accessors.java:152-187 list rule
            col = F.element_at(col, i + 1 if i >= 0 else i)
        else:
            col = col.getItem(p)
    return col
