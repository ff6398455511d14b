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

# -- escape styles (FieldReference.java:52-70 setEscapeStyle; decode/encode
#    rules from util/EscapeHandler.java) ------------------------------------

_PCT_SEQ = re.compile(r"%[0-9A-F]{2}")          # a valid %XX escape
_PCT_BARE = re.compile(r"%(?![0-9A-F]{2})")     # a literal % (not an escape)
_PCT_NEEDS_ESC = re.compile(r"%(?=[0-9A-F]{2})")
_AMP_SEQ = re.compile(r"&#([0-9]{2,});")

ESCAPE_STYLES = ("none", "percent", "ampersand")


def unescape_part(part: str, style: str = "none") -> str:
    """Decode one path part per the configured escape style.

    percent: URL-style %XX (uppercase hex) so `[`/`]` can appear in field
    names as %5B/%5D; a bare % not followed by two hex digits is a literal
    (EscapeHandler.PERCENT pre-escapes it to %25 before decoding, so
    "95%" stays "95%").  ampersand: HTML-entity-style &#NN; decimal
    codepoints, so `[`/`]` appear as &#91;/&#93;; a bare & is a literal.
    """
    if style == "none":
        return part
    if style == "percent":
        if "%" not in part or not _PCT_SEQ.search(part):
            return part
        from urllib.parse import unquote

        return unquote(_PCT_BARE.sub("%25", part), encoding="utf-8")
    if style == "ampersand":
        if "&" not in part:
            return part
        return _AMP_SEQ.sub(lambda m: chr(int(m.group(1))), part)
    raise ValueError(f"Invalid escape style: `{style}`")


def escape_part(part: str, style: str = "none") -> str:
    """Inverse of :func:`unescape_part` (EscapeHandler escape rules)."""
    if style == "none":
        return part
    if style == "percent":
        return (_PCT_NEEDS_ESC.sub("%25", part)
                .replace("[", "%5B").replace("]", "%5D"))
    if style == "ampersand":
        return (_AMP_SEQ.sub(lambda m: f"&#38;#{m.group(1)};", part)
                .replace("[", "&#91;").replace("]", "&#93;"))
    raise ValueError(f"Invalid escape style: `{style}`")


def parse_field_ref(name: str, escape_style: str = "none") -> list[str]:
    """``"[a][b][0]"`` -> ``["a", "b", "0"]``; bare ``"a"`` -> ``["a"]``.

    Mirrors FieldReference.parse — bare names are single-part references.
    With ``escape_style`` "percent"/"ampersand", each tokenized part is
    decoded (escapes exist so `[`/`]` can occur INSIDE a field name without
    breaking tokenization, FieldReference.java:52-70).
    """
    if name.startswith("["):
        parts = _PART.findall(name)
        if not parts:
            raise ValueError(f"bad field reference {name!r}")
    else:
        parts = [name]
    if escape_style != "none":
        parts = [unescape_part(p, escape_style) for p in parts]
    return parts


def _is_index(part: str) -> bool:
    return part.lstrip("-").isdigit()


def field_dtype(schema, name: str, escape_style: str = "none"):
    """Resolve a field reference's DataType against a DataFrame schema.

    Returns None when any path part can't be statically resolved.  Used for
    the reference's compile-time type dispatch (EventCondition.java builds
    `in` as membership vs substring based on operand type)."""
    from pyspark.sql import types as T

    parts = parse_field_ref(name, escape_style)
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


def field_col(df_columns: list[str] | None, name: str,
              escape_style: str = "none") -> Column | None:
    """Resolve a field reference against a DataFrame's columns.

    Returns None when the top-level field doesn't exist (and df_columns is
    given) so callers can implement missing-field semantics; nested misses
    are nulls at runtime, like the reference's nil get."""
    parts = parse_field_ref(name, escape_style)
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
