"""Logstash sprintf `%{...}` template compiler -> pure Spark Column.

Reference semantics (logstash-core/src/main/java/org/logstash/
StringInterpolation.java:66-137):

* ``%{field}``      -> field value; missing field leaves the literal text
  (line 125-127); list values joined with "," (KeyNode.join, 118-119).
* ``%{+%s}``        -> @timestamp as epoch seconds (79-83).
* ``%{{javaFmt}}``  -> @timestamp formatted with a java.time pattern, UTC
  (84-101).
* ``%{+jodaFmt}``   -> legacy Joda format of @timestamp (102-113); the
  common subset (yyyy MM dd HH mm ss) is pattern-compatible with java.time,
  which is what we support.

No UDFs: the template compiles to ``concat(lit, col.cast(string),
date_format(ts, fmt), ...)`` so it stays inside whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN = re.compile(r"%\{([^}]+)\}|%\{\{([^}]+)\}\}")
# match %{{...}} first (double brace), then %{...}
_SPLITTER = re.compile(r"(%\{\{[^}]+\}\}|%\{[^}]+\})")

TIMESTAMP_FIELD = "ts"  # our @timestamp analog on the transcript schema


def _field_column(df_columns: list[str], name: str) -> Column | None:
    """Resolve a Logstash field reference to a Column if it exists.

    Shared resolver (functions/fieldref.py): bare names, `[a][b]` paths,
    list indexing incl. negative indices (Accessors.java:152-187)."""
    from logstash_spark.functions.fieldref import field_col

    return field_col(df_columns, name)


def _render_value(col: Column) -> Column:
    # Lists join with "," (KeyNode.join); scalars cast to string.
    return col.cast("string")


def compile_sprintf(template: str, df_columns: list[str],
                    ts_field: str = TIMESTAMP_FIELD) -> Column:
    """Compile a sprintf template into a single Column expression."""
    parts: list[Column] = []
    for piece in _SPLITTER.split(template):
        if not piece:
            continue
        if piece.startswith("%{{") and piece.endswith("}}"):
            fmt = piece[3:-2]
            if fmt == "TIME_NOW":
                parts.append(F.date_format(F.current_timestamp(),
                                           "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"))
            else:
                parts.append(F.date_format(F.col(ts_field), fmt))
        elif piece.startswith("%{") and piece.endswith("}"):
            inner = piece[2:-1]
            if inner == "+%s":
                parts.append(F.unix_timestamp(F.col(ts_field)).cast("string"))
            elif inner.startswith("+"):
                parts.append(F.date_format(F.col(ts_field), inner[1:]))
            else:
                col = _field_column(df_columns, inner)
                if col is None:
                    # missing field -> literal %{name} text (line 125-127)
                    parts.append(F.lit(piece))
                else:
                    parts.append(F.coalesce(_render_value(col), F.lit(piece)))
        else:
            parts.append(F.lit(piece))
    if not parts:
        return F.lit("")
    if len(parts) == 1:
        return parts[0]
    return F.concat(*parts)
