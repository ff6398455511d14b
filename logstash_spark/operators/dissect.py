"""dissect filter: positional delimiter-based extraction (no regex scan).

Reference: logstash-filter-dissect (default distribution,
rakelib/plugins-metadata.json:109; docs docs/reference/
field-extraction.md:13-47).  A dissect mapping like
``%{client} %{verb} [%{ts}]`` splits on the literal delimiters between
field references.

Spark design: the mapping compiles to ONE anchored regex where every
``%{field}`` becomes a lazy ``(.*?)`` group (final field greedy) and every
literal is escaped — so semantics stay positional (first occurrence of each
delimiter) while execution is a single JVM ``regexp_extract`` per field.
Skip fields ``%{}`` and ``%{?name}`` consume without emitting; append
``%{+field}`` concatenates to the previous capture of that field.
Failure tags ``_dissectfailure`` (per reference).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logstash_spark.functions.decorators import add_tag

_FIELD = re.compile(r"%\{([^}]*)\}")


class CompiledDissect:
    def __init__(self, mapping: str):
        # one entry per capture GROUP, in group order:
        # (field, is_append, order, preceding_literal)
        self.captures: list[tuple[str, bool, int, str]] = []
        self.fields: list[str] = []          # unique emitted fields, in order
        parts: list[str] = ["^"]
        pos = 0
        matches = list(_FIELD.finditer(mapping))
        for i, m in enumerate(matches):
            lit = mapping[pos : m.start()]
            if lit:
                parts.append(re.escape(lit))
            pos = m.end()
            name = m.group(1)
            greedy = i == len(matches) - 1 and pos == len(mapping)
            body = "(.*)" if greedy else "(.*?)"
            if name == "" or name.startswith("?"):
                parts.append(body.replace("(", "(?:", 1))
            else:
                if name.startswith("&"):
                    raise ValueError(
                        "dissect %{&field} indirect keys need per-row dynamic "
                        "column names — not expressible in a static DataFrame "
                        "schema (use kv for dynamic key/value payloads)")
                append = name.startswith("+")
                base = name.lstrip("+")
                order = 0
                if "/" in base:                     # %{+field/2} ordering
                    base, _, o = base.partition("/")
                    order = int(o)
                self.captures.append((base, append, order, lit))
                if base not in self.fields:
                    self.fields.append(base)
                parts.append(body)
        tail = mapping[pos:]
        if tail:
            parts.append(re.escape(tail))
        parts.append("$")
        self.regex = "".join(parts)

    def group_of(self, field: str) -> int:
        """First capture group emitting `field` (1-based)."""
        for i, (base, _a, _o, _l) in enumerate(self.captures):
            if base == field:
                return i + 1
        raise KeyError(field)


def dissect(
    df: DataFrame,
    source: str,
    mapping: str,
    convert: dict[str, str] | None = None,
    tag_on_failure: str = "_dissectfailure",
) -> DataFrame:
    d = CompiledDissect(mapping)
    src = F.col(source)
    # single-pass all-group extraction + match test (see grok.CompiledGrok):
    # rewrite the anchored match to sentinel-prefixed delimited captures,
    # split once; a non-match passes through unchanged, so the sentinel
    # prefix IS the match test — one regex pass total, no rlike.
    # (?s) is correct here, unlike grok: dissect is positional, its fields
    # legitimately span newlines (the reference tokenizer is not a regex and
    # has no line-boundary concept).
    # Rows whose source contains the sentinel route per-row to the
    # per-group regexp_extract path so the packing can't be confused.
    DELIM = "\x1e"
    rx = f"(?s){d.regex}"
    repl = DELIM + DELIM.join(f"${i + 1}" for i in range(len(d.captures)))
    # Materialize packed/parts/ok as real columns (see grok.grok): inline,
    # they'd sit only under CASE WHEN branches where codegen does no common-
    # subexpression elimination, re-running the regex once per field.
    # explode(array(...)) = a 1:1 Generate barrier, not a Project: predicate
    # pushdown substitutes aliases through a Project (a filter on an
    # extracted field would re-run the packed regex per predicate below the
    # projection) but never pushes a predicate referencing a generator
    # output past its Generate.  See grok.grok for the measured cost.
    has_delim = F.coalesce(src.contains(DELIM), F.lit(False))
    # n capture groups -> n+1 split parts; zero -> lone DELIM -> 2 parts
    n = len(d.captures) or 1
    df = df.withColumn(
        "__dis_parts",
        F.explode(F.array(F.split(F.regexp_replace(src, rx, repl), DELIM, -1))))
    arr = F.col("__dis_parts")
    ok_packed = (F.size(arr) == n + 1) & (F.element_at(arr, 1) == "")
    df = df.withColumn(
        "__dis_ok",
        src.isNotNull() & F.when(has_delim, src.rlike(rx)).otherwise(ok_packed))
    ok = F.col("__dis_ok")

    def raw(i: int):                        # capture group i (0-based)
        fast = F.element_at(arr, i + 2)
        slow = F.regexp_extract(src, rx, i + 1)
        return F.when(has_delim, slow).otherwise(fast)

    cols = {}
    for f in d.fields:
        # %{+field} append semantics (field-extraction.md): pieces join in
        # /order (stable on appearance for ties), separated by the literal
        # delimiter that precedes each appended piece
        pieces = [(i, order, lit) for i, (base, _a, order, lit)
                  in enumerate(d.captures) if base == f]
        pieces.sort(key=lambda t: (t[1], t[0]))
        col = raw(pieces[0][0])
        for i, _order, lit in pieces[1:]:
            col = F.concat(col, F.lit(lit), raw(i))
        col = F.when(ok & (col != ""), col)
        cast = (convert or {}).get(f)
        if cast:
            col = col.cast({"int": "long", "float": "double"}.get(cast, cast))
        cols[f] = col
    df = df.withColumns(cols)
    df = add_tag(df, tag_on_failure, when=~ok)
    return df.drop("__dis_parts", "__dis_ok")
