"""Parser filters: kv, csv, json, xml — string field -> structured fields.

References (all default-distribution plugins, rakelib/plugins-metadata.json):
 * kv   (meta:169; docs docs/reference/field-extraction.md:50-70)
 * csv  (meta:96)
 * json (meta:164) — failure tag ``_jsonparsefailure``
 * xml  (meta:235)

Spark design: `str_to_map`, `from_csv`, `from_json`, `from_xml` — all
built-in JVM expressions; parse failures surface as nulls which drive the
reference's failure-tag branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logstash_spark.functions.decorators import add_tag


def kv(
    df: DataFrame,
    source: str,
    field_split: str = " ",
    value_split: str = "=",
    target: str = "kv",
    include_keys: list[str] | None = None,
    exclude_keys: list[str] | None = None,
    prefix: str = "",
    trim_key: str | None = None,
    trim_value: str | None = None,
    transform_key: str | None = None,
    transform_value: str | None = None,
) -> DataFrame:
    """k=v pair extraction into a map column (+ optional promoted columns).

    `include_keys` promotes selected keys to top-level string columns, the
    common relational usage; the full map lands in `target`.  The plugin's
    shaping options map to pure map expressions (kv filter README):
    trim_key/trim_value strip the given chars from both ends (btrim);
    transform_key/transform_value apply lowercase/uppercase/capitalize;
    exclude_keys drops entries (map_filter); prefix renames every key.
    Applied in the plugin's order: trim -> transform -> exclude -> prefix.
    """
    _XFORM = {"lowercase": F.lower, "uppercase": F.upper,
              "capitalize": F.initcap}
    m = F.str_to_map(F.col(source), F.lit(field_split), F.lit(value_split))
    if trim_key:
        m = F.transform_keys(m, lambda k, v: F.btrim(k, F.lit(trim_key)))
    if trim_value:
        m = F.transform_values(m, lambda k, v: F.btrim(v, F.lit(trim_value)))
    if transform_key:
        m = F.transform_keys(m, lambda k, v: _XFORM[transform_key](k))
    if transform_value:
        m = F.transform_values(m, lambda k, v: _XFORM[transform_value](v))
    if exclude_keys:
        m = F.map_filter(m, lambda k, v: ~k.isin(exclude_keys))
    if prefix:
        m = F.transform_keys(m, lambda k, v: F.concat(F.lit(prefix), k))
    df = df.withColumn(target, m)
    for k in include_keys or []:
        df = df.withColumn(k, F.element_at(F.col(target), prefix + k))
    return df


def csv_filter(
    df: DataFrame,
    source: str,
    columns: list[str],
    separator: str = ",",
    types: dict[str, str] | None = None,
    target: str | None = None,
    quote_char: str = '"',
    skip_empty_columns: bool = False,
) -> DataFrame:
    """Parse a delimited line into named columns via from_csv (JVM parser,
    quote-aware — unlike a naive split).  `quote_char` and
    `skip_empty_columns` map to the plugin's options of the same names
    (empty-column skip = treat "" as null, from_csv's emptyValue)."""
    schema = ", ".join(f"`{c}` {((types or {}).get(c, 'string')).upper()}" for c in columns)
    opts = {"sep": separator, "quote": quote_char}
    if skip_empty_columns:
        opts["nullValue"] = ""      # "" columns parse as null, not ""
    parsed = F.from_csv(F.col(source), schema, opts)
    if target:
        return df.withColumn(target, parsed)
    for c in columns:
        df = df.withColumn(c, parsed.getField(c))
    return df


def json_filter(
    df: DataFrame,
    source: str,
    schema: str,
    target: str | None = None,
    tag_on_failure: str = "_jsonparsefailure",
) -> DataFrame:
    """Parse a JSON string field.  Schema-on-read keeps it columnar; for
    truly dynamic JSON use schema "map<string,string>"."""
    parsed = F.from_json(F.col(source), schema)
    # from_json is PERMISSIVE (null-filled struct on bad input); the failure
    # tag needs a real parse test -> try_parse_json returns null on invalid
    ok = F.try_parse_json(F.col(source)).isNotNull()
    if target:
        df = df.withColumn(target, parsed)
    else:
        field_names = [f.strip().split(" ")[0].strip("`") for f in schema.split(",")] \
            if not schema.startswith("map") else []
        if field_names:
            for c in field_names:
                df = df.withColumn(c, parsed.getField(c))
        else:
            df = df.withColumn("json", parsed)
    return add_tag(df, tag_on_failure, when=~ok)


def xml_filter(df: DataFrame, source: str, schema: str, target: str = "xml",
               tag_on_failure: str = "_xmlparsefailure") -> DataFrame:
    parsed = F.from_xml(F.col(source), schema)
    df = df.withColumn(target, parsed)
    return add_tag(df, tag_on_failure, when=parsed.isNull())


def yaml_filter(
    df: DataFrame,
    source: str,
    schema: str,
    target: str | None = None,
    flat: bool = False,
    tag_on_failure: str = "_yamlparsefailure",
) -> DataFrame:
    """Parse a YAML string field (logstash-filter-yaml, meta:240).

    Two paths, like the reference's Psych parse but typed:

    * ``flat=True`` — the common config/telemetry shape ``key: value`` per
      line.  Pure JVM: strip comments, ``str_to_map`` on lines, then cast
      through the given schema via a synthesized JSON doc.  Zero Python.
    * ``flat=False`` — full YAML via an Arrow-batched pandas UDF
      (``yaml.safe_load`` -> JSON string), then JVM ``from_json``.  The
      Python stage touches ONLY the source column (one string in, one
      string out per row, Arrow transfer) — at 100 TB this is the same
      bounded-Python pattern as the multimodal decode stage; everything
      downstream of the JSON string stays in codegen.

    Failure (invalid YAML / non-mapping root) -> ``tag_on_failure``.
    """
    if flat:
        from pyspark.sql.types import StructType

        # drop comment lines and trailing comments, then line-wise k: v map
        cleaned = F.regexp_replace(F.col(source), r"(?m)^\s*#.*\n?|\s+#.*$", "")
        # materialized once: under the per-field when() guard the map parse
        # is conditional, so codegen subexpression elimination would not
        # dedupe it across fields (see operators/grok.py packed-split note)
        # explode(array(...)) = 1:1 Generate barrier so predicate pushdown
        # can't substitute the map parse below this point (see grok.grok)
        df = df.withColumn(
            "__yaml_map",
            F.explode(F.array(
                F.str_to_map(F.trim(cleaned), F.lit("\n"), F.lit(r":\s+")))))
        m = F.col("__yaml_map")
        fields = StructType.fromDDL(schema).fields
        parsed = F.struct(*[
            F.element_at(m, f.name).try_cast(f.dataType).alias(f.name)
            for f in fields])
        # str_to_map maps "" -> {""->NULL} and separator-less garbage to
        # {text->NULL}; a doc is valid only if some line actually parsed as
        # `k: v` (mirrors the full path rejecting non-mapping roots)
        ok = m.isNotNull() & (F.size(
            F.map_filter(m, lambda _k, v: v.isNotNull())) > 0)
        df = df.withColumn(target or "yaml", F.when(ok, parsed))
        return add_tag(df, tag_on_failure, when=~ok).drop("__yaml_map")
    else:
        import json as _json

        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        def _series_conv(s):
            import yaml as _yaml

            def conv(v):
                if v is None:
                    return None
                try:
                    doc = _yaml.safe_load(v)
                except Exception:
                    return None
                if not isinstance(doc, dict):
                    return None
                return _json.dumps(doc, sort_keys=True)

            return s.map(conv)

        # real annotation objects: `from __future__ import annotations`
        # stringifies inline hints, which pandas_udf can't resolve
        _series_conv.__annotations__ = {"s": pd.Series, "return": pd.Series}
        json_doc = pandas_udf(_series_conv, "string")(F.col(source))

    parsed = F.from_json(json_doc, schema)
    ok = json_doc.isNotNull() & F.try_parse_json(json_doc).isNotNull()
    df = df.withColumn(target or "yaml", parsed)
    return add_tag(df, tag_on_failure, when=~ok)
