"""Codec analogs: line / json_lines / multiline / cef / graphite / es_bulk.

Reference semantics:
* line/plain — delimiter-split decode, default "\\n", UTF-8
  (logstash-core/src/main/java/org/logstash/plugins/codecs/Line.java:55-61;
  tokenizer logstash-core/src/main/java/org/logstash/common/
  BufferedTokenizer.java:45-69).
* json_lines — one JSON document per line (plugin registry
  rakelib/plugins-metadata.json:50).
* multiline — folds continuation lines into their parent event by pattern,
  `what => previous|next`, `negate` (plugin registry plugins-metadata.json:62;
  docs docs/reference/multiline.md).

Spark design: line/json_lines are trivial Column ops (`split`/`explode`,
`from_json`).  multiline is an order-sensitive fold: a *continuation
marker* column, a running sum over a window partitioned by the stream key
(one shuffle on the key — same partitioning as every downstream per-key
stage, so it's reused), then groupBy + ordered array concat.  No UDF, no
per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def line_decode(df: DataFrame, source: str, delimiter: str = "\n",
                target: str = "line") -> DataFrame:
    """One event per delimited token (Line.java:55-61 semantics)."""
    return df.withColumn(target, F.explode(F.split(F.col(source), F.lit(delimiter), -1)))


def json_lines_decode(df: DataFrame, source: str, schema: str,
                      delimiter: str = "\n") -> DataFrame:
    """Split then parse each line; parse failures tagged like the json
    filter (`_jsonparsefailure`)."""
    from logstash_spark.operators.parsers import json_filter

    lines = line_decode(df, source, delimiter, target="__line")
    return json_filter(lines, "__line", schema).drop("__line")


def csv_lines_decode(df: DataFrame, source: str, columns: list,
                     delimiter: str = "\n", separator: str = ",",
                     types: dict | None = None) -> DataFrame:
    """csv codec (plugin registry rakelib/plugins-metadata.json:10): one
    event per delimited line, each parsed as a CSV record (quote-aware JVM
    parser via the csv filter)."""
    from logstash_spark.operators.parsers import csv_filter

    lines = line_decode(df, source, delimiter, target="__line")
    return csv_filter(lines, "__line", columns, separator=separator,
                      types=types).drop("__line")


# avro codec (plugins-metadata.json:6): needs the spark-avro datasource
# package (`from_avro`/`to_avro`), which is not bundled with pip pyspark —
# at deploy time add `--packages org.apache.spark:spark-avro_2.13:<ver>`
# and decode with `from_avro(col, json_schema)`; the rest of the pipeline
# is unchanged.  Gated here so the module imports without the jar.
def avro_decode(df: DataFrame, source: str, json_schema: str,
                target: str = "record") -> DataFrame:
    try:
        # the python wrapper ships with pip pyspark; the JAR does not —
        # the missing class surfaces as an AnalysisException at call time
        from pyspark.sql.avro.functions import from_avro

        return df.withColumn(target, from_avro(F.col(source), json_schema))
    except Exception as exc:  # ImportError or AnalysisException (no jar)
        raise NotImplementedError(
            "avro codec needs the spark-avro package "
            "(--packages org.apache.spark:spark-avro_2.13)") from exc


def cef_decode(df: DataFrame, source: str, target_prefix: str = "cef_") -> DataFrame:
    """CEF codec decode (plugin registry rakelib/plugins-metadata.json:
    logstash-codec-cef): ``CEF:Version|Vendor|Product|DeviceVersion|
    SignatureID|Name|Severity|ext`` where ext is ``key=value`` pairs whose
    values may contain spaces (a value runs until the next ``key=``).

    Pure JVM: one `split` for the 7 header fields + `str_to_map` with a
    lookahead pair delimiter for the extension block.  Escaped-pipe headers
    (``\\|``) are out of scope for this decode (reference handles them;
    rare in practice — documented divergence).  Non-CEF rows tag
    ``_cefparsefailure``.
    """
    from logstash_spark.functions.decorators import add_tag

    is_cef = F.col(source).rlike(r"^CEF:\d+\|")
    body = F.regexp_replace(F.col(source), r"^CEF:", "")
    # materialized once: under the per-column CASE WHEN guards the split
    # would not be common-subexpression-eliminated (see operators/grok.py)
    # explode(array(...)) Generate barrier: predicate pushdown would
    # substitute the split through a plain projection (see grok.grok)
    df = df.withColumn("__cef_parts",
                       F.explode(F.array(F.split(body, r"\|", 8))))
    parts = F.col("__cef_parts")
    headers = ["version", "vendor", "product", "device_version",
               "signature_id", "name", "severity"]
    for i, h in enumerate(headers):
        df = df.withColumn(f"{target_prefix}{h}",
                           F.when(is_cef, F.get(parts, i)))
    ext = F.when(is_cef & (F.size(parts) > 7), F.get(parts, 7))
    df = df.withColumn(
        f"{target_prefix}ext",
        F.str_to_map(ext, F.lit(r"\s+(?=[\w.]+=)"), F.lit("=")))
    df = add_tag(df, "_cefparsefailure", when=~is_cef)
    return df.drop("__cef_parts")


def graphite_decode(df: DataFrame, source: str) -> DataFrame:
    """Graphite plaintext protocol decode (plugins-metadata.json:
    logstash-codec-graphite): ``metric.path value epoch_seconds`` per
    line -> (metric, metric_value, metric_ts).  Malformed rows tag
    ``_graphiteparsefailure``.  Pure Columns."""
    from logstash_spark.functions.decorators import add_tag

    df = df.withColumn(
        "__gr_parts",  # Generate barrier, see grok.grok
        F.explode(F.array(F.split(F.trim(F.col(source)), r"\s+"))))
    p = F.col("__gr_parts")
    val = F.get(p, 1).try_cast("double")
    ts = F.get(p, 2).try_cast("long")
    ok = (F.size(p) == 3) & val.isNotNull() & ts.isNotNull()
    df = (df.withColumn("metric", F.when(ok, F.get(p, 0)))
            .withColumn("metric_value", F.when(ok, val))
            .withColumn("metric_ts", F.when(ok, F.timestamp_seconds(ts))))
    df = add_tag(df, "_graphiteparsefailure", when=~ok)
    return df.drop("__gr_parts")


def graphite_encode(df: DataFrame, metric: str, value: str, ts: str,
                    target: str = "line") -> DataFrame:
    """Graphite plaintext encode: the inverse of :func:`graphite_decode`."""
    return df.withColumn(
        target,
        F.concat_ws(" ", F.col(metric),
                    F.col(value).cast("string"),
                    F.unix_timestamp(F.col(ts)).cast("string")))


def es_bulk_encode(df: DataFrame, index: str, id_col: str,
                   doc_cols: list[str], target: str = "bulk") -> DataFrame:
    """es_bulk codec encode (plugins-metadata.json: logstash-codec-es_bulk;
    the wire shape of the elasticsearch output's _bulk API): per event an
    action line ``{"index":{"_index":...,"_id":...}}`` + the document JSON
    on the next line.  `to_json` over a struct keeps it JVM-side; a file
    sink writing this column IS an ES bulk file."""
    action = F.concat(
        F.lit('{"index":{"_index":"'), F.lit(index),
        F.lit('","_id":"'), F.col(id_col).cast("string"), F.lit('"}}'))
    doc = F.to_json(F.struct(*[F.col(c) for c in doc_cols]))
    return df.withColumn(target, F.concat_ws("\n", action, doc))


def dots_encode(df: DataFrame, target: str = "dot") -> DataFrame:
    """dots codec (progress-meter encode: one '.' per event)."""
    return df.withColumn(target, F.lit("."))


def rubydebug_encode(df: DataFrame, target: str = "debug") -> DataFrame:
    """rubydebug codec analog: a readable per-event repr.  The reference
    pretty-prints via awesome_print; the contract is 'full event, human
    readable' — we emit canonical JSON of all columns (JVM `to_json`)."""
    return df.withColumn(target, F.to_json(F.struct(*[F.col(c) for c in df.columns])))


def multiline_assemble(
    df: DataFrame,
    line_col: str,
    key_col: str,
    order_col: str,
    pattern: str,
    negate: bool = False,
    what: str = "previous",
    out_col: str = "message",
    join_sep: str = "\n",
) -> DataFrame:
    """Fold continuation lines into events (multiline codec semantics).

    `what="previous"`: a line matching pattern (xor negate) belongs to the
    previous event; `what="next"`: it belongs to the following event.
    Returns one row per assembled event: (key_col, event_idx, out_col,
    n_lines, first_<order_col>).
    """
    matched = F.col(line_col).rlike(pattern)
    if negate:
        matched = ~matched
    if what == "previous":
        # matched lines continue the previous event -> unmatched lines start one
        is_start = ~matched
    elif what == "next":
        # matched lines attach to the NEXT event: an event starts right
        # after a run of matched lines ends, i.e. when the PREVIOUS line
        # was not matched
        w_prev = Window.partitionBy(key_col).orderBy(order_col)
        prev_matched = F.lag(matched, 1, False).over(w_prev)
        is_start = ~prev_matched
    else:
        raise ValueError(f"what must be 'previous' or 'next', got {what!r}")

    w = (Window.partitionBy(key_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    staged = df.withColumn("__evt", F.sum(is_start.cast("long")).over(w))
    return (
        staged.groupBy(key_col, F.col("__evt").alias("event_idx"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col(order_col).alias("o"),
                                                         F.col(line_col).alias("l")))),
                    lambda s: s["l"],
                ),
                join_sep,
            ).alias(out_col),
            F.count(F.lit(1)).alias("n_lines"),
            F.min(order_col).alias(f"first_{order_col}"),
        )
    )
