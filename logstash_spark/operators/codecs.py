"""Codec analogs: line / json_lines / multiline.

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
