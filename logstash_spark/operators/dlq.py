"""Dead-letter-queue routing.

Reference semantics: events an output (or pipeline stage) cannot process
are appended with their failure reason to an on-disk DLQ segment store,
replayable through the dead_letter_queue input (logstash-core/src/main/
java/org/logstash/common/io/DeadLetterQueueWriter.java; settings
logstash-core/lib/logstash/environment.rb:103-108; fixture
qa/integration/fixtures/dlq_spec.yml; input plugin
rakelib/plugins-metadata.json:257).

Spark design (SURVEY.md §2.1): DLQ routing is predicate branching — the
failure branch gains `dlq_reason` + `dlq_ts` columns and is appended to a
dlq table (parquet dir standing in for Iceberg); the replay path is just a
read of that table back into a pipeline.  Both branches derive from one
scan; Catalyst computes the shared prefix once per branch with no
materialization barrier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dlq_split(df: DataFrame,
              reasons: list[tuple[Column, str]]) -> tuple[DataFrame, DataFrame]:
    """Split into (ok, dlq).  `reasons` is an ordered [(predicate, reason)]
    list; the first matching predicate supplies dlq_reason (matching the
    reference's single failure reason per DLQ entry)."""
    reason_col = F.lit(None).cast("string")
    for pred, why in reversed(reasons):
        reason_col = F.when(pred, F.lit(why)).otherwise(reason_col)
    tagged = df.withColumn("dlq_reason", reason_col)
    ok = tagged.filter(F.col("dlq_reason").isNull()).drop("dlq_reason")
    dlq = (tagged.filter(F.col("dlq_reason").isNotNull())
           .withColumn("dlq_ts", F.current_timestamp()))
    return ok, dlq


def dlq_write(dlq: DataFrame, path: str) -> None:
    """Append the failure branch to the dlq table (segment-store analog)."""
    dlq.write.mode("append").parquet(path)


def dlq_replay(spark, path: str) -> DataFrame:
    """dead_letter_queue-input analog: read entries back for reprocessing."""
    return spark.read.parquet(path)


def dlq_replay_stream(spark, path: str,
                      commit_offset_ts=None,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming dead_letter_queue input (plugins-metadata.json:257): tail
    the DLQ table as a file stream so repaired pipelines reprocess failures
    continuously.  `commit_offset_ts` mirrors the reference input's
    `commit_offsets`/sincedb start position: only entries dead-lettered
    after that timestamp replay (a pushed-down dlq_ts filter — partition/
    file pruning applies on a real table layout)."""
    schema = spark.read.parquet(path).schema  # stream sources need a schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    out = reader.parquet(path)
    if commit_offset_ts is not None:
        out = out.filter(F.col("dlq_ts") > F.lit(commit_offset_ts))
    return out
