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


def dlq_expire(path: str, max_age_seconds: int | None = None,
               max_bytes: int | None = None, now=None) -> dict:
    """DLQ retention policy (environment.rb:103-108:
    ``dead_letter_queue.retain.age`` and ``dead_letter_queue.max_bytes``
    with ``storage_policy => drop_older``; DeadLetterQueueWriter's segment
    expiry).  Segments here are the dlq table's parquet part files:

    * age: a segment whose NEWEST entry (parquet footer max(dlq_ts) — no
      data scan) is older than ``max_age_seconds`` is deleted, mirroring
      the reference deleting segments whose last entry passed retain.age;
    * size: oldest-first deletion until the table is <= ``max_bytes``
      (the reference's drop_older storage policy).

    Returns {"removed": [paths], "kept_files": n, "kept_bytes": n}.
    Replay after expiry honors commit offsets naturally: expired entries
    are simply absent, newer-than-offset entries still stream.
    """
    import datetime as _dt
    import os

    import pyarrow.parquet as _pq

    now = now or _dt.datetime.now(_dt.timezone.utc)
    if now.tzinfo is None:
        now = now.replace(tzinfo=_dt.timezone.utc)
    segs = []                                  # (newest_ts, bytes, filepath)
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            fp = os.path.join(root, fn)
            newest = None
            meta = _pq.ParquetFile(fp).metadata
            ts_idx = {meta.schema.column(i).name: i
                      for i in range(meta.num_columns)}.get("dlq_ts")
            if ts_idx is not None:
                for rg in range(meta.num_row_groups):
                    st = meta.row_group(rg).column(ts_idx).statistics
                    if st is not None and st.max is not None:
                        m = st.max
                        if m.tzinfo is None:
                            m = m.replace(tzinfo=_dt.timezone.utc)
                        newest = m if newest is None else max(newest, m)
            if newest is None:                 # no stats: fall back to mtime
                newest = _dt.datetime.fromtimestamp(
                    os.path.getmtime(fp), _dt.timezone.utc)
            segs.append((newest, os.path.getsize(fp), fp))

    removed = []
    if max_age_seconds is not None:
        cutoff = now - _dt.timedelta(seconds=max_age_seconds)
        for newest, _sz, fp in list(segs):
            if newest < cutoff:
                os.remove(fp)
                removed.append(fp)
                segs.remove((newest, _sz, fp))
    if max_bytes is not None:
        total = sum(sz for _t, sz, _f in segs)
        for newest, sz, fp in sorted(segs):    # oldest first
            if total <= max_bytes:
                break
            os.remove(fp)
            removed.append(fp)
            total -= sz
        segs = [s for s in segs if s[2] not in set(removed)]
    return {"removed": sorted(removed), "kept_files": len(segs),
            "kept_bytes": sum(sz for _t, sz, _f in segs)}


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
