"""Bucketed-table helpers: co-located joins and aggregations.

At 100 TB the dominant cost of a repeated join/agg on the same key is the
shuffle.  Hive-style bucketing (`DataFrameWriter.bucketBy` + sortBy)
persists the partitioning WITH the data, so every later join or groupBy
on the bucket key is planned WITHOUT an Exchange on the bucketed side —
the reference has no analog (its pipeline is single-node); this is the
Spark-native answer to "pre-partition the stream by conv_id once, reuse
forever".

Caveats encoded here rather than rediscovered per-pipeline:
* bucketed writes go through saveAsTable (bucket metadata lives in the
  catalog, not the parquet footer) — plain .parquet(path) silently drops
  bucketing;
* both sides must have the SAME bucket count for a shuffle-free join
  (Spark does not yet coalesce mismatched buckets by default);
* `spark.sql.sources.bucketing.enabled` must stay true (default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 32,
                   mode: str = "overwrite") -> None:
    """Persist `df` bucketed+sorted by `key` into managed table `table`."""
    (df.write.mode(mode)
       .bucketBy(buckets, key)
       .sortBy(key)
       .saveAsTable(table))


def join_is_shuffle_free(spark: SparkSession, left_table: str,
                         right_table: str, key: str) -> bool:
    """True iff joining the two bucketed tables on `key` plans with zero
    Exchange nodes — the co-location evidence used by tests/bench."""
    out = spark.table(left_table).join(spark.table(right_table), key)
    plan = out._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
