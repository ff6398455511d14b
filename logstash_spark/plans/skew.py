"""Skew handling: salted repartition + two-phase aggregation.

The reference is single-node and has no skew concept; at 10^12 turns a few
"hot" conversations (1% of convs carry 100x turns per FIXTURES.md F1) would
pin single reducers.  The north rule requires explicit salting + shuffle
tuning (BASELINE.json:north_rule).

Pattern: for aggregations over conv_id, pre-aggregate on a salted key
(conv_id, hash(turn_idx) % n_salts) — map-side combine plus n_salts-way fan
out of each hot key — then merge the partials on conv_id alone.  Only
algebraic aggregates (count/sum/min/max) can be merged this way; use
two_phase_agg for those and AQE skew-join for joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def with_salt(df: DataFrame, salt_from: str = "turn_idx",
              n_salts: int = DEFAULT_SALTS, col_name: str = "__salt") -> DataFrame:
    return df.withColumn(col_name, F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)))


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    salt_from: str = "turn_idx",
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """phase 1: groupBy(keys + salt) -> partials;  phase 2: groupBy(keys).

    partial_aggs produce intermediate columns; merge_aggs fold them.  E.g.
    count -> partial `count(1) as c`, merge `sum(c) as n`.
    """
    salted = with_salt(df, salt_from, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_count(df: DataFrame, keys: list[str], out: str = "n",
                 salt_from: str = "turn_idx", n_salts: int = DEFAULT_SALTS) -> DataFrame:
    return two_phase_agg(
        df, keys,
        [F.count(F.lit(1)).alias("__c")],
        [F.sum("__c").alias(out)],
        salt_from, n_salts,
    )
