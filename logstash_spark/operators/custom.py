"""Custom-code escape hatch: the ruby-filter analog (SURVEY §2.8).

The reference's ruby filter runs arbitrary per-event code
(core-operations.md:82-93); per-row Python is forbidden by the north
rule, so the analog is an ARROW-BATCH contract: the user function sees a
pandas DataFrame per batch (vectorized ops, 10-100x a row loop) and may
return more or fewer rows (the plugin's `new_event_block` 1->N shape).

Scale shape: a narrow mapInPandas stage — no shuffle, payload ships once
via Arrow.  The schema must be declared (Spark cannot infer a Python
function's output), exactly like the Java Filter API declares its event
schema up front.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame


def batch_filter(df: DataFrame, fn: Callable, schema: str) -> DataFrame:
    """Apply `fn(pandas.DataFrame) -> pandas.DataFrame` per Arrow batch.

    `fn` may add/drop/modify rows and columns; `schema` is the DDL of the
    result.  This is the sanctioned custom-code path — use built-in
    Columns first; reach for this only when an operator genuinely cannot
    be expressed declaratively.
    """

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(run, schema)
