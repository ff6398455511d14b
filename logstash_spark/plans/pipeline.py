"""Pipeline compiler: declarative stage list -> DataFrame DAG.

This is our analog of the reference's config compiler + compiled pipeline
(logstash-core/src/main/java/org/logstash/config/ir/ConfigCompiler.java:62-77,
CompiledPipeline.java:456-507): a pipeline is an ordered list of stages;
`if/else` becomes a SplitDataset-style branch
(CompiledPipeline.java:564-586, DatasetCompiler.java:490-510 `Complement`):

    true  branch: df.filter(p)
    false branch: df.filter(~p | p.isNull())   # lazy complement; Logstash
                                               # sends condition-null events
                                               # down the else path
    rejoin:       unionByName(allowMissingColumns=True)

The predicate is constructed once and reused by both branches — the Column
object is shared, so Catalyst sees a common subexpression, mirroring the
reference's EventCondition cache (EventCondition.java:93-113).  Unlike the
reference there is no runtime Janino codegen to manage: Catalyst whole-stage
codegen fuses the per-branch expression chains automatically (SURVEY.md §4).

Scale note: branch+union does NOT shuffle — both branches are narrow over
the same scan, and Spark reuses the scan via plan-level common subplans.
For pipelines whose branches are pure per-row expression edits, prefer
`when(p, ...).otherwise(...)` columns inside one stage (no union overhead);
the If node exists for branches that change cardinality (drop/split/clone).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame


@dataclass
class Stage:
    """A named df->df transform (one filter plugin application)."""

    fn: Callable[[DataFrame], DataFrame]
    name: str = "stage"

    def apply(self, df: DataFrame) -> DataFrame:
        return self.fn(df)


@dataclass
class If:
    """Conditional branch node (grammar.treetop:138-148 if/else-if/else)."""

    predicate: Callable[[DataFrame], Column]
    then: list = field(default_factory=list)
    otherwise: list = field(default_factory=list)
    name: str = "if"

    def apply(self, df: DataFrame) -> DataFrame:
        p = self.predicate(df)
        true_df = df.filter(p)
        false_df = df.filter(~p | p.isNull())
        for node in self.then:
            true_df = node.apply(true_df)
        for node in self.otherwise:
            false_df = node.apply(false_df)
        return true_df.unionByName(false_df, allowMissingColumns=True)


@dataclass
class Pipeline:
    """input -> [filters] -> output, compiled lazily onto a DataFrame."""

    nodes: list

    def apply(self, df: DataFrame) -> DataFrame:
        for node in self.nodes:
            df = node.apply(df)
        return df

    __call__ = apply
