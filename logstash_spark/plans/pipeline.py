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
Branches whose every stage declares ``row_local=True`` (adds/edits columns,
never changes cardinality) compile to a FUSED single pass instead: the
branch runs over the full DataFrame and each touched column is merged with
``when(pred, new).otherwise(old)`` — one select, no union, upstream stages
evaluated once (the compiler-applied form of the when/otherwise advice the
old docstring gave to users).  Cardinality-changing branches (drop/split/
clone) keep the branch+union shape.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Stage:
    """A named df->df transform (one filter plugin application).

    ``row_local=True`` declares the transform only adds or rewrites columns
    on existing rows (no filter/explode/union), making it eligible for the
    fused If path."""

    fn: Callable[[DataFrame], DataFrame]
    name: str = "stage"
    row_local: bool = False

    def apply(self, df: DataFrame) -> DataFrame:
        return self.fn(df)


def _is_row_local(node) -> bool:
    if isinstance(node, If):
        return all(_is_row_local(n) for n in node.then + node.otherwise)
    return getattr(node, "row_local", False)


_SNAP_SEQ = [0]  # unique snapshot prefix per fused-branch application
                 # (nested Ifs snapshot the same column names)


def _apply_guarded(df: DataFrame, nodes: list, pred_name: str,
                   positive: bool) -> DataFrame:
    """Run `nodes` over the FULL DataFrame, then merge: rows where the guard
    holds take the branch's values, others keep their originals (snapshot
    columns).  Columns the branch removed stay null on guard rows — the
    exact shape unionByName(allowMissingColumns) produces on the branch
    path.  Outer snapshot/pred columns (nested fusion) pass through."""
    if not nodes:
        return df
    _SNAP_SEQ[0] += 1
    pfx = f"__s{_SNAP_SEQ[0]}_"
    guard = (F.col(pred_name) if positive
             else ~F.coalesce(F.col(pred_name), F.lit(False)))
    passthrough = [c for c in df.columns
                   if c.startswith(("__s", "__pred_")) and c != pred_name]
    orig = [c for c in df.columns
            if c != pred_name and c not in passthrough]
    work = df.select("*", *[F.col(c).alias(f"{pfx}{c}") for c in orig])
    for n in nodes:
        work = n.apply(work)
    out_cols = [F.col(pred_name)] + [F.col(c) for c in passthrough]
    seen = set()
    for c in work.columns:
        if c.startswith(("__s", "__pred_")) or c == pred_name or c in passthrough:
            continue
        seen.add(c)
        if c in orig:
            out_cols.append(
                F.when(guard, F.col(c)).otherwise(F.col(f"{pfx}{c}")).alias(c))
        else:  # column the branch created: null on non-guard rows
            out_cols.append(F.when(guard, F.col(c)).alias(c))
    for c in orig:
        if c not in seen:  # column the branch removed: null on guard rows
            out_cols.append(F.when(~guard, F.col(f"{pfx}{c}")).alias(c))
    return work.select(*out_cols)


@dataclass
class If:
    """Conditional branch node (grammar.treetop:138-148 if/else-if/else)."""

    predicate: Callable[[DataFrame], Column]
    then: list = field(default_factory=list)
    otherwise: list = field(default_factory=list)
    name: str = "if"

    def apply(self, df: DataFrame) -> DataFrame:
        p = self.predicate(df)
        if all(_is_row_local(n) for n in self.then + self.otherwise):
            pred_name = f"__pred_{abs(id(self)) % 100000}"
            work = df.withColumn(pred_name, p)
            work = _apply_guarded(work, self.then, pred_name, positive=True)
            work = _apply_guarded(work, self.otherwise, pred_name, positive=False)
            return work.drop(pred_name)
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
