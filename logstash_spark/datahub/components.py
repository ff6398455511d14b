"""Connected components over candidate-pair graphs (dedup clustering).

MinHash/SimHash/embedding-LSH emit candidate PAIRS (datahub/dedup.py); a
production corpus dedup needs the duplicate CLUSTERS those pairs imply —
transitively: if (a,b) and (b,c) are near-dups, {a,b,c} is one group with
one keeper.  That is connected components on the candidate graph.

Algorithm: iterative min-label propagation — every node adopts the
minimum component id among itself and its neighbors until no label
changes.  Each iteration is one shuffle (join on the edge key) + one
aggregation; convergence takes O(graph diameter) rounds.  Dedup graphs
are overwhelmingly star/clique shaped (a popular page duplicated across
many URLs), so the diameter is tiny — 2-4 rounds in practice.  For
adversarial long-chain graphs the alternating large-star/small-star
variant (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) converges in O(log n) rounds with the same per-round plan shape;
the `large_star_small_star` flag switches to it.

Scale notes: lineage is truncated every round with localCheckpoint —
without it the logical plan doubles per iteration and Catalyst analysis
time explodes by round ~15.  The per-round shuffle key is the node id; a
hot node (one doc duplicated 10^6 times) skews one reducer — AQE skew
splitting handles it because the aggregation is a MIN (partial-agg
friendly, map-side combine collapses the hot key before the shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    return fwd.union(fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))) \
              .filter(F.col("u") != F.col("v")).distinct()


def connected_components(edges: DataFrame, src: str = "a", dst: str = "b",
                         max_iter: int = 25,
                         large_star_small_star: bool = False) -> DataFrame:
    """Return (id, comp): every node labeled with the min node id of its
    component.  ``edges`` is an undirected candidate-pair frame.

    Raises RuntimeError if ``max_iter`` rounds don't converge (never seen
    on dedup graphs; raise the cap or switch the star variant for
    pathological chains).
    """
    if large_star_small_star:
        return _cc_two_star(edges, src, dst, max_iter)
    sym = _symmetrize(edges, src, dst).localCheckpoint(eager=True)
    labels = (sym.select(F.col("u").alias("id")).distinct()
              .withColumn("comp", F.col("id")))
    for _ in range(max_iter):
        nbr_min = (sym.join(labels.withColumnRenamed("id", "v"), "v")
                   .groupBy("u").agg(F.min("comp").alias("nbr_comp")))
        new = (labels.join(nbr_min.withColumnRenamed("u", "id"), "id", "left")
               .select("id",
                       F.least("comp", F.coalesce("nbr_comp", "comp"))
                       .alias("comp")))
        new = new.localCheckpoint(eager=True)  # truncate per-round lineage
        changed = (new.alias("n").join(labels.alias("o"), "id")
                   .filter(F.col("n.comp") != F.col("o.comp")).count())
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components: no convergence in {max_iter} rounds "
        "(long-chain graph? use large_star_small_star=True)")


def _star_round(e: DataFrame, large: bool) -> DataFrame:
    """One star operation over a SYMMETRIC edge set (Kiveris SoCC'14 §3).

    Per node u with m = min(N(u) ∪ {u}): large-star links every strictly
    larger neighbor to m; small-star links every smaller-or-equal neighbor
    (and u itself) to m.  Output is a plain edge set (self-loops dropped).
    """
    m = (e.groupBy("u").agg(F.min("v").alias("__nmin"))
         .select("u", F.least("__nmin", F.col("u")).alias("m")))
    joined = e.join(m, "u")
    sel = joined.filter(F.col("v") > F.col("u") if large
                        else F.col("v") <= F.col("u"))
    out = sel.select(F.col("v").alias("u"), F.col("m").alias("v")) \
             .union(m.select("u", F.col("m").alias("v")))
    return out.filter(F.col("u") != F.col("v")).distinct()


def _cc_two_star(edges: DataFrame, src: str, dst: str,
                 max_iter: int) -> DataFrame:
    """Alternating large-star / small-star (Kiveris et al., SoCC'14):
    O(log n) rounds on ANY graph shape — the long-chain insurance the
    min-propagation default doesn't need on real dedup graphs."""
    e = _symmetrize(edges, src, dst).localCheckpoint(eager=True)
    canon_prev = None
    for _ in range(max_iter):
        e = _symmetrize(_star_round(e, large=True), "u", "v")
        out = _star_round(e, large=False)
        canon = (out.select(F.least("u", "v").alias("x"),
                            F.greatest("u", "v").alias("y"))
                 .distinct().localCheckpoint(eager=True))
        e = _symmetrize(canon, "x", "y")
        if canon_prev is not None:
            same = (canon.exceptAll(canon_prev).count() == 0
                    and canon_prev.exceptAll(canon).count() == 0)
            if same:
                break
        canon_prev = canon
    else:
        raise RuntimeError(
            f"two-star components: no fixpoint in {max_iter} rounds")
    # fixpoint edge set is a union of stars centered at component minima
    comp = e.groupBy("u").agg(F.min("v").alias("comp"))
    return comp.select(F.col("u").alias("id"),
                       F.least("comp", F.col("u")).alias("comp"))


def dedup_groups(df: DataFrame, pairs: DataFrame,
                 id_col: str = "doc_id",
                 src: str = "a", dst: str = "b") -> DataFrame:
    """Full near-dup clustering: candidate pairs -> components -> one row
    per doc with (doc_id, group_id, is_keeper).  Docs with no candidate
    pair are their own singleton group (keeper).  The keeper is the min
    doc_id of the group — the reference-style deterministic survivor.
    """
    comp = connected_components(pairs, src, dst)
    out = (df.select(id_col)
           .join(comp.withColumnRenamed("id", id_col), id_col, "left")
           .withColumn("group_id", F.coalesce("comp", F.col(id_col)))
           .drop("comp"))
    return out.withColumn("is_keeper", F.col(id_col) == F.col("group_id"))
