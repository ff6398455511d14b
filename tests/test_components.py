"""Connected components / dedup clustering vs a union-find oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    return {n: min(members) for r, members in comp.items() for n in members}


GRAPHS = {
    "chain": [(i, i + 1) for i in range(12)],
    "two_cliques": [(a, b) for a in range(4) for b in range(a + 1, 4)]
                   + [(a, b) for a in range(10, 15) for b in range(a + 1, 15)],
    "star": [(0, i) for i in range(1, 9)],
    "mixed": [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 10)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
@pytest.mark.parametrize("two_star", [False, True],
                         ids=["min-prop", "two-star"])
def test_components_match_union_find(spark, name, two_star):
    from logstash_spark.datahub.components import connected_components

    edges = GRAPHS[name]
    nodes = sorted({x for e in edges for x in e})
    want = _union_find(edges, nodes)
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r.id: r.comp for r in
           connected_components(df, large_star_small_star=two_star).collect()}
    assert got == want, (name, two_star)


def test_dedup_groups_end_to_end(spark, sf_dir):
    """documents + minhash candidate pairs -> groups: every pair lands in
    one group, keepers are group minima, non-candidates are singletons."""
    from logstash_spark.datahub.components import dedup_groups
    from logstash_spark.datahub.dedup import minhash_lsh_dedup
    from logstash_spark.session import load_tables

    load_tables(spark, sf_dir, "documents")
    docs = spark.table("documents")
    pairs = minhash_lsh_dedup(docs, n_hashes=16, band_size=4)
    out = dedup_groups(docs, pairs).cache()

    assert out.count() == docs.count()
    # keeper is the min doc of its group
    bad = (out.groupBy("group_id")
           .agg(F.min("doc_id").alias("mn"),
                F.sum(F.col("is_keeper").cast("int")).alias("nk"))
           .filter((F.col("mn") != F.col("group_id")) | (F.col("nk") != 1)))
    assert bad.count() == 0
    # every candidate pair is in one group
    joined = (pairs
              .join(out.select(F.col("doc_id").alias("a"),
                               F.col("group_id").alias("ga")), "a")
              .join(out.select(F.col("doc_id").alias("b"),
                               F.col("group_id").alias("gb")), "b"))
    assert joined.filter(F.col("ga") != F.col("gb")).count() == 0
    # there exist real multi-doc groups AND singletons on this corpus
    sizes = out.groupBy("group_id").count()
    assert sizes.filter(F.col("count") > 1).count() > 0
    assert sizes.filter(F.col("count") == 1).count() > 0
    out.unpersist()


def test_non_convergence_raises(spark):
    from logstash_spark.datahub.components import connected_components

    df = spark.createDataFrame([(i, i + 1) for i in range(30)], "a long, b long")
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(df, max_iter=2)


def test_corpus_clean_fuzzy(spark, sf_dir):
    """Fuzzy pass keeps a subset of the exact pass; near-dup losers are
    exactly the non-keeper members of multi-doc groups."""
    from logstash_spark.datahub.pipeline import corpus_clean, corpus_clean_fuzzy
    from logstash_spark.session import load_tables

    load_tables(spark, sf_dir, "documents")
    docs = spark.table("documents")
    exact = corpus_clean(docs)
    fuzzy = corpus_clean_fuzzy(docs)
    n_exact, n_fuzzy = exact.count(), fuzzy.count()
    assert 0 < n_fuzzy <= n_exact
    # kept set is a subset of the exact-pass survivors
    assert fuzzy.join(exact.select("doc_id"), "doc_id").count() == n_fuzzy
    # no verification: strictly more aggressive (or equal)
    loose = corpus_clean_fuzzy(docs, jaccard_threshold=None)
    assert loose.count() <= n_fuzzy


def test_fuzzy_verify_is_candidate_bounded(spark, sf_dir):
    """ngram_jaccard_for_pairs must agree with the unbounded verifier on
    the candidate set, and its plan must join the candidates BEFORE the
    intersection aggregate (no all-pairs blow-up)."""
    from pyspark.sql import functions as F
    from logstash_spark.datahub.dedup import (minhash_lsh_dedup,
                                              ngram_jaccard_for_pairs,
                                              ngram_jaccard_pairs)
    from logstash_spark.session import load_tables

    load_tables(spark, sf_dir, "documents")
    docs = spark.table("documents").limit(150)
    pairs = minhash_lsh_dedup(docs, n_hashes=16, band_size=4)
    bounded = {(r.a, r.b, round(r.jaccard, 6)) for r in
               ngram_jaccard_for_pairs(docs, pairs).collect()}
    full = {(r.a, r.b): round(r.jaccard, 6) for r in
            ngram_jaccard_pairs(docs).collect()}
    cand = {(r.a, r.b) for r in pairs.collect()}
    assert bounded == {(a, b, full[(a, b)]) for (a, b) in cand if (a, b) in full}
