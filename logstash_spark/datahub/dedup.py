"""Deduplication operators for large-scale training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle -> minhash -> band -> bucket
join), SimHash, and n-gram Jaccard verification.  All implementations are
pure DataFrame ops — the hashes are md5/xxhash64 JVM expressions, shingling
is explode over a sequence (no Python in the hot path) — so each scales as:
narrow map (shingle/hash) -> one shuffle on the bucket key -> bucket-local
self-join.  That is the standard web-scale near-dup shape: candidate
generation is O(n) with small constants; the quadratic verify only runs
inside buckets.

Skew note: a degenerate band value (e.g. all-empty docs) would create a hot
bucket; filter out signatures of near-empty docs (min_tokens) before the
bucket join and rely on AQE skew-join splitting for the remainder.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_MINHASH = 8
BAND_SIZE = 4  # 2 bands of 4 -> candidate if either band collides


def normalize_text(col: Column) -> Column:
    """lower, strip non-alnum (keep spaces), collapse whitespace, trim."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, r" +", " ")
    return F.trim(c)


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups over normalized text.

    Returns one row per distinct content: keeper (min id) + dup_count.
    Single shuffle on the content hash; map-side partial agg applies.
    """
    h = F.md5(normalize_text(F.col(text_col))).alias("content_hash")
    return (
        df.select(F.col(id_col), h)
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper_id"),
             F.count(F.lit(1)).alias("dup_count"))
    )


def word_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3, distinct: bool = True) -> DataFrame:
    """Word n-gram shingles per doc: explode over token offsets.

    explode(sequence(...)) keeps everything JVM-side; one narrow stage.
    ``distinct=True`` (set semantics — required when downstream COUNTS
    shingles: jaccard sizes, contamination hits) adds a full shuffle;
    pass ``distinct=False`` when downstream only takes MIN over the
    shingles (minhash — min over a multiset == min over its set), which
    keeps the whole shingle stage narrow.
    """
    toks = F.split(normalize_text(F.col(text_col)), " ")
    d = df.select(F.col(id_col), toks.alias("__toks")).withColumn(
        "__n", F.size("__toks"))
    d = d.filter(F.col("__n") >= n)
    d = d.withColumn("__i", F.explode(F.sequence(F.lit(1), F.col("__n") - (n - 1))))
    shingle = F.concat_ws(
        " ", *[F.element_at("__toks", F.col("__i") + k) for k in range(n)])
    out = d.select(id_col, shingle.alias("shingle"))
    return out.distinct() if distinct else out


# h_i per sha256 digest: 64 hex chars / 8-char (32-bit) slices
_HASHES_PER_DIGEST = 8


def minhash_signatures(shingles: DataFrame, id_col: str = "doc_id",
                       n_hashes: int = N_MINHASH,
                       hash_family: str = "sha256") -> DataFrame:
    """Per-doc minhash signature.  Two hash families:

    ``sha256`` (default, oracle-reproducible):
    ``h_i = min(substr(sha256(salt || '|' || shingle), slice_i, 8))`` where
    each salted sha256 digest supplies 8 independent 32-bit hex slices
    (salt = i//8, slice = i%8).  Lexicographic min over a fixed-width
    uniform hex hash is a valid min-hash family, reproducible in ANY
    engine (the DuckDB oracle computes the identical signature).

    ``xxhash64`` (the 100-TB fast path, r5): two 64-bit base hashes per
    shingle — ``h1 = xxhash64(shingle)``, ``h2 = xxhash64(shingle, 1)`` —
    derive the family by xor-rotate double hashing
    ``h_i = h1 XOR rotl(h2, (11i mod 63)+1)`` (Kirsch-Mitzenmacher double
    hashing with a bit-rotation instead of multiplication, which ANSI
    mode would overflow-check; the step must be COPRIME to 63 — a step of
    7 has period 9, silently duplicating h10..h15 as h1..h6 and
    collapsing the banding curve).  Measured 3.6x cheaper than the sha256
    family on the sf0.1 signature stage (0.8s vs 2.9s; raw shingle scan
    is 0.55s) and produces the identical candidate-pair set on the test
    corpora — but xxhash64 is Spark-specific, so this family cannot be
    mirrored by the DuckDB oracle and its gate is rows-only.

    At 100 TB the signature scan is the dominant cost of the whole
    dedup, which is why the hash family is caller-visible.  Either way
    the digests are computed in a PROJECTION before the groupBy (one
    evaluation per shingle row); the MIN aggregates see only cheap
    derivations, the aggregation buffer is BIGINT (HashAggregate, not
    SortAggregate), and there is one shuffle (groupBy doc).
    """
    if hash_family == "xxhash64":
        h1, h2 = F.xxhash64("shingle"), F.xxhash64("shingle", F.lit(1))
        pre = shingles.select(id_col, h1.alias("__h1"), h2.alias("__h2"))

        def rotl(c, i):
            return c if i == 0 else F.shiftleft(c, i).bitwiseOR(
                F.shiftrightunsigned(c, 64 - i))

        aggs = [
            F.min(F.col("__h1").bitwiseXOR(
                rotl(F.col("__h2"), (11 * i) % 63 + 1)) if i
                else F.col("__h1")).alias(f"h{i}")
            for i in range(n_hashes)
        ]
        return pre.groupBy(id_col).agg(*aggs)
    if hash_family != "sha256":
        raise ValueError(f"unknown minhash hash_family {hash_family!r} "
                         "(sha256 | xxhash64)")
    n_digests = -(-n_hashes // _HASHES_PER_DIGEST)
    pre = shingles.select(
        id_col,
        *[F.sha2(F.concat(F.lit(f"{s}|"), F.col("shingle")), 256)
          .alias(f"__sha{s}") for s in range(n_digests)])
    # conv the 8-hex-char slice to a BIGINT before the MIN: fixed-width
    # (32-bit) slices compare identically as hex text or as integers, but
    # an integer aggregation buffer lets Spark use HashAggregate — with
    # string mins the buffer isn't fixed-width and the plan degrades to
    # SortAggregate, which sorts the whole exploded shingle set per
    # partition.  The DuckDB oracle mirrors with ('0x' || slice)::BIGINT.
    aggs = [
        F.min(F.conv(F.substring(F.col(f"__sha{i // _HASHES_PER_DIGEST}"),
                                 (i % _HASHES_PER_DIGEST) * 8 + 1, 8),
                     16, 10).cast("long")).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return pre.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id",
                        n_hashes: int = N_MINHASH,
                        band_size: int = BAND_SIZE) -> DataFrame:
    """Band the signatures; docs sharing any band hash become a candidate
    pair (a < b).  Shuffle key = (band_id, band_hash): bucket-local join.

    Bands are one explode over an array of (band_id, band_hash) structs —
    NOT a per-band union: a union re-evaluates the whole shingle->signature
    subtree once per band per join side (8 corpus scans at n=16), while the
    explode computes signatures once and makes the two self-join sides
    structurally identical, so Spark's ReuseExchange shares the shuffle
    under both.  At 100 TB the corpus scan is the dominant cost.
    """
    n_bands = n_hashes // band_size
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            # '|' separator keeps the hash injective over signature
            # tuples: separator-free concat of variable-width decimal
            # strings collides, e.g. (1, 23) and (12, 3) both -> '123'.
            F.md5(F.concat_ws("|", *[
                f"h{i}" for i in range(b * band_size, (b + 1) * band_size)
            ])).alias("band_hash"))
        for b in range(n_bands)
    ]
    bands = (sigs
             .select(F.col(id_col), F.explode(F.array(*band_structs))
                     .alias("__band"))
             .select(id_col, "__band.band_id", "__band.band_hash"))
    a = bands.select(F.col(id_col).alias("a"), "band_id", "band_hash")
    b_ = bands.select(F.col(id_col).alias("b"), "band_id", "band_hash")
    return (
        a.join(b_, ["band_id", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_lsh_dedup(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      n_hashes: int = N_MINHASH,
                      band_size: int = BAND_SIZE,
                      shingle_n: int = 3,
                      cache_signatures: bool = True,
                      hash_family: str = "sha256") -> DataFrame:
    """Full MinHash+LSH near-dup candidate pipeline.

    Recall is the banding curve P(candidate) = 1 - (1 - s^r)^b for Jaccard
    similarity s with r = band_size rows per band and b = n_hashes/band_size
    bands (Leskovec/Rajaraman/Ullman, MMDS ch.3).  The 8/4 default (2 bands)
    is cheap but recall-thin for production near-dup thresholds; 16/4
    (4 bands) puts s=0.8 candidates at ~87% recall vs ~56%.  Cost scales
    linearly in n_hashes (one extra MIN agg per hash, one extra band row
    per band) — the shuffle key stays (band_id, band_hash), so the plan
    shape is unchanged at any setting.
    """
    # distinct=False: minhash's MIN is duplicate-insensitive, so the
    # shingle stage stays narrow (saves a full shuffle of the exploded
    # shingle rows — the largest intermediate in the whole pipeline)
    sh = word_shingles(df, text_col, id_col, n=shingle_n, distinct=False)
    sigs = minhash_signatures(sh, id_col, n_hashes=n_hashes,
                              hash_family=hash_family)
    if not cache_signatures:
        return lsh_candidate_pairs(sigs, id_col, n_hashes=n_hashes,
                                   band_size=band_size)
    # One row per doc (16 bigints): the self-join would otherwise
    # evaluate the whole scan->shingle->signature subtree once per side
    # (measured 3.6s -> 0.5s on the sf0.1 pairs stage; ReuseExchange does
    # not fire across the aliased join sides).  The persist is scoped to
    # THIS call: the candidate pairs are materialized eagerly while the
    # signature cache is hot, then the cache is dropped before returning.
    # The pairs themselves live as RDD-level localCheckpoint blocks,
    # which the ContextCleaner releases automatically once the caller
    # drops the returned DataFrame — unlike DataFrame.persist, whose
    # CacheManager entry is held forever until an explicit unpersist.
    # (The previous version leaked one signature cache per invocation:
    # ~136 bytes/doc cluster-wide, held until the session died.)
    from pyspark import StorageLevel

    sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        pairs = lsh_candidate_pairs(sigs, id_col, n_hashes=n_hashes,
                                    band_size=band_size)
        # eager=True runs the job now, truncating lineage so the result
        # no longer references the (about to be dropped) signature cache.
        pairs = pairs.localCheckpoint(eager=True)
    finally:
        sigs.unpersist(blocking=True)
    return pairs


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        pair_pred=None, threshold: float = 0.0) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs via an inverted
    shingle index: explode -> join on shingle -> count intersections ->
    jaccard = |A∩B| / (|A|+|B|-|A∩B|).

    `pair_pred(a_id_col, b_id_col)` bounds the candidate space (e.g. the
    LSH pairs, or a locality predicate) — without it this is O(n^2) in the
    worst case of one shared shingle across all docs.
    """
    sh = word_shingles(df, text_col, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    pairs = a.join(b, "shingle").filter(F.col("a") < F.col("b"))
    if pair_pred is not None:
        pairs = pairs.filter(pair_pred(F.col("a"), F.col("b")))
    inter = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("inter"))
    out = (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sz_a")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sz_b")), "b")
        .withColumn("jaccard",
                    F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
    )
    return out.filter(F.col("jaccard") >= threshold).select("a", "b", "inter", "jaccard")


def ngram_jaccard_for_pairs(df: DataFrame, pairs: DataFrame,
                            text_col: str = "text", id_col: str = "doc_id",
                            n: int = 3) -> DataFrame:
    """Exact n-gram Jaccard for a GIVEN candidate-pair set (a, b).

    Unlike ngram_jaccard_pairs (inverted-index self-join, O(n^2) without a
    predicate bound), this never forms non-candidate pairs: shingles are
    semi-joined down to docs appearing in `pairs`, and the shingle match is
    joined against the candidate set BEFORE the intersection count — the
    work is O(sum over candidate pairs of shared shingles).
    """
    cand_docs = (pairs.select(F.col("a").alias(id_col))
                 .union(pairs.select(F.col("b").alias(id_col))).distinct())
    sh = word_shingles(df.join(cand_docs, id_col), text_col, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    matches = a.join(b, "shingle").join(pairs, ["a", "b"])
    inter = matches.groupBy("a", "b").agg(F.count(F.lit(1)).alias("inter"))
    return (
        inter.join(sizes.select(F.col(id_col).alias("a"),
                                F.col("sz").alias("sz_a")), "a")
        .join(sizes.select(F.col(id_col).alias("b"),
                           F.col("sz").alias("sz_b")), "b")
        .withColumn("jaccard", F.col("inter") /
                    (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .select("a", "b", "inter", "jaccard"))


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 16) -> DataFrame:
    """SimHash fingerprint: per token take `bits` bits of md5; the
    fingerprint's bit b is 1 iff sum over tokens of (+1/-1 for bit b) > 0.

    Pure expressions: token explode -> per-bit conditional sum -> bit
    reassembly.  One shuffle on doc id."""
    toks = F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok")
    d = df.select(F.col(id_col), toks).filter(F.col("tok") != "")
    hx = F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("int")
    d = d.select(id_col, hx.alias("h16"))
    aggs = [
        F.sum(F.when(F.col("h16").bitwiseAND(F.lit(1 << b)) > 0, 1).otherwise(-1))
        .alias(f"s{b}")
        for b in range(bits)
    ]
    per_doc = d.groupBy(id_col).agg(*aggs)
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = term if fp is None else (fp + term)
    return per_doc.select(id_col, fp.cast("long").alias("simhash"))


def embedding_cosine_pairs(vectors, threshold: float = 0.95,
                           id_col: str = "vec_id", vec_col: str = "embedding",
                           n_planes: int = 4, dim: int = 64,
                           exact: bool = False):
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cos >= threshold).

    Scale path (default): sign-LSH bucket the vectors first
    (similarity.random_hyperplane_buckets) and compare only within-bucket —
    the self-join shuffles on the bucket key instead of exploding O(N^2).
    High-cosine pairs land in the same bucket with probability
    (1 - acos(cos)/pi)^n_planes; callers trade recall vs cost via n_planes.
    `exact=True` is the O(N^2) verification path for tests/oracles.
    """
    from pyspark.sql import functions as F

    from logstash_spark.datahub.similarity import cosine, random_hyperplane_buckets

    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if exact:
        j = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        buckets = random_hyperplane_buckets(vectors, n_planes=n_planes, dim=dim,
                                            id_col=id_col, vec_col=vec_col)
        a = a.join(buckets.withColumnRenamed(id_col, "id_a"), "id_a")
        b = b.join(buckets.withColumnRenamed(id_col, "id_b"), "id_b")
        j = a.join(b, ["bucket"]).filter(F.col("id_a") < F.col("id_b"))
    return (j.withColumn("cos", cosine(F.col("va"), F.col("vb")))
             .filter(F.col("cos") >= threshold)
             .select("id_a", "id_b", "cos"))


def benchmark_contamination(docs: DataFrame, benchmark: DataFrame,
                            n: int = 8, min_hits: int = 1,
                            text_col: str = "text", id_col: str = "doc_id",
                            bench_text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing >=min_hits
    distinct word n-grams with an evaluation set.

    The standard pre-training hygiene pass (n=8..13 word-gram overlap).
    Plan shape: the benchmark's distinct shingle set is tiny relative to
    the corpus, so it BROADCASTS — the corpus side is one narrow
    shingle-explode + broadcast semi-join + per-doc count; the 100 TB side
    is never shuffled.  Returns docs + (contamination_hits, contaminated).
    """
    from pyspark.sql.functions import broadcast

    bench_sh = (word_shingles(
        benchmark.select(F.lit(0).alias("__bid"), F.col(bench_text_col)),
        text_col=bench_text_col, id_col="__bid", n=n)
        .select("shingle").distinct())
    doc_sh = word_shingles(docs, text_col=text_col, id_col=id_col, n=n)
    hits = (doc_sh.join(broadcast(bench_sh), "shingle")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("contamination_hits")))
    out = docs.join(hits, id_col, "left")
    out = out.withColumn("contamination_hits",
                         F.coalesce("contamination_hits", F.lit(0)))
    return out.withColumn("contaminated",
                          F.col("contamination_hits") >= min_hits)
