"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and an IVF-style
centroid-bucketed variant as the scale path: assign every vector to its
nearest centroid (broadcast join against a small centroid set), then search
only within the probe's bucket — turning O(Q*N) into O(Q*N/k) with the
classic IVF recall tradeoff.

The dot product is a pure Column expression (`aggregate(zip_with(...))`),
evaluated JVM-side; no UDF.  The top-k cut is a window row_number per query
— shuffle on query id only.

At 100 TB scale: centroids are broadcast (tiny), vector partitions stay
columnar, and the bucket join shuffles each side once on centroid_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     qid_col: str = "query_id") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries: (query_id, embedding).  Broadcast the (small) query set against
    the vector corpus — the corpus is never shuffled, only scanned."""
    q = F.broadcast(queries.select(F.col(qid_col),
                                   F.col(vec_col).alias("__qv")))
    scored = (
        vectors.select(F.col(id_col), F.col(vec_col).alias("__v"))
        .join(q, F.col(id_col) != F.col(qid_col))
        .withColumn("cos", cosine(F.col("__qv"), F.col("__v")))
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "rank", "cos")
    )


def assign_centroids(vectors: DataFrame, centroids: DataFrame,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     cid_col: str = "centroid_id", n: int = 1) -> DataFrame:
    """IVF assignment: nearest n centroids by cosine (argmax for n=1).
    Centroids are broadcast; ranking via row_number over (vec, score
    desc).  n>1 multiplies rows (one per probed bucket) — used for the
    query side of nprobe>1 search."""
    c = F.broadcast(centroids.select(F.col(cid_col),
                                     F.col(vec_col).alias("__cv")))
    scored = (
        vectors.select(F.col(id_col), F.col(vec_col))
        .join(c)
        .withColumn("__cs", cosine(F.col(vec_col), F.col("__cv")))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__cs"), F.asc(cid_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .select(id_col, vec_col, cid_col)
    )


def ivf_topk(vectors: DataFrame, queries: DataFrame, centroids: DataFrame,
             k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "query_id", cid_col: str = "centroid_id",
             nprobe: int = 1) -> DataFrame:
    """Approximate top-k: search only vectors in the query's nprobe
    nearest centroid buckets.  The corpus is bucketed once (nprobe always
    1 on the corpus side); raising nprobe fans each query out to more
    buckets — recall rises, cost per query scales with nprobe/#centroids,
    and the corpus is never rescanned or reshuffled."""
    assigned = assign_centroids(vectors, centroids, id_col, vec_col, cid_col)
    q_assigned = assign_centroids(
        queries.withColumnRenamed(qid_col, id_col), centroids,
        id_col, vec_col, cid_col, n=nprobe,
    ).withColumnRenamed(id_col, qid_col)
    q = q_assigned.select(qid_col, F.col(vec_col).alias("__qv"), cid_col)
    scored = (
        assigned.join(q, cid_col)
        .filter(F.col(id_col) != F.col(qid_col))
        .withColumn("cos", cosine(F.col("__qv"), F.col(vec_col)))
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, cid_col, id_col, "rank", "cos")
    )


def random_hyperplane_buckets(vectors: DataFrame, n_planes: int = 8,
                              dim: int = 64, seed: int = 42,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """Sign-LSH bucketing: deterministic pseudo-random hyperplanes derived
    from md5(seed, plane, dim) so the bucketing is reproducible anywhere.

    Returns (vec_id, bucket) where bucket is the concatenated sign bits.
    """
    import hashlib

    def coef(p: int, d: int) -> float:
        h = hashlib.md5(f"{seed}|{p}|{d}".encode()).hexdigest()
        return (int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0

    bucket_bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(coef(p, d)) for d in range(dim)])
        bucket_bits.append(F.when(dot(F.col(vec_col), plane) >= 0, "1").otherwise("0"))
    return vectors.select(F.col(id_col),
                          F.concat(*bucket_bits).alias("bucket"))
