"""Training-data pipeline queries + DuckDB oracles (documents/embeddings).

Same contract as logstash_spark.catalog: (spark_fn, oracle_sql) per name.
The oracles re-derive every hash/shingle/minhash/cosine from scratch in SQL
so the check is independent of the Spark implementation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_spark.session import load_tables

# shared SQL fragments ------------------------------------------------------

# DuckDB mirror of dedup.normalize_text
NORM_SQL = "trim(regexp_replace(regexp_replace(lower({col}), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

# word 3-shingles as a CTE over documents (doc_id, shingle) DISTINCT
SHINGLES_CTE = f"""
toks AS (
  SELECT doc_id, string_split({NORM_SQL.format(col='text')}, ' ') AS tk
  FROM documents),
idx AS (
  SELECT doc_id, tk, UNNEST(generate_series(1, len(tk) - 2)) AS i
  FROM toks WHERE len(tk) >= 3),
shingles AS (
  SELECT DISTINCT doc_id, CONCAT(tk[i], ' ', tk[i+1], ' ', tk[i+2]) AS shingle
  FROM idx)
"""


# 1. exact dedup -------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    from logstash_spark.datahub.dedup import exact_dedup

    load_tables(spark, sf_dir, "documents")
    return exact_dedup(spark.table("documents"))


ORACLE_DEDUP_EXACT = f"""
SELECT md5({NORM_SQL.format(col='text')}) AS content_hash,
       MIN(doc_id) AS keeper_id, COUNT(*) AS dup_count
FROM documents GROUP BY 1
"""


# 2. minhash + LSH candidate pairs -------------------------------------------
# Gate setting is the PRODUCTION-recall banding 16 hashes / 4-per-band
# (Jaccard-0.8 pairs at ~87% candidate recall vs 8/4's ~56%); the 8/4
# variant stays pytest-covered (VERDICT r3: dedup_minhash16 folded in here
# to free a registry slot for the new datahub gates).

def q_dedup_minhash(spark, sf_dir):
    from logstash_spark.datahub.dedup import minhash_lsh_dedup

    load_tables(spark, sf_dir, "documents")
    return minhash_lsh_dedup(spark.table("documents"),
                             n_hashes=16, band_size=4)


def _minhash_pairs_ctes(n_hashes: int, band_size: int) -> str:
    """DuckDB CTE chain for the minhash+banding pipeline at any (n, r);
    exposes ``pairs(a, b)`` (requires SHINGLES_CTE upstream).  Mirrors
    dedup.minhash_signatures exactly: 8 x 32-bit slices per salted
    sha256 digest (salt = i//8, slice offset = (i%8)*8+1), each parsed
    to BIGINT (hex-prefix cast == Spark's conv(slice,16,10))."""
    aggs = ",\n         ".join(
        f"MIN(('0x' || SUBSTRING(sha256(CONCAT('{i // 8}|', shingle)), "
        f"{(i % 8) * 8 + 1}, 8))::BIGINT) AS h{i}" for i in range(n_hashes))
    band_selects = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band_id, md5(CONCAT({cols})) AS band_hash FROM sigs"
        .format(b=b, cols=", '|', ".join(
            f"h{i}" for i in range(b * band_size, (b + 1) * band_size)))
        for b in range(n_hashes // band_size))
    return f"""
sigs AS (
  SELECT doc_id,
         {aggs}
  FROM shingles GROUP BY doc_id),
bands AS (
{band_selects}),
pairs AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id)"""


def _minhash_oracle(n_hashes: int, band_size: int) -> str:
    return f"""
WITH {SHINGLES_CTE},
{_minhash_pairs_ctes(n_hashes, band_size)}
SELECT a, b FROM pairs
"""


ORACLE_DEDUP_MINHASH = _minhash_oracle(16, 4)


# 3. simhash ------------------------------------------------------------------

def q_dedup_simhash(spark, sf_dir):
    from logstash_spark.datahub.dedup import simhash

    load_tables(spark, sf_dir, "documents")
    return simhash(spark.table("documents"))


_sim_sums = ",\n         ".join(
    f"SUM(CASE WHEN (h16 & {1 << b}) > 0 THEN 1 ELSE -1 END) AS s{b}"
    for b in range(16))
_sim_fp = " + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16))
ORACLE_DEDUP_SIMHASH = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split({NORM_SQL.format(col='text')}, ' ')) AS tok
  FROM documents),
h AS (
  SELECT doc_id, CAST(CONCAT('0x', SUBSTRING(md5(tok), 1, 4)) AS INT) AS h16
  FROM toks WHERE tok <> ''),
s AS (
  SELECT doc_id,
         {_sim_sums}
  FROM h GROUP BY doc_id)
SELECT doc_id, CAST({_sim_fp} AS BIGINT) AS simhash FROM s
"""


# 4. n-gram jaccard (bounded candidate window) ---------------------------------

JACCARD_ID_WINDOW = 25
JACCARD_THRESHOLD = 0.2


def q_dedup_jaccard(spark, sf_dir):
    from logstash_spark.datahub.dedup import ngram_jaccard_pairs

    load_tables(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        spark.table("documents"),
        pair_pred=lambda a, b: (b - a) <= JACCARD_ID_WINDOW,
        threshold=JACCARD_THRESHOLD,
    )


ORACLE_DEDUP_JACCARD = f"""
WITH {SHINGLES_CTE},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
   AND b.doc_id - a.doc_id <= {JACCARD_ID_WINDOW}
  GROUP BY 1, 2)
SELECT i.a, i.b, i.inter,
       i.inter / (sa.sz + sb.sz - i.inter) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.a
JOIN sizes sb ON sb.doc_id = i.b
WHERE i.inter / (sa.sz + sb.sz - i.inter) >= {JACCARD_THRESHOLD}
"""


# 5. brute-force cosine top-k ----------------------------------------------------

TOPK_K = 5
N_QUERIES = 8


def _emb_double(spark, sf_dir):
    load_tables(spark, sf_dir, "embeddings")
    return spark.table("embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )


def q_ann_bruteforce(spark, sf_dir):
    from logstash_spark.datahub.similarity import brute_force_topk

    ed = _emb_double(spark, sf_dir)
    queries = (ed.filter(F.col("vec_id") < N_QUERIES)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return brute_force_topk(ed, queries, k=TOPK_K)


ORACLE_ANN_BRUTEFORCE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS cos
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored)
SELECT query_id, vec_id, CAST(rank AS INT) AS rank, cos
FROM ranked WHERE rank <= {TOPK_K}
"""


# 6. IVF-bucketed ANN (gate runs the nprobe=2 recall-vs-cost setting;
#    nprobe=1 stays pytest-covered — ann_ivf_nprobe folded in here to free
#    a registry slot, VERDICT r3 "Next round" #5) -----------------------------

CENTROID_STEP = 97
IVF_NPROBE = 2


def q_ann_ivf(spark, sf_dir):
    from logstash_spark.datahub.similarity import ivf_topk

    ed = _emb_double(spark, sf_dir)
    centroids = (ed.filter(F.pmod("vec_id", F.lit(CENTROID_STEP)) == 0)
                 .select(F.col("vec_id").alias("centroid_id"), "embedding"))
    queries = (ed.filter(F.col("vec_id") < N_QUERIES)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return ivf_topk(ed, queries, centroids, k=TOPK_K, nprobe=IVF_NPROBE)


ORACLE_ANN_IVF = f"""
WITH c AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv
           FROM embeddings WHERE vec_id % {CENTROID_STEP} = 0),
assign AS (
  SELECT e.vec_id, e.embedding::DOUBLE[] AS v, c.centroid_id,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC,
                      c.centroid_id ASC) AS rn
  FROM embeddings e, c),
assigned AS (SELECT vec_id, v, centroid_id FROM assign WHERE rn = 1),
q AS (SELECT vec_id AS query_id, v AS qv, centroid_id
      FROM assign WHERE rn <= {IVF_NPROBE} AND vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, a.centroid_id, a.vec_id,
         list_cosine_similarity(q.qv, a.v) AS cos
  FROM q JOIN assigned a
    ON a.centroid_id = q.centroid_id AND a.vec_id <> q.query_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored)
SELECT query_id, centroid_id, vec_id, CAST(rank AS INT) AS rank, cos
FROM ranked WHERE rank <= {TOPK_K}
"""


# 7. language ID --------------------------------------------------------------------

def q_lang_id(spark, sf_dir):
    from logstash_spark.datahub.textstats import lang_id

    load_tables(spark, sf_dir, "documents")
    return lang_id(spark.table("documents")).select("doc_id", "lang", "pred_lang")


def _marker_sql(words):
    pat = r"\b(" + "|".join(words) + r")\b"
    return f"len(regexp_extract_all(lower(text), '{pat}'))"


ORACLE_LANG_ID = f"""
WITH s AS (
  SELECT doc_id, lang,
         {_marker_sql(['the','and','of','to','is'])} AS s_en,
         {_marker_sql(['el','la','de','que','los'])} AS s_es,
         {_marker_sql(['der','die','und','das','ist'])} AS s_de,
         {_marker_sql(['le','la','les','des','est'])} AS s_fr,
         len(regexp_extract_all(text, '[一-鿿]')) AS cjk
  FROM documents)
SELECT doc_id, lang,
  CASE WHEN cjk > 0 THEN 'zh'
       WHEN GREATEST(s_en, s_es, s_de, s_fr) = 0 THEN 'unknown'
       WHEN s_fr > GREATEST(s_en, s_es, s_de) THEN 'fr'
       WHEN s_de > GREATEST(s_en, s_es) THEN 'de'
       WHEN s_es > s_en THEN 'es'
       ELSE 'en' END AS pred_lang
FROM s
"""


# 8. quality + token stats ------------------------------------------------------------

def q_quality(spark, sf_dir):
    from logstash_spark.datahub.textstats import quality_score, token_stats

    load_tables(spark, sf_dir, "documents")
    out = quality_score(token_stats(spark.table("documents")))
    return out.select("doc_id", "n_ws_tokens", "n_bpe_tokens", "n_chars_calc",
                      "stop_ratio", "punct_ratio", "alpha_ratio", "quality")


ORACLE_QUALITY = r"""
WITH s AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
         length(text) AS n_chars_calc,
         len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS n_stop,
         len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
         len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha
  FROM documents)
SELECT doc_id, n_ws_tokens, n_bpe_tokens, n_chars_calc,
       n_stop / n_ws_tokens AS stop_ratio,
       n_punct / n_chars_calc AS punct_ratio,
       n_alpha / n_chars_calc AS alpha_ratio,
       CASE WHEN n_ws_tokens < 5 THEN 0.0
            ELSE (n_stop / n_ws_tokens) * 0.5 + (n_alpha / n_chars_calc) * 0.5
       END AS quality
FROM s
"""


# 9. doc fingerprint --------------------------------------------------------------------

def q_doc_fingerprint(spark, sf_dir):
    from logstash_spark.datahub.textstats import doc_fingerprint

    load_tables(spark, sf_dir, "documents")
    return doc_fingerprint(spark.table("documents")).select(
        "doc_id", "fp_full", "fp_prefix", "len_bucket")


ORACLE_DOC_FINGERPRINT = f"""
WITH n AS (SELECT doc_id, {NORM_SQL.format(col='text')} AS norm FROM documents)
SELECT doc_id, md5(norm) AS fp_full,
       md5(SUBSTRING(norm, 1, 64)) AS fp_prefix,
       CAST(FLOOR(length(norm) / 64) AS BIGINT) AS len_bucket
FROM n
"""


# 10. multimodal plumbing (mapInPandas feature extraction, stubbed decode) -----------------

def q_multimodal(spark, sf_dir):
    from logstash_spark.datahub.multimodal import synthesize_media, extract_features

    load_tables(spark, sf_dir, "documents")
    media = synthesize_media(spark.table("documents"), "doc_id", "text")
    feats = extract_features(media, fake=True)
    return feats.select(
        "media_id", "mime", "payload_sha",
        F.col("feat")[0].alias("feat0"),
        F.col("feat")[7].alias("feat7"),
    )


ORACLE_MULTIMODAL = """
WITH h AS (SELECT doc_id AS media_id, 'image/fake' AS mime,
                  sha256(text) AS payload_sha FROM documents)
SELECT media_id, mime, payload_sha,
       CAST(CONCAT('0x', SUBSTRING(payload_sha, 1, 2)) AS INT) / 255.0 AS feat0,
       CAST(CONCAT('0x', SUBSTRING(payload_sha, 15, 2)) AS INT) / 255.0 AS feat7
FROM h
"""


# 11. LSH hyperplane bucketing — oracle recomputes the md5-derived planes
#     and sign bits from scratch in SQL (similarity.random_hyperplane_buckets
#     coef: int(md5(f"{seed}|{p}|{d}")[:8], 16) / 0xFFFFFFFF * 2 - 1).

def lsh_bucket_ctes(n_planes: int, dim: int = 64, seed: int = 42) -> str:
    """DuckDB CTE chain computing sign-LSH buckets for a CTE named
    ``corpus(vec_id, v DOUBLE[])``; exposes ``buckets(vec_id, bucket)``.

    The per-plane dot product is a SUM over (component x coefficient) rows —
    a different float summation order than Spark's sequential fold, but a
    sign flip needs |dot| within ~1e-15 of zero, vanishingly unlikely for
    O(1)-magnitude embedding dots."""
    return f"""
planes AS (
  SELECT p, d,
         (CAST(CONCAT('0x', SUBSTRING(md5(CONCAT('{seed}|', p, '|', d)), 1, 8)) AS BIGINT)
          / 4294967295.0) * 2.0 - 1.0 AS c
  FROM (SELECT UNNEST(generate_series(0, {n_planes - 1})) AS p),
       (SELECT UNNEST(generate_series(0, {dim - 1})) AS d)),
comps AS (
  SELECT vec_id, v, UNNEST(generate_series(1, {dim})) AS i FROM corpus),
comp2 AS (SELECT vec_id, i - 1 AS d, v[i] AS x FROM comps),
dots AS (
  SELECT c2.vec_id, pl.p, SUM(c2.x * pl.c) AS dp
  FROM comp2 c2 JOIN planes pl ON pl.d = c2.d GROUP BY 1, 2),
buckets AS (
  SELECT vec_id, string_agg(CASE WHEN dp >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
  FROM dots GROUP BY vec_id)"""


def q_ann_lsh_buckets(spark, sf_dir):
    from logstash_spark.datahub.similarity import random_hyperplane_buckets

    ed = _emb_double(spark, sf_dir)
    b = random_hyperplane_buckets(ed, n_planes=8, dim=64)
    return b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"),
                                   F.min("vec_id").alias("min_vec_id"))


ORACLE_ANN_LSH = f"""
WITH corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{lsh_bucket_ctes(n_planes=8)}
SELECT bucket, COUNT(*) AS n, MIN(vec_id) AS min_vec_id
FROM buckets GROUP BY bucket
"""


# 12. composed cleaning pipeline (lang gate -> quality gate -> exact dedup) --

def q_corpus_clean(spark, sf_dir):
    from logstash_spark.datahub.pipeline import corpus_clean

    load_tables(spark, sf_dir, "documents")
    out = corpus_clean(spark.table("documents"))
    return out.select("doc_id", "pred_lang", "quality")


ORACLE_CORPUS_CLEAN = f"""
WITH lscore AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '\\b(the|and|of|to|is)\\b')) AS s_en,
         len(regexp_extract_all(lower(text), '\\b(el|la|de|que|los)\\b')) AS s_es,
         len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist)\\b')) AS s_de,
         len(regexp_extract_all(lower(text), '\\b(le|la|les|des|est)\\b')) AS s_fr,
         len(regexp_extract_all(text, '[一-鿿]')) AS cjk
  FROM documents),
lang AS (
  SELECT doc_id,
    CASE WHEN cjk > 0 THEN 'zh'
         WHEN GREATEST(s_en, s_es, s_de, s_fr) = 0 THEN 'unknown'
         WHEN s_fr > GREATEST(s_en, s_es, s_de) THEN 'fr'
         WHEN s_de > GREATEST(s_en, s_es) THEN 'de'
         WHEN s_es > s_en THEN 'es'
         ELSE 'en' END AS pred_lang
  FROM lscore),
qstat AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\\s+')) AS n_ws,
         length(text) AS n_chars,
         len(regexp_extract_all(lower(text),
             '\\b(the|a|an|and|or|of|to|in|is|it)\\b')) AS n_stop,
         len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha
  FROM documents),
quality AS (
  SELECT doc_id,
         CASE WHEN n_ws < 5 THEN 0.0
              ELSE (n_stop / n_ws) * 0.5 + (n_alpha / n_chars) * 0.5
         END AS quality
  FROM qstat),
filtered AS (
  SELECT d.doc_id, lang.pred_lang, quality.quality,
         md5({NORM_SQL.format(col='d.text')}) AS h
  FROM documents d
  JOIN lang USING (doc_id) JOIN quality USING (doc_id)
  WHERE lang.pred_lang = 'en' AND quality.quality >= 0.2),
kept AS (SELECT h, MIN(doc_id) AS doc_id FROM filtered GROUP BY h)
SELECT f.doc_id, f.pred_lang, f.quality
FROM filtered f JOIN kept k ON f.doc_id = k.doc_id
"""


# 13. chunking + deterministic sampling (VERDICT r3 "Next round" #5) ----------

CHUNK_MAX_TOKENS = 32
CHUNK_OVERLAP = 8
CHUNK_STRIDE = CHUNK_MAX_TOKENS - CHUNK_OVERLAP
SAMPLE_RATE = 0.5
SAMPLE_SEED = 42


def q_chunking_sampling(spark, sf_dir):
    """chunk_documents -> deterministic_sample over (doc_id, chunk_idx),
    md5 hash method so the oracle reproduces the keep decisions exactly."""
    from logstash_spark.datahub.chunking import (chunk_documents,
                                                 deterministic_sample)

    load_tables(spark, sf_dir, "documents")
    chunks = chunk_documents(spark.table("documents"),
                             max_tokens=CHUNK_MAX_TOKENS,
                             overlap=CHUNK_OVERLAP)
    key = F.concat_ws(":", F.col("doc_id").cast("string"),
                      F.col("chunk_idx").cast("string"))
    return deterministic_sample(chunks, SAMPLE_RATE, key_col=key,
                                seed=SAMPLE_SEED, method="md5") \
        .select("doc_id", "chunk_idx", "chunk_text", "n_chunk_tokens")


ORACLE_CHUNKING_SAMPLING = f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = ''
              THEN [] :: VARCHAR[]
              ELSE string_split_regex(
                     regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')
         END AS tk
  FROM documents),
sized AS (SELECT doc_id, tk, len(tk) AS n FROM toks WHERE len(tk) >= 1),
chunks AS (
  SELECT doc_id, tk,
         UNNEST(generate_series(
           0, CAST(CEIL(GREATEST(n - {CHUNK_OVERLAP}, 1)
                        / {CHUNK_STRIDE}.0) AS INT) - 1)) AS chunk_idx
  FROM sized),
c2 AS (
  SELECT doc_id, chunk_idx,
         array_to_string(tk[chunk_idx * {CHUNK_STRIDE} + 1
                           : chunk_idx * {CHUNK_STRIDE} + {CHUNK_MAX_TOKENS}],
                         ' ') AS chunk_text,
         len(tk[chunk_idx * {CHUNK_STRIDE} + 1
               : chunk_idx * {CHUNK_STRIDE} + {CHUNK_MAX_TOKENS}])
           AS n_chunk_tokens
  FROM chunks)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, chunk_text,
       CAST(n_chunk_tokens AS INT) AS n_chunk_tokens
FROM c2
WHERE CAST(CONCAT('0x', SUBSTRING(
        md5(CONCAT(doc_id, ':', chunk_idx, '|{SAMPLE_SEED}')), 1, 8))
      AS BIGINT) / 4294967296.0 < {SAMPLE_RATE}
"""


# 14. benchmark decontamination ------------------------------------------------
# the "benchmark" eval set is a deterministic slice of the corpus itself
# (doc_id % 20 == 0) so the gate needs no external data; hits against it
# flag contaminated training docs.

DECON_N = 8
DECON_BENCH_MOD = 20


def q_decontamination(spark, sf_dir):
    from logstash_spark.datahub.dedup import benchmark_contamination

    load_tables(spark, sf_dir, "documents")
    docs = spark.table("documents")
    bench = docs.filter(F.pmod("doc_id", F.lit(DECON_BENCH_MOD)) == 0) \
                .select("text")
    out = benchmark_contamination(docs, bench, n=DECON_N)
    return out.select("doc_id", "contamination_hits", "contaminated")


def _ngram_shingles_cte(n: int, src: str = "documents",
                        where: str = "") -> str:
    """DuckDB word n-gram CTE chain over ``src`` -> shingles_{n}(doc_id,
    shingle), mirroring dedup.word_shingles at any n."""
    concat = ", ' ', ".join(f"tk[i+{k}]" for k in range(n))
    return f"""
toks{n} AS (
  SELECT doc_id, string_split({NORM_SQL.format(col='text')}, ' ') AS tk
  FROM {src} {where}),
idx{n} AS (
  SELECT doc_id, tk, UNNEST(generate_series(1, len(tk) - {n - 1})) AS i
  FROM toks{n} WHERE len(tk) >= {n}),
shingles_{n} AS (
  SELECT DISTINCT doc_id, CONCAT({concat}) AS shingle FROM idx{n})"""


ORACLE_DECONTAMINATION = f"""
WITH {_ngram_shingles_cte(DECON_N)},
bench AS (
  SELECT DISTINCT shingle FROM shingles_{DECON_N}
  WHERE doc_id % {DECON_BENCH_MOD} = 0),
hits AS (
  SELECT s.doc_id, COUNT(*) AS contamination_hits
  FROM shingles_{DECON_N} s JOIN bench USING (shingle)
  GROUP BY s.doc_id)
SELECT d.doc_id,
       COALESCE(h.contamination_hits, 0) AS contamination_hits,
       COALESCE(h.contamination_hits, 0) >= 1 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
"""


# 15. connected-components dedup clustering -------------------------------------
# minhash-LSH candidate pairs -> transitive duplicate groups; the oracle
# recomputes the pairs AND the components (recursive-CTE transitive
# closure) from scratch.

def q_dedup_components(spark, sf_dir):
    from logstash_spark.datahub.components import dedup_groups
    from logstash_spark.datahub.dedup import minhash_lsh_dedup

    load_tables(spark, sf_dir, "documents")
    docs = spark.table("documents")
    pairs = minhash_lsh_dedup(docs, n_hashes=16, band_size=4)
    return dedup_groups(docs, pairs)


ORACLE_DEDUP_COMPONENTS = f"""
WITH RECURSIVE {SHINGLES_CTE},
{_minhash_pairs_ctes(16, 4)},
edges AS (SELECT a AS u, b AS v FROM pairs
          UNION SELECT b, a FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v),
comp AS (
  SELECT u AS doc_id, LEAST(u, MIN(v)) AS comp FROM reach GROUP BY u)
SELECT d.doc_id,
       COALESCE(c.comp, d.doc_id) AS group_id,
       COALESCE(c.comp, d.doc_id) = d.doc_id AS is_keeper
FROM documents d LEFT JOIN comp c USING (doc_id)
"""


DATAHUB_CATALOG: dict[str, tuple] = {
    "dedup_exact": (q_dedup_exact, ORACLE_DEDUP_EXACT),
    "dedup_minhash_lsh": (q_dedup_minhash, ORACLE_DEDUP_MINHASH),
    "dedup_simhash": (q_dedup_simhash, ORACLE_DEDUP_SIMHASH),
    "dedup_ngram_jaccard": (q_dedup_jaccard, ORACLE_DEDUP_JACCARD),
    "dedup_components": (q_dedup_components, ORACLE_DEDUP_COMPONENTS),
    "ann_bruteforce_topk": (q_ann_bruteforce, ORACLE_ANN_BRUTEFORCE),
    "ann_ivf_topk": (q_ann_ivf, ORACLE_ANN_IVF),
    "ann_lsh_buckets": (q_ann_lsh_buckets, ORACLE_ANN_LSH),
    "lang_id": (q_lang_id, ORACLE_LANG_ID),
    "text_quality": (q_quality, ORACLE_QUALITY),
    "doc_fingerprint": (q_doc_fingerprint, ORACLE_DOC_FINGERPRINT),
    "multimodal_features": (q_multimodal, ORACLE_MULTIMODAL),
    "corpus_clean": (q_corpus_clean, ORACLE_CORPUS_CLEAN),
    "chunking_sampling": (q_chunking_sampling, ORACLE_CHUNKING_SAMPLING),
    "decontamination": (q_decontamination, ORACLE_DECONTAMINATION),
}
