"""Composed training-data cleaning pipeline: the shape a 100 TB corpus
pass actually runs — language gate -> quality gate -> exact dedup — as one
DataFrame plan so Catalyst fuses the stateless stages into a single scan.

Scale shape: lang/quality are pure Columns (no shuffle); dedup is ONE
shuffle on the content hash (row_number window), keeping the first doc_id
per hash — the same keep-first contract as dedup.exact_dedup, but inline
so the pipeline emits the surviving documents rather than hash groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def corpus_clean(
    df: DataFrame,
    lang: str = "en",
    min_quality: float = 0.2,
    text_col: str = "text",
) -> DataFrame:
    """Keep documents that are in ``lang``, score >= ``min_quality``, and
    are the first (min doc_id) occurrence of their normalized content."""
    from logstash_spark.datahub.dedup import normalize_text
    from logstash_spark.datahub.textstats import (lang_id, quality_score,
                                                  token_stats)

    scored = quality_score(token_stats(lang_id(df, text_col=text_col),
                                       text_col=text_col), text_col=text_col)
    filtered = scored.filter(
        (F.col("pred_lang") == lang) & (F.col("quality") >= min_quality))
    hashed = filtered.withColumn("__h", F.md5(normalize_text(F.col(text_col))))
    w = Window.partitionBy("__h").orderBy("doc_id")
    return (hashed.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__h"))


def corpus_clean_fuzzy(
    df: DataFrame,
    lang: str = "en",
    min_quality: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    band_size: int = 4,
    jaccard_threshold: float | None = 0.5,
) -> DataFrame:
    """The full 100 TB cleaning pass: language gate -> quality gate ->
    exact dedup -> NEAR-dup clustering, emitting surviving documents.

    Stage shapes (all reusing the tested pieces):
      1. lang/quality: pure Columns, fused into the scan (corpus_clean).
      2. exact dedup: one shuffle on the content hash.
      3. MinHash+LSH candidate pairs over the survivors
         (dedup.minhash_lsh_dedup — shingle explode, sig agg, band join).
      4. optional exact n-gram Jaccard verification of the candidates
         (bounded: only LSH candidates are scored, never all pairs) —
         kills LSH false positives before they merge clusters.
      5. connected components -> keeper per near-dup group
         (components.dedup_groups).

    Returns the kept documents (doc_id, pred_lang, quality) — group
    members that lost to their keeper are dropped, like the exact stage.
    """
    from pyspark.sql import functions as F

    from logstash_spark.datahub.components import dedup_groups
    from logstash_spark.datahub.dedup import (minhash_lsh_dedup,
                                              ngram_jaccard_for_pairs)

    exact = corpus_clean(df, lang=lang, min_quality=min_quality,
                         text_col=text_col).select(id_col, "pred_lang",
                                                   "quality")
    survivors = df.select(id_col, text_col).join(exact, id_col)
    pairs = minhash_lsh_dedup(survivors, text_col=text_col, id_col=id_col,
                              n_hashes=n_hashes, band_size=band_size)
    if jaccard_threshold is not None:
        # exact verification scoped to the LSH candidates only — the
        # candidate set bounds the join BEFORE the intersection count, so
        # this never degenerates to the all-pairs inverted-index join
        verified = ngram_jaccard_for_pairs(
            survivors, pairs, text_col=text_col, id_col=id_col)
        pairs = verified.filter(
            F.col("jaccard") >= jaccard_threshold).select("a", "b")
    groups = dedup_groups(survivors, pairs, id_col=id_col)
    return (survivors.join(groups.filter("is_keeper").select(id_col), id_col)
            .select(id_col, "pred_lang", "quality"))
