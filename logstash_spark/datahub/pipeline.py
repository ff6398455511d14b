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
