"""Text analysis for training-data curation: language ID, quality scoring,
token counting, document fingerprinting.

All pure Column expressions (regexp counts + arithmetic): the whole module
runs inside whole-stage codegen with zero shuffles — at 100 TB these are
scan-speed operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logstash_spark.datahub.dedup import normalize_text

# marker-word heuristics per language (argmax of marker hits; deterministic
# tie-break by list order)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "des", "est"],
    "zh": [],  # no-latin-marker fallback handled by cjk ratio
}

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

BPE_ISH_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _marker_hits(col: Column, words: list[str]) -> Column:
    if not words:
        return F.lit(0).cast("bigint")
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pat), F.lit(0))).cast("bigint")


def lang_id(df: DataFrame, text_col: str = "text",
            target: str = "pred_lang") -> DataFrame:
    """Marker-word language ID with cjk-character fallback."""
    scores = {lang: _marker_hits(F.col(text_col), w)
              for lang, w in LANG_MARKERS.items() if w}
    cjk = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[一-鿿]"), F.lit(0))).cast("bigint")
    best = None
    for lang, score in scores.items():
        if best is None:
            best = (F.lit(lang), score)
        else:
            prev_lang, prev_score = best
            best = (
                F.when(score > prev_score, F.lit(lang)).otherwise(prev_lang),
                F.greatest(score, prev_score),
            )
    pred = F.when(cjk > 0, F.lit("zh")).otherwise(
        F.when(best[1] > 0, best[0]).otherwise(F.lit("unknown")))
    return df.withColumn(target, pred)


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish token counts (both bigint for oracle parity)."""
    ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("bigint")
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_TOKEN_RE), F.lit(0))).cast("bigint")
    return (df.withColumn("n_ws_tokens", ws)
              .withColumn("n_bpe_tokens", bpe))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/stopword heuristic quality features + score.

    score = stopword_ratio * 0.5 + alpha_ratio * 0.5, penalized for
    too-short docs — a simple stand-in for fasttext-style quality models,
    kept exactly reproducible in SQL.
    """
    text = F.col(text_col)
    n_chars = F.length(text).cast("bigint")
    toks = F.split(F.trim(text), r"\s+")
    n_tokens = F.size(toks).cast("bigint")
    stop_pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
    n_stop = F.size(F.regexp_extract_all(F.lower(text), F.lit(stop_pat), F.lit(0))).cast("bigint")
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), F.lit(0))).cast("bigint")
    n_alpha = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]"), F.lit(0))).cast("bigint")
    stop_ratio = n_stop / n_tokens
    punct_ratio = n_punct / n_chars
    alpha_ratio = n_alpha / n_chars
    score = F.when(n_tokens < 5, F.lit(0.0)).otherwise(
        stop_ratio * 0.5 + alpha_ratio * 0.5)
    return (df
            .withColumn("n_chars_calc", n_chars)
            .withColumn("n_tokens", n_tokens)
            .withColumn("stop_ratio", stop_ratio)
            .withColumn("punct_ratio", punct_ratio)
            .withColumn("alpha_ratio", alpha_ratio)
            .withColumn("quality", score))


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprints: full-normalized md5 + 64-char prefix md5 +
    length bucket — the cheap pre-filter tier before MinHash."""
    norm = normalize_text(F.col(text_col))
    return (df
            .withColumn("fp_full", F.md5(norm))
            .withColumn("fp_prefix", F.md5(F.substring(norm, 1, 64)))
            .withColumn("len_bucket", F.floor(F.length(norm) / 64).cast("bigint")))
