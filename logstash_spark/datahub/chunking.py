"""Document chunking + deterministic sampling for training-data mixes.

Two operations every corpus pipeline runs right before tokenization:

* chunk_documents — split long documents into ~max_tokens windows with
  overlap (context-window packing).  Pure expressions: split -> explode
  over a computed chunk-index sequence -> slice/array_join.  The explode
  is a narrow 1:N Generate, no shuffle; chunk counts are derived per row
  so skewed document lengths never hot-spot a reducer.

* deterministic_sample / stratified_sample — reproducible sampling keyed
  on a hash of the row id, NOT rand(): the same (id, seed, rate) keeps or
  drops the row in every engine, every run, every retry — which is what
  makes sampled training mixes auditable.  xxhash64 is Spark-native and
  uniform; rate maps to a threshold on the hash's unsigned fraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    max_tokens: int = 512, overlap: int = 64,
                    min_tokens: int = 1) -> DataFrame:
    """One row per chunk: (id_col, chunk_idx, chunk_text, n_chunk_tokens).

    Whitespace tokens; stride = max_tokens - overlap; the final window is
    the remainder (>= min_tokens, so a trailing sliver of pure overlap is
    not re-emitted).  Documents shorter than max_tokens yield one chunk.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    # full-whitespace trim: Spark trim() strips only ASCII spaces, so a
    # leading tab/newline would survive and split(\s+) would emit a leading
    # "" token, inflating counts and injecting empty tokens into chunk_text
    stripped = F.regexp_replace(text_col, r"^\s+|\s+$", "")
    # split("") yields [""] — an empty doc must be 0 tokens, not 1
    toks = F.when(stripped == "", F.array().cast("array<string>")) \
            .otherwise(F.split(stripped, r"\s+"))
    d = df.select(id_col, toks.alias("__toks")) \
          .withColumn("__n", F.size("__toks")) \
          .filter(F.col("__n") >= min_tokens)
    # number of windows starting at 0, stride, 2*stride... that still add
    # new tokens: ceil(max(n - overlap, 1) / stride)
    n_chunks = F.ceil(F.greatest(F.col("__n") - overlap, F.lit(1)) /
                      F.lit(stride)).cast("int")
    d = d.withColumn("chunk_idx",
                     F.explode(F.sequence(F.lit(0), n_chunks - 1)))
    start = F.col("chunk_idx") * stride + 1          # slice() is 1-based
    piece = F.slice("__toks", start, max_tokens)
    return d.select(
        id_col, "chunk_idx",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_chunk_tokens"))


def _keep_pred(key: Column, rate, seed: int,
               method: str = "xxhash64") -> Column:
    """Deterministic keep predicate: uniform hash fraction < rate.

    ``rate`` may be a float or a per-row Column of rates (stratified).
    ``method``: ``xxhash64`` (Spark-native, fastest) or ``md5`` (first 8
    hex chars of md5(key|seed) as a 32-bit fraction — reproducible in ANY
    engine, the same trick as the minhash signatures; the DuckDB oracle
    uses this path)."""
    if method == "md5":
        h = F.md5(F.concat(key.cast("string"), F.lit(f"|{seed}")))
        frac = (F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
                / F.lit(float(2 ** 32)))
    elif method == "xxhash64":
        h = F.xxhash64(key, F.lit(seed))
        # xxhash64 is signed int64; shift to [0, 1) uniformly
        frac = (h.cast("double") / F.lit(float(2 ** 64))) + F.lit(0.5)
    else:
        raise ValueError(f"unknown sample hash method {method!r}")
    return frac < (rate if isinstance(rate, Column) else F.lit(float(rate)))


def deterministic_sample(df: DataFrame, rate: float,
                         key_col: str | Column = "doc_id", seed: int = 42,
                         method: str = "xxhash64") -> DataFrame:
    """Keep ~rate of rows, decided by hash(key, seed) — reproducible
    across runs, engines, partitionings, and retries (rand() is none of
    those under task retry).  ``key_col`` may be a composite Column."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    return df.filter(_keep_pred(key, rate, seed, method))


def stratified_sample(df: DataFrame, strata_col: str,
                      rates: dict[str, float], default_rate: float = 0.0,
                      key_col: str = "doc_id", seed: int = 42,
                      method: str = "xxhash64") -> DataFrame:
    """Per-stratum deterministic rates (the training-mix shape: 'keep 100%
    of books, 10% of web, drop the rest').  One pure-expression filter —
    no shuffle, no per-stratum scans."""
    rate = F.lit(float(default_rate))
    for k, r in rates.items():
        rate = F.when(F.col(strata_col) == k, F.lit(float(r))).otherwise(rate)
    return df.filter(_keep_pred(F.col(key_col), rate, seed, method))


def pack_chunks(df: DataFrame, budget: int,
                text_col: str = "chunk_text",
                tokens_col: str = "n_chunk_tokens",
                sep: str = "\n\n") -> DataFrame:
    """Greedy sequence packing: combine chunks into training sequences of
    at most ``budget`` tokens (first-fit in partition order).

    Packing is PARTITION-LOCAL (the standard distributed shape: packing is
    an approximation anyway, and any exact global packing would serialize
    the corpus through one node).  Each Arrow batch group is packed with a
    vectorized cumulative-budget pass; sequences never cross partitions,
    so the op is a narrow map — repartition upstream to set the packing
    domain (e.g. by source) if mixing matters.  A single chunk larger than
    ``budget`` becomes its own (oversized) sequence rather than being
    dropped — callers chunk first, so this only happens on degenerate
    inputs.  Output: one row per packed sequence
    (seq_in_partition, n_chunks, n_tokens, text).
    """
    out_schema = ("partition_id int, seq_in_partition long, n_chunks long, "
                  "n_tokens long, text string")

    def pack(batches):
        import pandas as pd

        rows: list[dict] = []
        cur_texts: list[str] = []
        cur_tokens = 0
        seq_no = 0
        pid = -1

        def flush():
            nonlocal cur_texts, cur_tokens, seq_no
            if cur_texts:
                rows.append({"partition_id": pid,
                             "seq_in_partition": seq_no,
                             "n_chunks": len(cur_texts),
                             "n_tokens": cur_tokens,
                             "text": sep.join(cur_texts)})
                seq_no += 1
                cur_texts, cur_tokens = [], 0

        for pdf in batches:
            if pid == -1 and len(pdf):
                from pyspark import TaskContext

                ctx = TaskContext.get()
                pid = ctx.partitionId() if ctx else 0
            for t, n in zip(pdf[text_col].values, pdf[tokens_col].values):
                n = int(n)
                if cur_tokens and cur_tokens + n > budget:
                    flush()
                cur_texts.append(t)
                cur_tokens += n
                if cur_tokens >= budget:
                    flush()
        flush()
        yield pd.DataFrame(rows, columns=["partition_id", "seq_in_partition",
                                          "n_chunks", "n_tokens", "text"]) \
            if rows else pd.DataFrame(columns=["partition_id",
                                               "seq_in_partition", "n_chunks",
                                               "n_tokens", "text"])

    return df.select(text_col, tokens_col).mapInPandas(pack, out_schema)
