"""Community-ecosystem filters beyond the 33-default set: bytes, range,
cipher, environment, extractnumbers, json_encode, metricize, tld, age,
alter.

These are the most-installed non-default logstash filter plugins (public
rubygems: logstash-filter-bytes, -range, -cipher, -environment,
-extractnumbers, -json_encode, -metricize, -tld, -age, -alter); a user
migrating a real config hits them right after the default set.  Semantics
follow each plugin's public README; none are vendored in
/root/reference (the reference distributes them out-of-tree), so the
SURVEY §2.3 citations here are to the plugins' public docs, not to
reference files.

All pure Column expressions — narrow maps that stay cheap at 100 TB.
`cipher` uses the JVM-side aes_encrypt/aes_decrypt builtins (no Python in
the loop); `environment` reads the env ONCE driver-side (the plugin also
snapshots at startup) and stamps literals.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logstash_spark.functions.decorators import add_tag


# -- bytes (logstash-filter-bytes) -------------------------------------------

_BYTES_RX = r"^\s*([0-9]*\.?[0-9]+)\s*(?:([KkMmGgTtPp])(i|I)?)?[Bb]?\s*$"


def bytes_filter(
    df: DataFrame,
    source: str,
    target: str = "bytes_value",
    conversion_method: str = "binary",
    tag_on_failure: str = "_bytesparsefailure",
) -> DataFrame:
    """Parse human byte sizes ("2kb", "1.5 GiB", "123") into a byte count.

    ``conversion_method``: "binary" -> every prefix is a power of 1024;
    "metric" -> powers of 1000, EXCEPT explicit IEC units ("KiB") which
    are always binary (plugin README's mixed-unit rule).
    """
    src = F.col(source)
    num = F.regexp_extract(src, _BYTES_RX, 1)
    prefix = F.lower(F.regexp_extract(src, _BYTES_RX, 2))
    iec = F.regexp_extract(src, _BYTES_RX, 3) != ""
    power = (F.when(prefix == "k", 1).when(prefix == "m", 2)
              .when(prefix == "g", 3).when(prefix == "t", 4)
              .when(prefix == "p", 5).otherwise(0))
    base = (F.lit(1024.0) if conversion_method == "binary"
            else F.when(iec, 1024.0).otherwise(1000.0))
    ok = num != ""
    # try_cast: values beyond BIGINT (e.g. "8192PiB") saturate to the long
    # range instead of raising the ANSI overflow error a plain cast gives
    # (found by the hypothesis suite)
    value = F.round(num.try_cast("double") * F.pow(base, power)).try_cast("long")
    df = df.withColumn(target, F.when(ok, value))
    return add_tag(df, tag_on_failure, when=~F.coalesce(ok, F.lit(False)))


# -- range (logstash-filter-range) -------------------------------------------

def range_filter(
    df: DataFrame,
    ranges: list[tuple],
    negate: bool = False,
) -> DataFrame:
    """Check fields against [min, max] and apply actions.

    ``ranges``: list of ``(field, min, max, action)`` where action is
    ``"tag:NAME"``, ``"field:NAME:VALUE"`` or ``"drop"`` (plugin README's
    action grammar).  Numeric columns compare by value; string columns by
    length (plugin semantics).  ``negate`` flips every check.
    """
    for fname, lo, hi, action in ranges:
        dtype = dict(df.dtypes).get(fname, "string")
        col = F.length(F.col(fname)) if dtype == "string" else F.col(fname)
        cond = col.between(F.lit(lo), F.lit(hi))
        if negate:
            cond = ~cond
        cond = F.coalesce(cond, F.lit(False))
        kind, _, rest = action.partition(":")
        if kind == "tag":
            df = add_tag(df, rest, when=cond)
        elif kind == "field":
            name, _, value = rest.partition(":")
            df = df.withColumn(
                name,
                F.when(cond, F.lit(value)).otherwise(
                    F.col(name) if name in df.columns
                    else F.lit(None).cast("string")))
        elif kind == "drop":
            df = df.filter(~cond)
        else:
            raise ValueError(f"range: unsupported action {action!r}")
    return df


# -- cipher (logstash-filter-cipher) -----------------------------------------

def cipher(
    df: DataFrame,
    source: str,
    target: str,
    key: str,
    mode: str = "encrypt",
    algorithm: str = "GCM",
    iv: str | None = None,
) -> DataFrame:
    """AES encrypt/decrypt a field via the JVM builtins.

    encrypt -> base64(aes_encrypt(src)); decrypt -> aes_decrypt(unbase64).
    ``algorithm`` is the AES block mode (GCM default, like the plugin's
    aes-256-gcm default; CBC/ECB accepted — ECB is deterministic, useful
    for oracle-gated tests).  Key length selects AES-128/192/256.
    """
    k = F.lit(key)
    m = F.lit(algorithm)
    if mode == "encrypt":
        args = [F.col(source).cast("binary"), k.cast("binary"), m]
        if iv is not None:
            args += [F.lit("DEFAULT"), F.lit(iv).cast("binary")]
        out = F.base64(F.aes_encrypt(*args))
    elif mode == "decrypt":
        out = F.aes_decrypt(
            F.unbase64(F.col(source)), k.cast("binary"), m).cast("string")
    else:
        raise ValueError(f"cipher: mode must be encrypt|decrypt, got {mode!r}")
    return df.withColumn(target, out)


# -- environment (logstash-filter-environment) -------------------------------

def environment(df: DataFrame, add_metadata_from_env: dict[str, str]) -> DataFrame:
    """Stamp environment variables as fields: {target_field: ENV_NAME}.

    Env is read ONCE on the driver (the plugin likewise snapshots at
    startup); executors receive literals, so this is cluster-safe by
    construction.  Targets land under `@metadata` naming convention when
    prefixed by the caller, matching the plugin's default.
    """
    for field_name, env_name in add_metadata_from_env.items():
        df = df.withColumn(field_name, F.lit(os.environ.get(env_name)))
    return df


# -- extractnumbers (logstash-filter-extractnumbers) -------------------------

_FLOAT_RX = r"[+-]?\d+\.\d+"
_INT_RX = r"[+-]?\d+"


def extractnumbers(df: DataFrame, source: str,
                   int_target: str = "ints",
                   float_target: str = "floats") -> DataFrame:
    """Extract every int and float appearing in a string field.

    The plugin emits int0..intN / float0..floatN fields; a dynamic column
    count is an anti-pattern on a columnar engine, so the Spark-native
    shape is two typed arrays (positional parity with the plugin's
    numbered fields).  Floats are matched first and blanked before the
    int scan (lookaround-free, so the same two regexes run on any RE2-
    class engine — the DuckDB oracle uses them verbatim).
    """
    src = F.col(source)
    df = df.withColumn(
        float_target,
        F.transform(F.regexp_extract_all(src, F.lit(_FLOAT_RX), 0),
                    lambda s: s.cast("double")))
    cleaned = F.regexp_replace(src, _FLOAT_RX, " ")
    return df.withColumn(
        int_target,
        F.transform(F.regexp_extract_all(cleaned, F.lit(_INT_RX), 0),
                    lambda s: s.cast("long")))


# -- json_encode (logstash-filter-json_encode) -------------------------------

def json_encode(df: DataFrame, source: str | list[str],
                target: str = "json") -> DataFrame:
    """Serialize a field (or a named set of fields) to a JSON string.

    One field -> its JSON value; list of fields -> JSON object with those
    keys (field order preserved, matching to_json/struct semantics).
    """
    if isinstance(source, str):
        col = F.to_json(F.struct(F.col(source)))
        # single-field: the plugin writes the VALUE, not an object
        out = F.regexp_extract(col, r"^\{\"[^\"]+\":(.*)\}$", 1)
        return df.withColumn(target, out)
    return df.withColumn(target, F.to_json(F.struct(*[F.col(s) for s in source])))


# -- metricize (logstash-filter-metricize) -----------------------------------

def metricize(df: DataFrame, metrics: list[str],
              metric_col: str = "metric", value_col: str = "value",
              drop_null: bool = True) -> DataFrame:
    """Split one multi-metric event into one event per metric.

    explode over a built array of (name, value) structs — a 1:N narrow
    Generate, no shuffle.  ``drop_null`` skips metrics absent on a row
    (plugin: absent metric -> no cloned event).
    """
    pairs = F.array(*[
        F.struct(F.lit(m).alias(metric_col),
                 F.col(m).cast("double").alias(value_col))
        for m in metrics
    ])
    out = df.withColumn("__mz", F.explode(pairs))
    out = (out.withColumn(metric_col, F.col(f"__mz.{metric_col}"))
              .withColumn(value_col, F.col(f"__mz.{value_col}"))
              .drop("__mz", *metrics))
    if drop_null:
        out = out.filter(F.col(value_col).isNotNull())
    return out


# -- tld (logstash-filter-tld) -----------------------------------------------

def tld(df: DataFrame, source: str, target_prefix: str = "tld_") -> DataFrame:
    """Split a hostname into tld / domain / subdomain.

    The plugin consults the public-suffix list; without bundling it, the
    last label is the tld (covers gTLDs).  Callers with multi-label
    suffixes (co.uk) pass a suffix table to `tld_with_suffixes`.
    """
    parts = F.split(F.col(source), r"\.")
    n = F.size(parts)
    t = F.element_at(parts, -1)
    sld = F.when(n >= 2, F.element_at(parts, -2))
    return (df.withColumn(target_prefix + "tld", F.when(n >= 1, t))
              .withColumn(target_prefix + "domain",
                          F.when(n >= 2, F.concat_ws(".", sld, t)))
              .withColumn(target_prefix + "subdomain",
                          F.when(n >= 3, F.array_join(
                              F.slice(parts, 1, n - 2), "."))))


def tld_with_suffixes(df: DataFrame, source: str, suffixes: DataFrame,
                      target_prefix: str = "tld_") -> DataFrame:
    """Public-suffix-aware variant: broadcast-join the suffix table
    (columns: suffix) on the longest matching suffix of the hostname.

    The longest-match reduction groups by ALL input columns, so exactly
    duplicate input rows collapse to one — feed a unique row key (any id
    column) if duplicates must survive."""
    from pyspark.sql.functions import broadcast

    host = F.col(source)
    sfx = broadcast(suffixes.select(F.col("suffix").alias("__sfx")))
    joined = df.join(
        sfx,
        host.endswith(F.concat(F.lit("."), F.col("__sfx"))) | (host == F.col("__sfx")),
        "left")
    # keep the LONGEST suffix per row (co.uk beats uk)
    keycols = [F.col(c) for c in df.columns]
    best = (joined.groupBy(*keycols)
            .agg(F.max_by("__sfx", F.length("__sfx")).alias("__best")))
    t = F.col("__best")
    rest = F.when(t.isNotNull() & (host != t),
                  F.expr(f"substring({source}, 1, length({source}) - length(__best) - 1)"))
    parts = F.split(rest, r"\.")
    return (best.withColumn(target_prefix + "tld", t)
                .withColumn(target_prefix + "domain",
                            F.when(t.isNotNull() & rest.isNotNull(),
                                   F.concat_ws(".", F.element_at(parts, -1), t)))
                .drop("__best"))


# -- age (logstash-filter-age) -----------------------------------------------

def age(df: DataFrame, target: str = "age",
        ts_col: str = "@timestamp", now=None) -> DataFrame:
    """Seconds between event time and now.

    ``now`` accepts a literal timestamp for deterministic runs (tests,
    oracle parity); None -> current_timestamp() like the plugin's
    Time.now.
    """
    now_col = F.current_timestamp() if now is None else F.lit(now).cast("timestamp")
    # NTZ columns cast through TIMESTAMP (session tz pinned UTC, wall time
    # preserved) — NTZ -> DOUBLE directly is not a legal cast
    ts_d = F.col(ts_col).cast("timestamp").cast("double")
    return df.withColumn(target, now_col.cast("double") - ts_d)


# -- alter (logstash-filter-alter) -------------------------------------------

def alter(
    df: DataFrame,
    condrewrite: list[tuple[str, str, str]] | None = None,
    condrewriteother: list[tuple[str, str, str, str]] | None = None,
    coalesce: dict[str, list[str]] | None = None,
) -> DataFrame:
    """alter's three sub-ops (plugin README):

    condrewrite: (field, expected, new) -> field = new where field == expected
    condrewriteother: (field, expected, other, new) -> other = new where
        field == expected
    coalesce: {target: [f1, f2, ...]} -> first non-null of the fields
    """
    for fname, expected, new in (condrewrite or []):
        df = df.withColumn(
            fname, F.when(F.col(fname) == expected, F.lit(new))
                    .otherwise(F.col(fname)))
    for fname, expected, other, new in (condrewriteother or []):
        base = (F.col(other) if other in df.columns
                else F.lit(None).cast("string"))
        df = df.withColumn(
            other, F.when(F.col(fname) == expected, F.lit(new)).otherwise(base))
    for tgt, sources in (coalesce or {}).items():
        df = df.withColumn(tgt, F.coalesce(*[F.col(s) for s in sources]))
    return df
