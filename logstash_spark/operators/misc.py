"""Small stateless filters: fingerprint, uuid, anonymize, prune, de_dot,
truncate, urldecode, syslog_pri, cidr, drop, clone, split, translate.

References (default-distribution plugins; rakelib/plugins-metadata.json
lines in parens; semantics from docs/reference/core-operations.md unless
noted):
 fingerprint(135), uuid(in-core logstash-core/.../plugins/filters/
 Uuid.java:40-70), anonymize(83), prune(190), de_dot(105), truncate(219),
 urldecode(223), syslog_pri(207), cidr(87), drop(117), clone(91),
 split(203), translate(215).

All pure Column expressions or (for translate) a broadcast hash join —
the strategies that stay cheap at 100 TB: narrow maps and map-side joins.
"""

from __future__ import annotations

import uuid as _uuid

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


# -- fingerprint (meta:135; docs core-operations.md:41-55) -------------------

def _hash_col(base: Column, method: str) -> Column:
    method = method.upper()
    if method == "SHA256":
        return F.sha2(base, 256)
    if method == "SHA1":
        return F.sha1(base)
    if method == "MD5":
        return F.md5(base)
    if method == "MURMUR3":
        return F.hash(base).cast("string")
    if method == "XX64":
        return F.xxhash64(base).cast("string")
    raise ValueError(f"unsupported hash method {method}")


def fingerprint(df: DataFrame, sources: list[str], target: str = "fingerprint",
                method: str = "SHA256", key: str | None = None,
                concatenate_sources: bool = True) -> DataFrame:
    if concatenate_sources:
        base = F.concat_ws("|", *[F.col(s).cast("string") for s in sources])
    else:
        # plugin semantics without concatenate_sources: each source is
        # fingerprinted into target in turn, so the LAST source's hash is
        # what survives (Fingerprint filter README's documented footgun)
        base = F.col(sources[-1]).cast("string")
    if key:
        base = F.concat(F.lit(key), F.lit("|"), base)
    return df.withColumn(target, _hash_col(base, method))


# -- uuid (in-core Uuid.java:40-70) ------------------------------------------

def uuid_filter(df: DataFrame, target: str = "uuid", overwrite: bool = False,
                deterministic_from: list[str] | None = None) -> DataFrame:
    """Add a UUID unless present (Uuid.java:58-64 `overwrite` semantics).

    `deterministic_from`: UUIDv5-style name-based UUID derived from md5 of
    the given columns — used where tests need reproducibility (random
    uuid() is nondeterministic across retries, a correctness hazard for an
    exactly-once sink; the reference has the same caveat).
    """
    if deterministic_from:
        h = F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in deterministic_from]))
        new = F.concat_ws(
            "-",
            F.substring(h, 1, 8), F.substring(h, 9, 4), F.substring(h, 13, 4),
            F.substring(h, 17, 4), F.substring(h, 21, 12),
        )
    else:
        new = F.expr("uuid()")
    if overwrite or target not in df.columns:
        return df.withColumn(target, new)
    return df.withColumn(target, F.coalesce(F.col(target), new))


# -- anonymize (meta:83) ------------------------------------------------------

def anonymize(df: DataFrame, fields: list[str], key: str = "secret",
              method: str = "SHA256") -> DataFrame:
    for f in fields:
        df = df.withColumn(
            f, _hash_col(F.concat(F.lit(key), F.col(f).cast("string")), method))
    return df


# -- prune (meta:190) / de_dot (meta:105) -------------------------------------

def prune(df: DataFrame, whitelist: list[str] | None = None,
          blacklist: list[str] | None = None) -> DataFrame:
    """Column pruning IS the operator — feeds Catalyst's pruning directly.

    whitelist_names/blacklist_names are REGEXES in the plugin (README:
    `whitelist_names => ["^field\\d+"]`), matched by search against each
    field name — driver-side only, the plan just gains a narrower select.
    """
    import re as _re

    if whitelist:
        pats = [_re.compile(p) for p in whitelist]
        return df.select(*[c for c in df.columns
                           if any(p.search(c) for p in pats)])
    if blacklist:
        pats = [_re.compile(p) for p in blacklist]
        return df.drop(*[c for c in df.columns
                         if any(p.search(c) for p in pats)])
    return df


def de_dot(df: DataFrame, separator: str = "_") -> DataFrame:
    for c in df.columns:
        if "." in c:
            df = df.withColumnRenamed(c, c.replace(".", separator))
    return df


# -- truncate (meta:219) / urldecode (meta:223) -------------------------------

def truncate(df: DataFrame, fields: list[str], length_bytes: int) -> DataFrame:
    """Truncate to length_bytes BYTES (plugin semantics — not characters).

    UTF-8 aware: the byte slice is decoded and a trailing partial
    codepoint (decoded as U+FFFD) is dropped, so output is always valid
    UTF-8 at most length_bytes long.  Short strings pass through
    untouched (no re-encode cost on the common path).
    """
    n = length_bytes
    for f in fields:
        col = F.col(f)
        b = F.encode(col, "UTF-8")

        def is_cont(pos):
            # UTF-8 continuation byte: 0b10xxxxxx (128..191)
            v = F.conv(F.hex(F.substring(b, pos, 1)), 16, 10).try_cast("int")
            return F.coalesce((v >= 128) & (v < 192), F.lit(False))

        # largest clean cut <= n: back off while the byte AFTER the cut is
        # a continuation byte (a codepoint is at most 4 bytes -> 3 checks)
        cut = (F.when(~is_cont(n + 1), n)
                .when(~is_cont(n), n - 1)
                .when(~is_cont(n - 1), n - 2)
                .otherwise(n - 3))
        df = df.withColumn(
            f, F.when(F.octet_length(col) <= n, col)
                .otherwise(F.decode(F.substring(b, 1, cut), "UTF-8")))
    return df


def urldecode(df: DataFrame, field: str, target: str | None = None) -> DataFrame:
    return df.withColumn(target or field, F.try_url_decode(F.col(field)))


# -- syslog_pri (meta:207) -----------------------------------------------------

SYSLOG_FACILITIES = [
    "kernel", "user-level", "mail", "daemon", "security/authorization",
    "syslogd", "line printer", "network news", "uucp", "clock", "security/authorization",
    "ftp", "ntp", "log audit", "log alert", "clock", "local0", "local1", "local2",
    "local3", "local4", "local5", "local6", "local7",
]
SYSLOG_SEVERITIES = [
    "emergency", "alert", "critical", "error", "warning", "notice",
    "informational", "debug",
]


def syslog_pri(df: DataFrame, source: str = "syslog_pri") -> DataFrame:
    pri = F.col(source).cast("int")
    fac = F.floor(pri / 8).cast("int")
    sev = F.pmod(pri, F.lit(8)).cast("int")
    fac_map = F.array(*[F.lit(x) for x in SYSLOG_FACILITIES])
    sev_map = F.array(*[F.lit(x) for x in SYSLOG_SEVERITIES])
    return (
        df.withColumn("syslog_facility_code", fac)
        .withColumn("syslog_severity_code", sev)
        .withColumn("syslog_facility", F.element_at(fac_map, fac + 1))
        .withColumn("syslog_severity", F.element_at(sev_map, sev + 1))
    )


# -- cidr (meta:87) -------------------------------------------------------------

def ip_to_long(col: Column) -> Column:
    """Dotted-quad IPv4 -> int64, pure arithmetic (no UDF)."""
    o = F.split(col, r"\.")
    return (
        F.element_at(o, 1).cast("long") * 16777216
        + F.element_at(o, 2).cast("long") * 65536
        + F.element_at(o, 3).cast("long") * 256
        + F.element_at(o, 4).cast("long")
    )


def cidr_match(col: Column, network: str) -> Column:
    """True when IPv4 address column falls inside `a.b.c.d/n`."""
    net, bits = network.split("/")
    bits = int(bits)
    base = 0
    for part in net.split("."):
        base = base * 256 + int(part)
    mask = ((1 << 32) - 1) ^ ((1 << (32 - bits)) - 1)
    lo = base & mask
    hi = lo + (1 << (32 - bits)) - 1
    ip = ip_to_long(col)
    return ip.between(F.lit(lo), F.lit(hi))


def cidr(df: DataFrame, source: str, networks: list[str],
         match_tag: str = "cidr_match") -> DataFrame:
    from logstash_spark.functions.decorators import add_tag
    pred = None
    for n in networks:
        p = cidr_match(F.col(source), n)
        pred = p if pred is None else (pred | p)
    return add_tag(df, match_tag, when=pred)


# -- drop (meta:117; docs core-operations.md:27-38) ------------------------------

def drop(df: DataFrame, condition: Column, percentage: int = 100,
         sample_col: Column | None = None) -> DataFrame:
    """Cancel events matching `condition`.  `percentage` < 100 drops only a
    deterministic slice — at scale we avoid rand() (non-idempotent under
    retry, which would break exactly-once); callers pass a stable hash
    column via sample_col."""
    if percentage >= 100:
        return df.filter(~condition | condition.isNull())
    bucket = F.pmod(F.abs(sample_col if sample_col is not None else F.xxhash64(*df.columns)),
                    F.lit(100))
    return df.filter(~(condition & (bucket < percentage)) | condition.isNull())


# -- clone (meta:91; docs how-logstash-works.md:33) -------------------------------

def clone(df: DataFrame, types: list[str], type_col: str = "type") -> DataFrame:
    """Original + one copy per type; copies carry type=<t>, original keeps
    its type (null by default).  explode(array(structs)) — single narrow
    stage, no shuffle."""
    orig = F.lit(None).cast("string") if type_col not in df.columns else F.col(type_col)
    variants = [orig] + [F.lit(t) for t in types]
    df = df.withColumn("__clone_type", F.explode(F.array(*variants)))
    return df.withColumn(type_col, F.col("__clone_type")).drop("__clone_type")


# -- split (meta:203) --------------------------------------------------------------

def split_field(df: DataFrame, field: str, separator: str | None = None,
                target: str | None = None) -> DataFrame:
    """One event per element of an array field (or per separator-token of a
    string field)."""
    col = F.col(field)
    arr = F.split(col, separator) if separator is not None else col
    return df.withColumn(target or field, F.explode(arr))


# -- translate (meta:215; docs deploying-scaling-logstash.md:77) --------------------

def translate(df: DataFrame, source: str, dictionary: dict[str, str],
              target: str, fallback: str | None = None,
              exact: bool = True) -> DataFrame:
    """Dictionary enrichment.

    Small dicts inline as a `map` literal (pure expression); larger ones
    should use translate_join below.  `fallback` fills misses.

    ``exact=False`` = the plugin's `regex => true` mode: keys are regexes
    tried in dictionary order, first match wins — compiled to a chained
    CASE WHEN rlike (still one codegen stage, no Python).
    """
    if not exact:
        looked = F.lit(None).cast("string")
        src = F.col(source).cast("string")
        for k, v in reversed(list(dictionary.items())):
            looked = F.when(src.rlike(k), F.lit(v)).otherwise(looked)
    else:
        pairs = []
        for k, v in dictionary.items():
            pairs += [F.lit(k), F.lit(v)]
        m = F.create_map(*pairs)
        looked = m[F.col(source).cast("string")]
    if fallback is not None:
        looked = F.coalesce(looked, F.lit(fallback))
    return df.withColumn(target, looked)


def load_dictionary_path(path: str) -> dict[str, str]:
    """translate's `dictionary_path` loader (plugin supports YAML, JSON,
    and 2-column CSV, sniffed by extension — meta:215).

    Driver-side read at plan-build time, exactly like the reference's
    load-on-start (+`refresh_interval` reload): the dict becomes either a
    map literal (translate) or a broadcast dim (translate_join) — the
    file itself is never shipped to executors.
    """
    import json as _json
    import os

    ext = os.path.splitext(path)[1].lower()
    with open(path, encoding="utf-8") as f:
        if ext in (".yml", ".yaml"):
            # flat `key: value` YAML — the plugin's documented dict shape;
            # quoted scalars and comments supported, nesting rejected
            out: dict[str, str] = {}
            for ln in f:
                ln = ln.split("#", 1)[0].rstrip()
                if not ln.strip():
                    continue
                if ln[0] in " \t":
                    raise ValueError(
                        f"translate dictionary_path {path}: nested YAML is "
                        "not a flat dictionary")
                k, _, v = ln.partition(":")
                out[k.strip().strip("'\"")] = v.strip().strip("'\"")
            return out
        if ext == ".json":
            d = _json.load(f)
            if not isinstance(d, dict):
                raise ValueError(f"{path}: JSON dictionary must be an object")
            return {str(k): str(v) for k, v in d.items()}
        if ext == ".csv":
            import csv as _csv

            return {row[0]: row[1] for row in _csv.reader(f) if len(row) >= 2}
    raise ValueError(
        f"translate dictionary_path {path}: unsupported extension {ext!r} "
        "(yml/yaml/json/csv)")


def translate_join(df: DataFrame, source: str, dict_df: DataFrame,
                   key_col: str, value_col: str, target: str,
                   fallback: str | None = None) -> DataFrame:
    """Broadcast-hash-join variant for big dictionaries: the Spark-native
    answer to translate/jdbc_static-style enrichment — dim table ships to
    every executor once, zero shuffle of the fact stream."""
    dim = broadcast(dict_df.select(F.col(key_col).alias("__k"),
                                   F.col(value_col).alias(target)))
    out = df.join(dim, df[source] == dim["__k"], "left").drop("__k")
    if fallback is not None:
        out = out.withColumn(target, F.coalesce(F.col(target), F.lit(fallback)))
    return out
