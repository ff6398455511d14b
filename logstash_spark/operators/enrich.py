"""Lookup-enrichment filters: geoip and useragent analogs.

Reference semantics:
* geoip — MaxMind DB lookup of an IP field into a geo struct (plugin
  logstash-filter-geoip, default distribution — rakelib/
  plugins-metadata.json:139; exercised by tools/benchmark-cli/.../cases/
  apache.cfg:17-19; DB management in-core x-pack/lib/filters/geoip/).
* useragent — UA-string parse into browser/os fields (plugin
  logstash-filter-useragent — plugins-metadata.json:227; apache.cfg:21-24).

Spark design (SURVEY.md §2.3): per-event point lookups are an anti-pattern
at 100 TB; both become **broadcast joins / pure Column rule tables**:

* geoip: the CIDR block table is a dimension DataFrame with precomputed
  [net_lo, net_hi] int64 bounds.  Enrichment is a broadcast *range* join —
  the fact side never shuffles; each task binary-searches the broadcast
  block list JVM-side.  With non-overlapping CIDRs each IP matches at most
  one block.
* useragent: an ordered regex rule table compiled to coalesce(
  regexp_extract...) Column expressions — whole-stage codegen, no UDF,
  no join at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.operators.misc import ip_to_long


def cidr_blocks_df(spark: SparkSession,
                   blocks: list[tuple[str, str, str]]) -> DataFrame:
    """Build a geo dimension from (cidr, country, city) rows with
    precomputed int64 bounds (driver-side math on a small dim is fine)."""
    rows = []
    for cidr, country, city in blocks:
        net, bits = cidr.split("/")
        bits = int(bits)
        base = 0
        for part in net.split("."):
            base = base * 256 + int(part)
        mask = ((1 << 32) - 1) ^ ((1 << (32 - bits)) - 1)
        lo = base & mask
        hi = lo + (1 << (32 - bits)) - 1
        rows.append((cidr, lo, hi, country, city))
    return spark.createDataFrame(
        rows, "cidr string, net_lo long, net_hi long, geo_country string, geo_city string")


def geoip(df: DataFrame, ip_col: str, blocks: DataFrame,
          tag_on_miss: str = "_geoip_lookup_failure",
          bucket_bits: int = 16) -> DataFrame:
    """Prefix-bucketed broadcast HASH join: ip in [net_lo, net_hi] -> geo.

    A pure range condition would plan as BroadcastNestedLoopJoin — O(rows x
    blocks), fatal with a real MaxMind-size table (~3M blocks).  Instead
    each block is exploded to the /``bucket_bits`` prefix buckets it spans
    (JVM-side sequence/explode on the dim only; MaxMind blocks are mostly
    /16../24 so expansion ~1x) and the join is an equi-join on the bucket
    with the range check as a join filter — Spark plans BroadcastHashJoin:
    each event hashes into exactly one bucket's (tiny) block list.

    Left join keeps non-matching events (reference tags them
    `_geoip_lookup_failure`).  The dim is broadcast so the event stream
    stays un-shuffled regardless of scale; with non-overlapping CIDRs each
    IP matches at most one block.
    """
    from logstash_spark.functions.decorators import add_tag

    shift = 32 - bucket_bits
    dim = blocks.withColumn(
        "__bucket",
        F.explode(F.sequence(F.shiftright("net_lo", shift),
                             F.shiftright("net_hi", shift))))
    ip_l = ip_to_long(F.col(ip_col))
    out = df.withColumn("__ip_l", ip_l).join(
        F.broadcast(dim),
        (F.shiftright(F.col("__ip_l"), shift) == F.col("__bucket"))
        & (F.col("__ip_l") >= F.col("net_lo"))
        & (F.col("__ip_l") <= F.col("net_hi")),
        "left",
    ).drop("__ip_l", "__bucket", "net_lo", "net_hi", "cidr")
    return add_tag(out, tag_on_miss, when=F.col("geo_country").isNull())


# Ordered UA rule table: (family, family_regex, version_regex).  First match
# wins, mirroring the reference parser's ordered YAML rules.
UA_RULES: list[tuple[str, str, str]] = [
    ("Googlebot", r"Googlebot/(\d+)", r"Googlebot/(\d+(?:\.\d+)*)"),
    ("bingbot", r"bingbot/(\d+)", r"bingbot/(\d+(?:\.\d+)*)"),
    ("Firefox", r"Firefox/(\d+)", r"Firefox/(\d+(?:\.\d+)*)"),
    ("Opera", r"OPR/(\d+)", r"OPR/(\d+(?:\.\d+)*)"),
    ("Edge", r"Edg(?:e|A|iOS)?/(\d+)", r"Edg(?:e|A|iOS)?/(\d+(?:\.\d+)*)"),
    ("Chrome", r"Chrome/(\d+)", r"Chrome/(\d+(?:\.\d+)*)"),
    ("Safari", r"Version/(\d+).*Safari", r"Version/(\d+(?:\.\d+)*)"),
    ("curl", r"curl/(\d+)", r"curl/(\d+(?:\.\d+)*)"),
    ("Wget", r"Wget/(\d+)", r"Wget/(\d+(?:\.\d+)*)"),
    ("python-requests", r"python-requests/(\d+)",
     r"python-requests/(\d+(?:\.\d+)*)"),
]

UA_OS_RULES: list[tuple[str, str]] = [
    ("Windows", r"Windows NT"),
    ("macOS", r"Mac OS X"),
    ("Android", r"Android"),
    ("iOS", r"(?:iPhone|iPad) OS"),
    ("Linux", r"Linux"),
]


def useragent(df: DataFrame, source: str, target_prefix: str = "ua_") -> DataFrame:
    """Rule-table UA parse -> `{prefix}name`, `{prefix}version`, `{prefix}os`.

    coalesce over ordered regexp_extracts — a pure Column expression chain
    evaluated in whole-stage codegen; rule order = precedence.
    """
    col = F.col(source)
    name = F.lit(None).cast("string")
    version = F.lit(None).cast("string")
    # build reversed so earlier rules take precedence in the when-chain
    for fam, fam_re, ver_re in reversed(UA_RULES):
        hit = col.rlike(fam_re)
        name = F.when(hit, F.lit(fam)).otherwise(name)
        version = F.when(hit, F.regexp_extract(col, ver_re, 1)).otherwise(version)
    os_name = F.lit("Other")
    for os_fam, os_re in reversed(UA_OS_RULES):
        os_name = F.when(col.rlike(os_re), F.lit(os_fam)).otherwise(os_name)
    return (df.withColumn(f"{target_prefix}name", F.coalesce(name, F.lit("Other")))
              .withColumn(f"{target_prefix}version", version)
              .withColumn(f"{target_prefix}os", os_name))


def dns_filter(df: DataFrame, source: str, records: DataFrame,
               action: str = "replace", target: str | None = None,
               reverse: bool = False,
               tag_on_failure: str = "_dnsfailure") -> DataFrame:
    """dns filter analog (plugin logstash-filter-dns, meta:113).

    Per-event DNS RPC is an anti-pattern at 100 TB (SURVEY §2.3); the
    Spark-native shape is a broadcast join against a resolver SNAPSHOT —
    `records` carries (name, address); the production feed is a zone
    export / recursive-resolver cache dump refreshed out-of-band, exactly
    how jdbc_static snapshots its database.

    ``reverse=False``: resolve hostnames -> addresses; ``reverse=True``:
    addresses -> names.  ``action="replace"`` overwrites `source` (plugin
    default), ``"append"`` writes to `target` keeping the original.
    Misses keep the original value and tag `_dnsfailure` (plugin's
    failed-lookup behavior).
    """
    from pyspark.sql.functions import broadcast

    from logstash_spark.functions.decorators import add_tag

    key, val = ("address", "name") if reverse else ("name", "address")
    dim = broadcast(records.select(F.col(key).alias("__dns_k"),
                                   F.col(val).alias("__dns_v")))
    out = df.join(dim, F.col(source) == F.col("__dns_k"), "left")
    hit = F.col("__dns_v").isNotNull()
    if action == "replace":
        out = out.withColumn(source, F.coalesce(F.col("__dns_v"),
                                                F.col(source)))
    elif action == "append":
        out = out.withColumn(target or f"{source}_resolved", F.col("__dns_v"))
    else:
        raise ValueError(f"dns: action must be replace|append, got {action!r}")
    out = add_tag(out, tag_on_failure, when=~hit)
    return out.drop("__dns_k", "__dns_v")
