"""date filter: multi-format timestamp parsing into @timestamp/target.

Reference: logstash-filter-date (default distribution,
rakelib/plugins-metadata.json:100; docs docs/reference/
core-operations.md:13-24; apache usage tools/benchmark-cli/.../cases/
apache.cfg:12-15).  Semantics:

* ordered list of formats tried in sequence; first parse wins;
* special formats ``ISO8601``, ``UNIX`` (epoch seconds, may be fractional),
  ``UNIX_MS`` (epoch millis), ``TAI64N``;
* on total failure: tag ``_dateparsefailure``, event unchanged.

Spark design: ``coalesce(try_to_timestamp(col, f1), try_to_timestamp(col,
f2), ...)`` — one JVM expression chain; Joda-style pattern tokens are
translated to java.time (DateTimeFormatter) tokens where they differ.
Failure tag = result-is-null branch.  No UDF, no shuffle.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logstash_spark.functions.decorators import add_tag

# Joda -> java.time differences that matter for the common formats
_JODA_TO_JAVA = [
    ("ZZ", "XXX"),   # ISO8601 offset with colon
    ("Z", "xx"),     # offset without colon (Joda Z prints +0000)
]


def joda_to_java(fmt: str) -> str:
    # Joda 'Y' is year-of-era (apache.cfg uses dd/MMM/YYYY:...); java.time
    # 'Y' is week-based-year, which Spark's parser rejects — map to 'y'.
    fmt = re.sub(r"Y+", lambda m: "y" * len(m.group(0)), fmt)
    # 'Z' inside quoted literals is untouched; our formats don't quote Z.
    for jd, jv in _JODA_TO_JAVA:
        fmt = fmt.replace(jd, jv)
    return fmt


def _parse_one(col: Column, fmt: str) -> Column:
    if fmt == "ISO8601":
        # Spark's default string->timestamp cast accepts ISO8601 shapes
        return F.try_to_timestamp(col)
    if fmt == "UNIX":
        d = F.when(col.rlike(r"^\d+(\.\d+)?$"), col).try_cast("double")
        return F.when(d.isNotNull(), F.timestamp_micros((d * 1_000_000).try_cast("long")))
    if fmt == "UNIX_MS":
        l = F.when(col.rlike(r"^\d+$"), col).try_cast("long")
        return F.when(l.isNotNull(), F.timestamp_millis(l))
    if fmt == "TAI64N":
        # @4000000037c219bf2ef02e94 -> strip @, first 16 hex = secs since
        # 2^62 offset epoch, next 8 hex = nanos
        hexs = F.regexp_replace(col, "^@", "")
        secs = F.conv(F.substring(hexs, 1, 16), 16, 10).cast("decimal(38,0)") - F.lit(2**62)
        nanos = F.conv(F.substring(hexs, 17, 8), 16, 10).cast("long")
        micros = secs.cast("long") * 1_000_000 + (nanos / 1000).cast("long")
        ok = col.rlike("^@?[0-9a-fA-F]{24}$")
        return F.when(ok, F.timestamp_micros(micros))
    return F.try_to_timestamp(col, F.lit(joda_to_java(fmt)))


# Joda's only zone/offset tokens are Z (offset) and z (zone name); X/x/O/V
# are java.time-only (Joda 'x' is WEEKYEAR — treating it as a zone marker
# silently dropped the timezone option for patterns like "xxxx-'W'ww-e").
_ZONE_TOKENS = re.compile(r"[Zz]")


def _has_zone(fmt: str) -> bool:
    """True when the pattern (or special format) carries its own offset."""
    if fmt in ("UNIX", "UNIX_MS", "TAI64N"):
        return True  # epoch formats are zone-complete (ISO8601 is per-row: see date())
    return bool(_ZONE_TOKENS.search(re.sub(r"'[^']*'", "", fmt)))


def date(
    df: DataFrame,
    source: str,
    formats: list[str],
    target: str = "@timestamp",
    tag_on_failure: str = "_dateparsefailure",
    timezone: str | None = None,
) -> DataFrame:
    """Try each format in order; write first success to `target`.

    ``timezone`` mirrors the plugin's option: the zone ASSUMED for patterns
    that carry no offset of their own (plugin docs: "used when the parsed
    format doesn't include a timezone").  A zone-less pattern parses as a
    session-local (UTC here) wall time; `to_utc_timestamp` reinterprets
    that wall time in `timezone` and converts to UTC.  Patterns with
    offset tokens (X/x/Z/z/O/V) and the epoch/ISO specials are untouched.
    A ``%{field}`` template resolves the zone per event (sprintf form).
    """
    src = F.col(source)
    # an ISO8601 string may or may not carry an offset; detect per row —
    # the offset must FOLLOW a time component ("2024-06-01" ends in "-01"
    # which is a day, not an offset)
    _iso_has_offset = src.rlike(
        r"\d{2}:\d{2}(:\d{2}(\.\d+)?)?\s*([+-]\d{2}(:?\d{2})?|Z)$")

    def one(fmt: str) -> Column:
        p = _parse_one(src, fmt)
        if timezone is None or (fmt != "ISO8601" and _has_zone(fmt)):
            return p
        m = re.fullmatch(r"%\{(.+)\}", timezone)
        tz = F.col(m.group(1)) if m else F.lit(timezone)
        if fmt == "ISO8601":
            # reinterpret only offset-LESS ISO strings (plugin semantics:
            # timezone applies when the parsed text includes no zone)
            return F.when(_iso_has_offset, p) \
                    .otherwise(F.to_utc_timestamp(p, tz))
        return F.to_utc_timestamp(p, tz)

    parsed = F.coalesce(*[one(f) for f in formats])
    df = df.withColumn(target, parsed)
    return add_tag(df, tag_on_failure, when=parsed.isNull())
