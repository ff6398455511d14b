"""mutate filter: the general field-manipulation toolbox.

Reference: logstash-filter-mutate (default distribution,
rakelib/plugins-metadata.json:185, tier-1 ci/test_plugins.rb:188; docs
docs/reference/core-operations.md:58-79).  Sub-operations are applied in the
reference's fixed order: coerce, rename, update, replace, convert, gsub,
uppercase, capitalize, lowercase, strip, split, join, merge, copy.

Every sub-op is a pure Column expression (cast / regexp_replace / lower /
upper / initcap / trim / split / array_join / coalesce) — JVM codegen, no
shuffle, safe at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CONVERT = {
    "integer": "long",
    "integer_eu": "long",
    "float": "double",
    "float_eu": "double",
    "string": "string",
    "boolean": "boolean",
}


def mutate(
    df: DataFrame,
    coerce: dict[str, str] | None = None,
    rename: dict[str, str] | None = None,
    update: dict[str, object] | None = None,
    replace: dict[str, object] | None = None,
    convert: dict[str, str] | None = None,
    gsub: list[tuple[str, str, str]] | None = None,
    uppercase: list[str] | None = None,
    capitalize: list[str] | None = None,
    lowercase: list[str] | None = None,
    strip: list[str] | None = None,
    split: dict[str, str] | None = None,
    join: dict[str, str] | None = None,
    merge: dict[str, str] | None = None,
    copy: dict[str, str] | None = None,
) -> DataFrame:
    def _require(f: str, op: str):
        if f not in df.columns:
            raise ValueError(
                f"mutate.{op}: column '{f}' does not exist at this point in the "
                f"sub-op order (coerce,rename,update,replace,convert,gsub,uppercase,"
                f"capitalize,lowercase,strip,split,join,merge,copy — copy runs LAST; "
                f"use a second mutate to transform a copied field)")

    # coerce: set only when currently null (docs: sets default for nil field)
    for f, v in (coerce or {}).items():
        if f in df.columns:
            df = df.withColumn(f, F.coalesce(F.col(f), F.lit(v)))
        else:
            df = df.withColumn(f, F.lit(v))
    for old, new in (rename or {}).items():
        df = df.withColumnRenamed(old, new)
    # update: only if field exists (core-operations.md); with a relational
    # schema "exists" means non-null
    for f, v in (update or {}).items():
        if f in df.columns:
            val = v if isinstance(v, F.Column) else F.lit(v)
            df = df.withColumn(f, F.when(F.col(f).isNotNull(), val).otherwise(F.col(f)))
    for f, v in (replace or {}).items():
        df = df.withColumn(f, v if isinstance(v, F.Column) else F.lit(v))
    for f, t in (convert or {}).items():
        target = _CONVERT[t]
        col = F.col(f)
        if target == "boolean":
            # reference accepts "true"/"t"/"yes"/"y"/"1" => true etc.
            s = F.lower(col.cast("string"))
            df = df.withColumn(
                f,
                F.when(s.isin("true", "t", "yes", "y", "1"), F.lit(True))
                .when(s.isin("false", "f", "no", "n", "0"), F.lit(False))
                .otherwise(F.lit(None).cast("boolean")),
            )
        else:
            df = df.withColumn(f, col.cast(target))
    for f, pat, repl in gsub or []:
        _require(f, "gsub")
        df = df.withColumn(f, F.regexp_replace(F.col(f), pat, repl))
    for f in uppercase or []:
        _require(f, "uppercase")
        df = df.withColumn(f, F.upper(F.col(f)))
    for f in capitalize or []:
        _require(f, "capitalize")
        df = df.withColumn(f, F.initcap(F.col(f)))
    for f in lowercase or []:
        _require(f, "lowercase")
        df = df.withColumn(f, F.lower(F.col(f)))
    for f in strip or []:
        _require(f, "strip")
        df = df.withColumn(f, F.trim(F.col(f)))
    for f, sep in (split or {}).items():
        df = df.withColumn(f, F.split(F.col(f), sep))
    for f, sep in (join or {}).items():
        df = df.withColumn(f, F.array_join(F.col(f), sep))
    for dst, src in (merge or {}).items():
        # merge two array (or string->array) fields
        d, s = F.col(dst), F.col(src)
        df = df.withColumn(dst, F.concat(d, s))
    for src, dst in (copy or {}).items():
        _require(src, "copy")
        df = df.withColumn(dst, F.col(src))
    return df
