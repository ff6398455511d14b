"""Local mirror of the driver's correctness gate: run each catalog query in
Spark AND its oracle in DuckDB at a given sf_dir; compare row count, column
names, and an order-insensitive value hash.

Usage: python tools/compare.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    """Normalize a cell for hashing.

    Deliberately STRICTER than round-1: floats are tagged ('f' prefix) so an
    int-vs-float dtype divergence (e.g. DuckDB HUGEINT -> pandas float64)
    mismatches, and tz-aware datetimes keep their offset so TIMESTAMPTZ vs
    naive TIMESTAMP mismatches — both were invisible to the old norm but
    visible to the driver's gate (CORRECTNESS_r01: 5 hash/schema fails, all
    uncast SUM->HUGEINT or to_timestamp->TIMESTAMPTZ in oracles)."""
    import datetime
    import math

    if v is None:
        return "\\N"
    if isinstance(v, bool) or type(v).__name__ == "bool_":
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "\\N"
        return "f" + f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        if v != v:  # NaT
            return "\\N"
        return v.isoformat(timespec="microseconds")
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x01".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def compare(sf_dir: str, names: list[str] | None = None, spark=None):
    from logstash_spark.catalog import CATALOG
    try:
        from logstash_spark.datahub.catalog import DATAHUB_CATALOG
    except ImportError:
        DATAHUB_CATALOG = {}
    full = {**DATAHUB_CATALOG, **CATALOG}  # same order as __spark_entry__

    if spark is None:
        from logstash_spark.session import get_spark
        spark = get_spark(app_name="compare", master="local[8]")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    results = {}
    for name, (fn, oracle) in full.items():
        if names and name not in names:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spd = sdf.toPandas()          # pandas on BOTH sides, like the driver
            scols = list(spd.columns)
            srows = list(spd.itertuples(index=False, name=None))
        except Exception as e:  # noqa: BLE001
            results[name] = {"ok": False, "stage": "spark", "err": str(e)[:400]}
            continue
        if oracle is None:
            results[name] = {"ok": len(srows) >= 0, "stage": "rows-only",
                             "spark_rows": len(srows)}
            continue
        try:
            opd = con.execute(oracle).df()
            ocols = list(opd.columns)
            orows = list(opd.itertuples(index=False, name=None))
        except Exception as e:  # noqa: BLE001
            results[name] = {"ok": False, "stage": "duckdb", "err": str(e)[:400]}
            continue
        res = {
            "spark_rows": len(srows), "oracle_rows": len(orows),
            "cols_match": sorted(scols) == sorted(ocols),
            "rows_match": len(srows) == len(orows),
        }
        res["hash_match"] = (
            res["cols_match"] and res["rows_match"]
            and value_hash(srows, scols) == value_hash(orows, ocols)
        )
        res["ok"] = res["hash_match"]
        if not res["cols_match"]:
            res["spark_cols"], res["oracle_cols"] = scols, ocols
        results[name] = res
    return results


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or None
    out = compare(sf_dir, names)
    bad = 0
    for name, r in sorted(out.items()):
        status = "OK " if r.get("ok") else "FAIL"
        if not r.get("ok"):
            bad += 1
        print(f"{status} {name}: {r}")
    print(f"\n{len(out) - bad}/{len(out)} matched")
    sys.exit(1 if bad else 0)
