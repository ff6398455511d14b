#!/usr/bin/env python
"""Local mirror of the driver's correctness gate: run every
`__spark_entry__.queries()` entry AND its `oracle_sql()` twin at sf0.01,
compare row count + column set + canonicalized value multiset.

Values are canonicalized before hashing (timestamps -> naive-UTC
isoformat, numpy scalars -> python, NaN/NaT -> None, floats rounded to
9 places) so Spark `Row` and DuckDB `fetchdf` representations of the
same value compare equal — the driver's comparator does the same
column-name-sorted value compare.

Usage: python tools/gate_mirror.py [sf_dir] [key ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    try:
        import pandas as pd
        if v is pd.NaT:
            return None
    except Exception:  # noqa: BLE001
        pass
    if isinstance(v, float) and math.isnan(v):
        return None
    try:
        import numpy as np
        if isinstance(v, np.generic):
            return norm(v.item())
        if isinstance(v, np.ndarray):
            return tuple(norm(x) for x in v)
    except Exception:  # noqa: BLE001
        pass
    if hasattr(v, "to_pydatetime"):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from logstash_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("gate-mirror", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    qs, osql = entry.queries(), entry.oracle_sql()
    failures = []
    for key, q in qs.items():
        if only and key not in only:
            continue
        try:
            sdf = q(spark, sf)
            cols = sorted(sdf.columns)
            srows = sorted((tuple(norm(r[c]) for c in cols)
                            for r in (x.asDict() for x in sdf.collect())),
                           key=repr)
            od = con.execute(osql[key]).fetchdf()
            ocols = sorted(od.columns)
            orows = sorted((tuple(norm(r[c]) for c in ocols)
                            for r in od.to_dict("records")), key=repr)
            ok = cols == ocols and len(srows) == len(orows) and srows == orows
            status = "ok" if ok else "FAIL"
            print(f"{status} {key}: spark={len(srows)} oracle={len(orows)} "
                  f"cols={'=' if cols == ocols else cols}")
            if not ok:
                failures.append(key)
                for a, b in zip(srows, orows):
                    if a != b:
                        print(f"  first diff:\n   spark {a}\n   duck  {b}")
                        break
        except Exception as ex:  # noqa: BLE001
            failures.append(key)
            print(f"ERR {key}: {ex}")
    n = len(only) if only else len(qs)
    print(f"\n{n - len(failures)}/{n} matched"
          + (f"; FAILURES: {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
