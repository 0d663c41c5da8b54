"""Local mimic of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 and compares to
oracle_sql() via DuckDB: row count, sorted-column-name schema, and an
order-insensitive value hash (columns sorted by name, rows sorted,
values stringified with float rounding).

Usage: python tools/check_oracles.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda x: str(x))
        elif "float" in str(df[c].dtype):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    s = df.to_csv(index=False, float_format="%.6f")
    return hashlib.md5(s.encode()).hexdigest()


def main() -> int:
    import __spark_entry__ as E
    from lgid_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("oracle_check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only, {len(sdf)} rows ({time.time()-t0:.1f}s)")
            if len(sdf) == 0:
                print(f"     WARNING: {name} returned 0 rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {ex}")
            continue
        a, b = canon(sdf), canon(odf)
        status = []
        if len(a) != len(b):
            status.append(f"rowcount {len(a)} vs {len(b)}")
        if list(a.columns) != list(b.columns):
            status.append(f"schema {list(a.columns)} vs {list(b.columns)}")
        elif value_hash(a) != value_hash(b):
            status.append("value hash mismatch")
            merged = a.compare(b) if len(a) == len(b) else None
            if merged is not None and not merged.empty:
                print(merged.head(5))
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"PASS {name}: {len(a)} rows ({time.time()-t0:.1f}s)")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all queries match their oracles")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
