"""Local mirror of the driver's correctness gate: run every registered
query on Spark AND its DuckDB oracle on the same parquet, compare
row-count + sorted-column schema + exact values.

Usage: python tools/oracle_check.py [--gate] [sf_dir] [name ...]

--gate scopes to the head-50 of queries() — exactly the rows the driver's
real CORRECTNESS gate records (see gravitydb_spark/gate_queries.py).
Combined with explicit names, the run is the INTERSECTION (the named
queries that sit in the head-50), so '--gate name' never silently widens
the scope.
"""

from __future__ import annotations

import math
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(round(v, 9))
            elif v is None:
                v = "NULL"
            else:
                v = str(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out)


def main():
    args = sys.argv[1:]
    gate_only = "--gate" in args
    args = [a for a in args if a != "--gate"]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    from gravitydb_spark.registry import oracle_sql, queries
    from gravitydb_spark.session import get_spark

    spark = get_spark(app_name="oracle_check")
    con = duck_con(sf_dir)
    qs, os_ = queries(), oracle_sql()
    if gate_only:
        head50 = set(list(qs)[:50])
        only = only & head50 if only else head50
        if not only:
            print("--gate with names: none of the given names are in the head-50")
            return 1

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"✗ {name}: spark error {str(e)[:300]}")
            continue
        spark_s = time.monotonic() - t0
        sql = os_.get(name)
        if sql is None:
            print(f"~ {name}: rows-only ({len(s_rows)} rows) [{spark_s:.1f}s]")
            continue
        try:
            ddf = con.sql(sql)
            d_cols = ddf.columns
            d_rows = ddf.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"✗ {name}: duckdb error {str(e)[:300]}")
            continue
        if sorted(s_cols) != sorted(d_cols):
            failures.append((name, f"schema {sorted(s_cols)} != {sorted(d_cols)}"))
            print(f"✗ {name}: schema mismatch {sorted(s_cols)} vs {sorted(d_cols)}")
            continue
        a, b = normalize(s_rows, s_cols), normalize(d_rows, d_cols)
        if len(a) != len(b):
            failures.append((name, f"rowcount {len(a)} != {len(b)}"))
            print(f"✗ {name}: rowcount {len(a)} vs {len(b)}")
            continue
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"✗ {name}: value mismatch, e.g. {diff}")
            continue
        print(f"✓ {name} ({len(a)} rows) [{spark_s:.1f}s]")

    print(f"\n{len(failures)} failures / {len(qs)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
