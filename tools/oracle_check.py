"""Local stand-in for the driver's DuckDB correctness gate.

Runs every ``__spark_entry__.queries()`` entry at the given sf dir, runs
the matching ``oracle_sql()`` in DuckDB over the same parquet files, and
compares row count + column names + order-insensitive canonicalized
values. Usage:  python tools/oracle_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from indra_db_spark.session import get_spark

    spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        except Exception as e:  # missing table: fail only queries that use it
            print(f"note: view {t} unavailable ({e})", file=sys.stderr)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_secs = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only check) [{spark_secs:.1f}s]")
            if len(srows) == 0:
                print(f"      WARNING {name}: zero rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok_schema = sorted(c.lower() for c in scols) == sorted(dcols)
        a = canon_rows([c.lower() for c in scols], srows)
        b = canon_rows(dcols, drows)
        if not ok_schema:
            print(f"FAIL  {name}: schema {sorted(scols)} vs {sorted(dcols)}")
            failures.append(name)
        elif len(a) != len(b):
            print(f"FAIL  {name}: rowcount {len(a)} vs {len(b)}")
            failures.append(name)
        elif a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL  {name}: value mismatch, e.g. {diff}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(a)} rows [{spark_secs:.1f}s]")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
