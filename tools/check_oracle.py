#!/usr/bin/env python3
"""Driver-style correctness gate: run target/verify_out/oracle_sql.json in
DuckDB over the sfDir parquet tables and compare each result to the Spark
dump at target/verify_out/<name>/ (sorted columns, sorted rows, value hash).

Usage: python3 tools/check_oracle.py [sfDir] [outDir]
"""
import sys, json, glob, math
from decimal import Decimal

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def rows_of(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(norm(r[i]) for i in order) for r in cur.fetchall()]
    return sorted(cols), sorted(data, key=lambda t: tuple(map(repr, t)))


con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
n_pass = n_fail = 0
fails = []
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not spark_files:
        fails.append((name, "no spark dump"))
        n_fail += 1
        continue
    try:
        ocols, orows = rows_of(con.execute(sql))
        scols, srows = rows_of(con.execute(
            f"SELECT * FROM read_parquet({spark_files!r})"))
        if scols != ocols:
            fails.append((name, f"schema {scols} != {ocols}"))
            n_fail += 1
        elif srows != orows:
            diff = next((i for i, (a, b) in enumerate(zip(srows, orows)) if a != b),
                        min(len(srows), len(orows)))
            fails.append((name, f"rows {len(srows)} vs {len(orows)}; first diff @{diff}: "
                          f"{srows[diff] if diff < len(srows) else '<none>'} vs "
                          f"{orows[diff] if diff < len(orows) else '<none>'}"))
            n_fail += 1
        else:
            n_pass += 1
    except Exception as e:
        fails.append((name, f"error: {e}"))
        n_fail += 1

print(f"PASS {n_pass}  FAIL {n_fail}")
for name, why in fails:
    print(f"  FAIL {name}: {why[:300]}")
sys.exit(1 if n_fail else 0)
