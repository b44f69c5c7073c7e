#!/usr/bin/env python3
"""Local replay of the driver's correctness gate: run each oracle_sql.json
entry in DuckDB over the sfDir parquet tables, compare to the Spark dump in
outDir/<name>/*.parquet (sorted cols, sorted rows, Decimal->float, date->iso).
Usage: python3 tools/replay_oracle.py [sfDir] [outDir]
"""
import duckdb, json, glob, sys, math
from decimal import Decimal
import datetime as dt

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"

con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

def norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, float):
        return round(v, 9) if not math.isnan(v) else "NaN"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def fetch_sorted(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [cols[i] for i in order], out

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes, skipped = [], [], []
for name in sorted(oracle):
    sql = oracle[name]
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark dump"))
        continue
    try:
        o = con.execute(sql)
        ocols = [d[0] for d in o.description]
        orows = o.fetchall()
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    s = con.execute(f"SELECT * FROM read_parquet({files!r})")
    scols = [d[0] for d in s.description]
    srows = s.fetchall()
    oc, orws = fetch_sorted(ocols, orows)
    sc, srws = fetch_sorted(scols, srows)
    if oc != sc:
        fails.append((name, f"schema: spark={sc} oracle={oc}"))
    elif len(orws) != len(srws):
        fails.append((name, f"rows: spark={len(srws)} oracle={len(orws)}"))
    elif orws != srws:
        diff = next((i, srws[i], orws[i]) for i in range(len(orws)) if srws[i] != orws[i])
        fails.append((name, f"values differ at sorted row {diff[0]}: spark={diff[1]} oracle={diff[2]}"))
    else:
        passes.append(name)

print(f"PASS {len(passes)}  FAIL {len(fails)}")
for name, why in fails:
    print(f"  FAIL {name}: {why[:300]}")
