#!/usr/bin/env python3
"""Local replay of the driver's correctness gate.

Runs each entry of target/verify_out/oracle_sql.json in DuckDB over views on
the sfDir parquet tables, loads the Spark result parquet from
target/verify_out/<name>/, and compares like the driver does: columns sorted
by name, rows sorted, values normalized (Decimal->float, date/ts->iso).

Usage: python3 scripts/replay_oracle.py [sfDir] [verifyOut]
"""
import sys, json, math, decimal, datetime, hashlib, glob

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        return v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def hsh(rows):
    h = hashlib.sha256()
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()[:16]


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            files = glob.glob(f"{OUT}/{name}/*.parquet")
            scur = con.execute(
                f"SELECT * FROM read_parquet({files!r})")
            scols = [d[0] for d in scur.description]
            srows = scur.fetchall()
            oc, orw = canon(ocols, orows)
            sc, srw = canon(scols, srows)
            rows_ok = len(orw) == len(srw)
            schema_ok = oc == sc
            hash_ok = hsh(orw) == hsh(srw)
            if rows_ok and schema_ok and hash_ok:
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name}: rows={rows_ok}({len(srw)}/{len(orw)}) "
                      f"schema={schema_ok} hash={hash_ok}")
                if not schema_ok:
                    print(f"  spark cols:  {sc}\n  oracle cols: {oc}")
                if schema_ok and not hash_ok:
                    for a, b in zip(srw[:50], orw[:50]):
                        if a != b:
                            print(f"  spark:  {a}\n  oracle: {b}")
                            break
        except Exception as e:
            n_fail += 1
            print(f"ERR  {name}: {e}")
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(oracle)} oracle entries")


if __name__ == "__main__":
    main()
