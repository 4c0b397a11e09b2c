#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs DuckDB on outDir/oracle_sql.json (tables = sfDir parquet views),
loads each outDir/<name>/ parquet written by graft.Verify, sorts columns
by name + rows by all columns, and compares values exactly.

Usage: python3 scripts/check.py <sfDir> <outDir> [query ...]
"""
import json, math, sys
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as pds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            res = con.sql(sql)
            ocols, orows = res.columns, res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            tab = pds.dataset(f"{out_dir}/{name}").to_table()
            scols = tab.column_names
            srows = [tuple(r[c] for c in scols) for r in tab.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        oc, orw = canon(ocols, orows)
        sc, srw = canon(scols, srows)
        if oc != sc:
            print(f"FAIL {name}: columns differ spark={sc} oracle={oc}")
            n_fail += 1
            continue
        if len(orw) != len(srw):
            print(f"FAIL {name}: rows spark={len(srw)} oracle={len(orw)}")
            n_fail += 1
            continue
        bad = [i for i, (a, b) in enumerate(zip(srw, orw)) if a != b]
        if bad:
            i = bad[0]
            print(f"FAIL {name}: {len(bad)} rows differ; first at {i}:")
            print(f"  spark : {srw[i]}")
            print(f"  oracle: {orw[i]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srw)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

main()
