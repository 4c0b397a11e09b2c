#!/usr/bin/env python3
"""Driver-hasher mirror: dtype-sensitive compare of Spark parquet dumps
vs the DuckDB oracle via pandas (the driver compares through pandas
frames, so dtype divergence can fail a value-identical query).

Usage: python3 scripts/pandas_mirror.py <sfDir> <outDir> [query ...]
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


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
        spark_df = pd.read_parquet(f"{out_dir}/{name}")
        duck_df = con.sql(sql).df()
        cols = sorted(spark_df.columns)
        spark_df = spark_df[cols].sort_values(cols).reset_index(drop=True)
        duck_df = duck_df[cols].sort_values(cols).reset_index(drop=True)
        ok = True
        for c in cols:
            st, dt = str(spark_df[c].dtype), str(duck_df[c].dtype)
            if st != dt and {st, dt} != {"int32", "int64"}:
                print(f"DTYPE {name}.{c}: spark={st} duck={dt}")
                ok = False
        if ok and not spark_df.astype(str).equals(duck_df.astype(str)):
            print(f"VALUES {name}: frames differ")
            ok = False
        print(("PASS " if ok else "FAIL ") + name)
        n_pass += ok
        n_fail += not ok
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
