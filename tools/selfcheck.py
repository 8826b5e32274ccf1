#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]

For each query result parquet written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name (the driver's normalization),
and compares row-by-row. Exact compare — stricter than any hash.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = sorted(spark.columns)
            srows = [tuple(norm(v) for v in r) for r in
                     con.sql(f"SELECT {', '.join(scols)} FROM spark").fetchall()]
            oracle = con.sql(sql)
            ocols = sorted(oracle.columns)
            orows = [tuple(norm(v) for v in r) for r in
                     con.sql(f"SELECT {', '.join(ocols)} FROM oracle").fetchall()]
        except Exception as e:
            print(f"FAIL {name}: exception {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
        elif srows != orows:
            n_fail += 1
            diffs = [i for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}, "
                  f"first diffs {diffs[:3]}")
            for i in diffs[:3]:
                print(f"   row {i} cols {ocols}\n   spark : {srows[i]}\n   oracle: {orows[i]}")
            if len(srows) != len(orows):
                for r in (srows[len(orows):len(orows)+2] or orows[len(srows):len(srows)+2]):
                    print(f"   extra: {r}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(srows)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
