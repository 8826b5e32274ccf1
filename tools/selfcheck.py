#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]

For each query result parquet written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name (the driver's normalization),
and compares row-by-row. Exact compare — stricter than any hash.

Each query additionally passes a RENDERED-VALUE parity check over the
pandas conversion path: a result can be value-identical under the raw
fetchall compare yet FORMAT differently once dtypes diverge — the
round-5 pack_sequences red row was exactly this (an un-cast DuckDB
window SUM widened to HUGEINT, whose pandas rendering is float, so
"32" hashed against "32.0" while every exact compare stayed green).
Any hash a driver computes over column-name-sorted, stringified frames
agrees when both engines' pandas renderings agree; a PANDAS-DRIFT
failure here means a type-normalization bug that MUST be fixed in the
oracle (usually a missing CAST ... AS BIGINT), even though the values
are right.
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
            # driver-hash recipe proxy: the pandas-rendered frames must
            # ALSO agree cell-for-cell — dtype-driven formatting drift
            # (HUGEINT→float64, int-vs-float NULL columns) hashes
            # differently in a pandas-path driver even when every raw
            # value matches.
            sdf = con.sql(f"SELECT {', '.join(scols)} FROM spark").df()
            odf = con.sql(f"SELECT {', '.join(ocols)} FROM oracle").df()
            pdrift = [
                (c, str(sdf[c].dtype), str(odf[c].dtype))
                for c in scols
                if list(map(str, sdf[c])) != list(map(str, odf[c]))
            ]
            if pdrift:
                n_fail += 1
                print(f"FAIL {name}: PANDAS-DRIFT in {pdrift} — values match "
                      "but render differently (a pandas-path driver hash would "
                      "mismatch); fix the oracle's types (CAST ... AS BIGINT "
                      "on sums/windows)")
            else:
                n_pass += 1
                print(f"PASS {name} ({len(srows)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
