#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/localverify.py <verifyOutDir> <sfDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB against views over the sfDir parquet tables, and
compares against the Spark parquet output in <verifyOutDir>/<name>/.
Mirrors the driver: columns sorted by name, then row/schema/value compare.

Dev-only tooling (not part of the library; driver-side python is allowed
for local validation only).
"""
import json
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            oracle_rel = con.sql(sql)
            ocols = list(oracle_rel.columns)
            order = sorted(range(len(ocols)), key=lambda i: ocols[i])
            otypes = [str(oracle_rel.types[i]) for i in order]
            orows = [tuple(r[i] for i in order) for r in oracle_rel.fetchall()]

            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = list(spark_rel.columns)
            sorder = sorted(range(len(scols)), key=lambda i: scols[i])
            stypes = [str(spark_rel.types[i]) for i in sorder]
            srows = [tuple(r[i] for i in sorder) for r in spark_rel.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue

        o_names = sorted(ocols)
        s_names = sorted(scols)
        problems = []
        if o_names != s_names:
            problems.append(f"columns differ: oracle={o_names} spark={s_names}")
        elif len(orows) != len(srows):
            problems.append(f"row count: oracle={len(orows)} spark={len(srows)}")
        else:
            if otypes != stypes:
                problems.append(f"dtypes differ: oracle={otypes} spark={stypes}")
            bad = 0
            for i, (orow, srow) in enumerate(zip(orows, srows)):
                if orow != srow:
                    bad += 1
                    if bad <= 3:
                        problems.append(f"row {i}: oracle={orow} spark={srow}")
            if bad:
                problems.append(f"{bad}/{len(orows)} rows differ")
        if problems:
            n_fail += 1
            print(f"FAIL {name}")
            for p in problems:
                print(f"  {p}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(orows)} rows, cols={o_names})")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
