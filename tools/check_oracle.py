#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle_sql.json
entry in DuckDB against the sf parquet tables and compare with the Spark
parquet output (row count, column names/types, and value hash with columns
sorted by name). Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            expect = con.execute(sql).df()
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(expect.columns) != sorted(got.columns):
            problems.append(f"columns {sorted(got.columns)} != "
                            f"{sorted(expect.columns)}")
        elif len(expect) != len(got):
            problems.append(f"rows {len(got)} != {len(expect)}")
        else:
            e_c, g_c = canon(expect), canon(got)
            for c in e_c.columns:
                if str(e_c[c].dtype) != str(g_c[c].dtype):
                    problems.append(
                        f"dtype[{c}] {g_c[c].dtype} != {e_c[c].dtype}")
            if not problems:
                eq = e_c.equals(g_c)
                if not eq:
                    diff = (e_c != g_c) & ~(e_c.isna() & g_c.isna())
                    bad = diff.any(axis=1)
                    problems.append(
                        f"{int(bad.sum())} differing rows, first:\n"
                        f"  expect {e_c[bad].head(3).to_dict('records')}\n"
                        f"  got    {g_c[bad].head(3).to_dict('records')}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(oracle)} oracled of {len(oracle)} listed")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
