#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB against the sf_dir
parquet tables, and compares: column names (sorted), row counts, and exact
values after sorting columns by name and rows by all columns.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True, na_position="first")
    return df


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        g, x = canon(got), canon(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(x.columns)}")
            n_fail += 1
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows {len(g)} vs {len(x)}")
            n_fail += 1
            continue
        dtype_mix = [c for c in g.columns
                     if (pd.api.types.is_integer_dtype(g[c]) != pd.api.types.is_integer_dtype(x[c]))
                     and (pd.api.types.is_numeric_dtype(g[c]) and pd.api.types.is_numeric_dtype(x[c]))]
        if dtype_mix:
            print(f"FAIL {name}: int/float dtype mismatch (driver hash would differ): "
                  + ", ".join(f"{c} got={g[c].dtype} exp={x[c].dtype}" for c in dtype_mix))
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, x, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: values differ\n{str(e)[:500]}")
            # show a small diff sample
            for c in g.columns:
                neq = (g[c].astype(str) != x[c].astype(str))
                if neq.any():
                    i = neq.idxmax()
                    print(f"  first diff col={c} row={i}: got={g[c][i]!r} exp={x[c][i]!r}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
