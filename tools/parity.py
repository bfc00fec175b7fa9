#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tool, not shipped).

Usage: parity.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
SQL from oracle_sql.json in DuckDB against views named after the fixture
tables, sorts columns by name, and compares values exactly (row order as
produced). Reports per-query PASS/FAIL with a diff sample.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for value comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import glob
    names = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*") if not d.endswith(".json"))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        got = norm(pd.read_parquet(files[0]))
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got)} rows)")
            continue
        try:
            want = norm(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}");  n_fail += 1;  continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=True)
            print(f"PASS {name} ({len(got)} rows)");  n_pass += 1
        except AssertionError as e:
            n_fail += 1
            msg = str(e).split("\n")
            print(f"FAIL {name}: {' | '.join(msg[:3])}")
            if list(got.columns) != list(want.columns):
                print(f"  spark cols: {list(got.columns)}\n  duck  cols: {list(want.columns)}")
            else:
                print(f"  spark dtypes: {dict(got.dtypes.astype(str))}")
                print(f"  duck  dtypes: {dict(want.dtypes.astype(str))}")
                both = got.compare(want) if got.shape == want.shape else None
                if both is not None and not both.empty:
                    print(both.head(5))
                else:
                    print(f"  shapes: spark={got.shape} duck={want.shape}")
                    print("  spark head:\n", got.head(3))
                    print("  duck head:\n", want.head(3))
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
