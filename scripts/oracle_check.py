#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against DuckDB oracles and diff. Usage:
    python3 scripts/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    # Mirror the driver's harness: sort columns by name, then ROWS by all
    # columns. The row sort is what dies on ndarray cells (unhashable
    # numpy.ndarray) -- the q137 failure class -- so keeping it here makes
    # driver-incomparable output fail LOCALLY, not one round later.
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        pdir = f"{out_dir}/{name}"
        if not os.path.isdir(pdir):
            print(f"FAIL {name}: no spark output dir"); failures += 1
            continue
        files = sorted(glob.glob(f"{pdir}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet part files"); failures += 1
            continue
        spark_df = norm(pd.concat([pd.read_parquet(f) for f in files]))
        try:
            duck_df = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); failures += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            failures += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            failures += 1
            continue
        # dtype report (informational) + strict value compare
        dt_mismatch = [(c, str(spark_df[c].dtype), str(duck_df[c].dtype))
                       for c in spark_df.columns
                       if str(spark_df[c].dtype) != str(duck_df[c].dtype)]
        try:
            pd.testing.assert_frame_equal(spark_df, duck_df,
                                          check_dtype=False, check_exact=True)
            tag = f"ok ({len(spark_df)} rows)"
            if dt_mismatch:
                tag += f" [dtypes differ: {dt_mismatch}]"
            print(f"PASS {name}: {tag}")
        except AssertionError as e:
            failures += 1
            msg = str(e).split("\n")
            print(f"FAIL {name}: values differ: " + " | ".join(msg[:6]))
            # show first differing rows
            neq = (spark_df.astype(str) != duck_df.astype(str)).any(axis=1)
            bad = neq[neq].index[:3]
            for i in bad:
                print(f"   spark[{i}]: {spark_df.loc[i].to_dict()}")
                print(f"   duck [{i}]: {duck_df.loc[i].to_dict()}")
    print(f"== {len(oracle) - failures}/{len(oracle)} oracle queries pass ==")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
