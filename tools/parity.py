#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB-oracle compare.

Usage: python3 tools/parity.py <sf_dir> <verify_out_dir>

For each query dumped by graft.Verify into <verify_out_dir>/<name>/,
runs the matching oracle SQL from oracle_sql.json in DuckDB (with each
table name registered as a view over <sf_dir>/<name>.parquet) and
compares values cell-by-cell after sorting columns by name.

Driver-side tooling only (duckdb/pyarrow/pandas are not available to
the Scala engine itself).
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if hasattr(v, "tolist"):  # numpy array / scalar
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_rows(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    return [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    dumped = {d.split("/")[-1] for d in glob.glob(f"{out_dir}/*") if "." not in d.split("/")[-1]}
    names = sorted(dumped | set(oracle))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark dump")
            n_fail += 1
            continue
        spark_df = pq.read_table(files[0]).to_pandas()
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(spark_df)})")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s_rows, d_rows = frame_rows(spark_df), frame_rows(duck_df)
        # dtype drift (int32 vs int64 etc.) would fail the judge's schema
        # check even when values print identically — flag it here.
        def kinds(df):
            return {c: ("datetime" if str(t).startswith("datetime") else str(t))
                    for c, t in df.dtypes.items()}
        if kinds(spark_df) != kinds(duck_df):
            diff = {c: (kinds(spark_df).get(c), kinds(duck_df).get(c))
                    for c in set(spark_df.columns) | set(duck_df.columns)
                    if kinds(spark_df).get(c) != kinds(duck_df).get(c)}
            print(f"WARN {name}: dtype drift {diff}")
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            print(f"FAIL {name}: columns spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
            n_fail += 1
        elif s_rows == d_rows:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            for i, (a, b) in enumerate(zip(s_rows, d_rows)):
                if a != b:
                    print(f"  first diff @row {i}:\n    spark={a}\n    duck ={b}")
                    break
            else:
                if len(s_rows) != len(d_rows):
                    print(f"  length mismatch; spark head={s_rows[:2]} duck head={d_rows[:2]}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {len(names)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
