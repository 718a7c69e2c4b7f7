#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify output
parquet against DuckDB running SparkEntry.oracleSql on the same tables.
Usage: python3 scripts/check.py [sfDir] [verifyOut]
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    # synthetic scale corpora materialize only documents/embeddings/events;
    # queries over absent tables are not part of those runs. Spark-written
    # tables are DIRECTORIES of part files - glob those.
    path = f"{SF}/{t}.parquet"
    if os.path.isdir(path):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}/*.parquet'")
    elif os.path.exists(path):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

n_pass = n_fail = 0
for name in sorted(oracle):
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        n_fail += 1
        continue
    try:
        got = canon(pd.read_parquet(files[0]))
        want = canon(con.execute(oracle[name]).fetchdf())
    except Exception as e:
        print(f"FAIL {name}: {e}")
        n_fail += 1
        continue
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        n_fail += 1
        continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
        n_fail += 1
        continue
    # dtype check (schema-level)
    dt_mismatch = [(c, str(got[c].dtype), str(want[c].dtype))
                   for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
    # value check
    try:
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        ok = True
        detail = ""
    except AssertionError as e:
        ok = False
        detail = str(e).split("\n")[0]
        # find first differing cell
        for c in got.columns:
            neq = got[c].astype(object) != want[c].astype(object)
            neq &= ~(got[c].isna() & want[c].isna())
            if neq.any():
                i = neq.idxmax()
                detail = f"col {c} row {i}: {got[c][i]!r} vs {want[c][i]!r}"
                break
    if ok and not dt_mismatch:
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    elif ok:
        print(f"WARN {name}: values match, dtypes differ {dt_mismatch}")
        n_pass += 1
    else:
        print(f"FAIL {name}: {detail}")
        n_fail += 1

print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
