#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against DuckDB on the same parquet tables and diff per query.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import json, os, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name, sql in sorted(oracle.items()):
        got_path = os.path.join(out_dir, name)
        if not os.path.isdir(got_path):
            print(f"FAIL {name}: no spark output"); failures += 1; continue
        try:
            got = norm(pd.read_parquet(got_path))
            want = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); failures += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); failures += 1; continue
        # value compare with tolerance-free string render (like a hash would)
        mismatch = None
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    import numpy as np
                    if not np.allclose(a.fillna(-1e308).astype(float),
                                       b.fillna(-1e308).astype(float),
                                       rtol=0, atol=0):  # exact — driver hashes
                        mismatch = c; break
                else:
                    if not a.astype(str).equals(b.astype(str)):
                        mismatch = c; break
            except Exception as e:
                mismatch = f"{c} ({e})"; break
        if mismatch:
            print(f"FAIL {name}: column {mismatch} differs")
            bad = (got[mismatch] != want[mismatch]) if not isinstance(mismatch, str) or '(' not in str(mismatch) else None
            try:
                d = got[mismatch].astype(str) != want[mismatch].astype(str)
                print("  spark:", got[d][mismatch].head(3).tolist())
                print("  duck :", want[d][mismatch].head(3).tolist())
            except Exception:
                pass
            failures += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    # queries without oracle: row-count check only
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            n = len(pd.read_parquet(p))
            print(f"ROWS {name}: {n}")
    print(f"\n{failures} failures")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
