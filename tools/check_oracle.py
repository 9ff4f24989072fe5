#!/usr/bin/env python3
"""Local pre-check that mimics the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sf_dir> <verify_out_dir>

Reads each query's parquet dump (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same fixture
parquet, and diffs values with columns sorted by name. Development tool
only — NOT part of the Spark library (the library is pure Scala).
"""
import sys, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    import os
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver fixtures are single files; ScaleUp corpora are Spark
        # directory writes — glob the parts in that case
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            failures.append((name, "no spark output"))
            print(f"FAIL {name}: no spark output")
            continue
        # pinned literal-VALUES oracles (PinnedOracles.scala) are captured
        # at sf0.01, the driver's correctness scale — skip at other SFs
        if "FROM (VALUES" in oracle[name] and "sf0.01" not in sf_dir.rstrip("/"):
            print(f"PIN-SKIP {name} (pinned at sf0.01; checking {sf_dir})")
            continue
        try:
            got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetch_df()
            want = con.execute(oracle[name]).fetch_df()
        except Exception as e:
            failures.append((name, str(e)))
            print(f"FAIL {name}: {e}")
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            failures.append((name, f"columns {list(g.columns)} != {list(w.columns)}"))
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append((name, f"rows {len(g)} != {len(w)}"))
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            continue
        # value compare, stringified (approximates the driver's hash)
        gs, ws = g.astype(str), w.astype(str)
        neq = (gs != ws).any(axis=1)
        if neq.any():
            i = neq.idxmax()
            failures.append((name, "value mismatch"))
            print(f"FAIL {name}: first mismatch row {i}\n  spark: {g.loc[i].to_dict()}\n  duck : {w.loc[i].to_dict()}")
        else:
            print(f"OK   {name} ({len(g)} rows)")
    # queries with no oracle: rows-only smoke
    import os
    declared = {d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}")}
    for name in sorted(declared - set(oracle)):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        print(f"ROWS {name}: {n}")
    print(f"\n{len(failures)} failures" if failures else "\nALL OK")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
