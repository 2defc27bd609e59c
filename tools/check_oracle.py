#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, load the Verify.scala parquet output, sort
columns by name + rows by value, and compare. Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con

def run_query(sf_dir, pdir, sql):
    # Fresh connection per query: the heavy oracles (LSH bucket replays,
    # recursive CTEs) otherwise accumulate allocator state across ~70
    # queries and can hit transient OOM under memory pressure from the
    # still-resident Spark JVM.
    con = connect(sf_dir)
    try:
        got = norm(con.execute(f"SELECT * FROM '{pdir}/*.parquet'").fetchdf())
        want = norm(con.execute(sql).fetchdf())
        return got, want
    finally:
        con.close()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        pdir = f"{out_dir}/{name}"
        if not glob.glob(f"{pdir}/*.parquet"):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            try:
                got, want = run_query(sf_dir, pdir, sql)
            except Exception as e:
                if "Out of Memory" not in str(e):
                    raise
                got, want = run_query(sf_dir, pdir, sql)  # one retry
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1; continue
        # dtype visibility (informational; value compare is authoritative)
        dt_note = ""
        if [str(t) for t in got.dtypes] != [str(t) for t in want.dtypes]:
            dt_note = f"  [dtypes: {list(map(str, got.dtypes))} vs {list(map(str, want.dtypes))}]"
        eq = got.astype(str).equals(want.astype(str))
        if eq:
            print(f"PASS {name} ({len(got)} rows){dt_note}"); n_pass += 1
        else:
            diff = (got.astype(str) != want.astype(str)).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: value mismatch, e.g. rows {list(idx)}")
            for i in idx:
                print(f"  got : {got.loc[i].to_dict()}")
                print(f"  want: {want.loc[i].to_dict()}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
