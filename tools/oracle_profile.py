#!/usr/bin/env python3
"""Emulate the round driver's oracle replay: ONE process, sequential over all
oracle SQL in alphabetical order, tracking RSS growth (the round-3 failure
mode: DuckDB allocator growth from one bloated oracle starves later ones)."""
import sys, os, json, resource
import duckdb

sf_dir, dump_dir = sys.argv[1], sys.argv[2]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
oracles = json.load(open(os.path.join(dump_dir, "oracle_sql.json")))
peak0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
worst = []
for name in sorted(oracles):
    con = duckdb.connect()
    con.execute("SET memory_limit='8GB'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    try:
        n = len(con.execute(oracles[name]).fetchall())
    except Exception as e:
        print(f"FAIL {name}: {e}")
        sys.exit(1)
    finally:
        con.close()
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    worst.append((rss, name, n))
print(f"{len(oracles)} oracles OK in one process")
print(f"start peak RSS {peak0/1e6:.2f} GB, end peak RSS {worst[-1][0]/1e6:.2f} GB")
for rss, name, n in sorted(worst, reverse=True)[:5]:
    print(f"  peak {rss/1e6:.2f} GB after {name} ({n} rows)")
