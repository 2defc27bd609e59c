#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, load the Verify.scala parquet output, sort
columns by name + rows by value, and compare. Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob, shutil
import multiprocessing as mp
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Conservative default; override for a bigger box. DuckDB treats this as a
# buffer-manager budget, not an OS reservation, so keep it well under free
# RAM — a 90GB budget on a machine also running a Spark JVM dies with
# "Failed to allocate block" (system malloc) long before DuckDB's own limit.
MEMORY_LIMIT = os.environ.get("ORACLE_MEMORY_LIMIT", "8GB")

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def connect(sf_dir):
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{MEMORY_LIMIT}'")
    # Per-process spill dir: an in-memory duckdb spills to the cwd-relative
    # ".tmp/duckdb_temp_storage-*.tmp", so N parallel workers (the sf1 gate)
    # otherwise share files and die in each other's cleanup
    # ("Could not remove file .tmp/duckdb_temp_storage-1.tmp").
    tmp = f"/tmp/duckdb_oracle_{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table = directory of parts
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con

def run_query(sf_dir, pdir, sql):
    con = connect(sf_dir)
    try:
        got = norm(con.execute(f"SELECT * FROM '{pdir}/*.parquet'").fetchdf())
        want = norm(con.execute(sql).fetchdf())
        return got, want
    finally:
        con.close()

def check_one(task):
    # Runs in a FRESH subprocess (one Process per query): duckdb's
    # process-global allocator does not reliably return memory across
    # connections, so one 100M-pair oracle at a big SF otherwise leaves the
    # process unable to allocate for every later (tiny) query.
    sf_dir, out_dir, name, sql = task
    pdir = f"{out_dir}/{name}"
    if not glob.glob(f"{pdir}/*.parquet"):
        return (name, False, "no spark output")
    try:
        got, want = run_query(sf_dir, pdir, sql)
    except Exception as e:
        return (name, False, str(e))
    finally:
        # The per-process spill dir (see connect) is keyed by THIS pid and
        # this process runs exactly one query — remove it here or a
        # 407-query sweep leaves 407 dirs (some with multi-GB orphaned
        # spill files after an OOM-killed replay) in /tmp. The kill-on-
        # timeout path can't reach this finally; check_oracle_par cleans
        # those by the child's pid.
        shutil.rmtree(f"/tmp/duckdb_oracle_{os.getpid()}",
                      ignore_errors=True)
    if list(got.columns) != list(want.columns):
        return (name, False,
                f"columns {list(got.columns)} vs {list(want.columns)}")
    if len(got) != len(want):
        return (name, False, f"rows {len(got)} vs {len(want)}")
    dt_note = ""
    if [str(t) for t in got.dtypes] != [str(t) for t in want.dtypes]:
        dt_note = (f"  [dtypes: {list(map(str, got.dtypes))} vs "
                   f"{list(map(str, want.dtypes))}]")
    if got.astype(str).equals(want.astype(str)):
        return (name, True, f"({len(got)} rows){dt_note}")
    diff = (got.astype(str) != want.astype(str)).any(axis=1)
    idx = diff[diff].index[:3]
    lines = [f"value mismatch, e.g. rows {list(idx)}"]
    for i in idx:
        lines.append(f"  got : {got.loc[i].to_dict()}")
        lines.append(f"  want: {want.loc[i].to_dict()}")
    return (name, False, "\n".join(lines))

def _child(q, task):
    q.put(check_one(task))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    tasks = [(sf_dir, out_dir, name, sql)
             for name, sql in sorted(oracles.items())
             if not only or name in only]
    n_pass = n_fail = 0
    # One FRESH process per query (see check_one). Plain multiprocessing
    # instead of ProcessPoolExecutor(max_tasks_per_child=1): that kwarg is
    # Python >= 3.11 only, and a spawned-per-task Process gives the same
    # isolation on any interpreter.
    ctx = mp.get_context("spawn")
    for task in tasks:
        q = ctx.Queue()
        p = ctx.Process(target=_child, args=(q, task))
        p.start()
        # Drain the queue BEFORE join: a result bigger than the OS pipe
        # buffer blocks the child's queue feeder thread, so join-first
        # deadlocks; and q.empty() right after join can race false-negative.
        try:
            name, ok, msg = q.get(timeout=600)
            p.join()
        except Exception:
            # Timeout/queue failure: the child may be wedged inside a
            # duckdb call that never returns — an untimed join would block
            # forever and its per-pid spill dir would leak (the in-child
            # finally never runs on SIGKILL), so kill + reap + sweep here.
            name, ok, msg = task[2], False, "subprocess produced no result"
            p.kill()
            p.join(5)
            shutil.rmtree(f"/tmp/duckdb_oracle_{p.pid}", ignore_errors=True)
        if p.exitcode != 0 and ok is False and msg.startswith("subprocess"):
            msg = f"subprocess died rc={p.exitcode}"
        if ok:
            print(f"PASS {name} {msg}"); n_pass += 1
        else:
            print(f"FAIL {name}: {msg}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
