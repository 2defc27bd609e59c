#!/usr/bin/env python3
"""Parallel, JSON-emitting variant of check_oracle.py for the big-SF gates:
same per-query fresh-subprocess isolation (duckdb's allocator never returns
memory to a long-lived process), but N workers at once and a
CORRECTNESS-style JSON artifact out. Usage:

    python3 tools/check_oracle_par.py <sfDir> <verifyOutDir> <outJson> \
        [workers] [query ...]

Worker count x ORACLE_MEMORY_LIMIT must fit the box alongside anything
else running (default 4 x 8GB).

Processes are managed by hand rather than mp.Pool: a duckdb worker that
hard-crashes (abort() inside libduckdb) leaves a Pool.imap_unordered
waiting forever — observed on the sf1 gate before per-process spill dirs.
Here a dead or 30-min-overdue worker is recorded as a FAIL and its slot
reused; the artifact always gets written.
"""
import json
import multiprocessing as mp
import os
import shutil
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from check_oracle import check_one  # noqa: E402

# Per-oracle wall budget. Overridable for deliberate above-gate runs
# (e.g. the sf10 spot-gate, where a linear 10x of a 275 s sf1 replay
# legitimately passes 1800 s).
TIMEOUT_S = int(os.environ.get("ORACLE_TIMEOUT_S", "1800"))


def _child(q, task):
    q.put(check_one(task))


def main():
    sf_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    workers = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    only = set(sys.argv[5:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    pending = [(sf_dir, out_dir, name, sql)
               for name, sql in sorted(oracles.items(), reverse=True)
               if not only or name in only]
    results = {}
    active = {}  # Process -> (queue, task, deadline)
    ctx = mp.get_context("spawn")

    def record(name, ok, msg):
        results[name] = {"hash_match": ok,
                         "detail": msg if not ok else msg.strip()}
        print(("PASS " if ok else "FAIL ") + name, flush=True)

    while pending or active:
        while pending and len(active) < workers:
            task = pending.pop()
            q = ctx.Queue()
            p = ctx.Process(target=_child, args=(q, task))
            p.start()
            active[p] = (q, task, time.time() + TIMEOUT_S)
        time.sleep(0.2)
        for p in list(active):
            q, task, deadline = active[p]
            name = task[2]
            res = None
            try:
                res = q.get_nowait()
            except Exception:
                pass
            if res is None and not p.is_alive():
                # finished between polls? drain with a grace period
                try:
                    res = q.get(timeout=5)
                except Exception:
                    record(name, False, f"worker died rc={p.exitcode}")
                    # a hard-crashed (abort inside libduckdb) child skips
                    # check_one's finally — clean its spill dir here
                    shutil.rmtree(f"/tmp/duckdb_oracle_{p.pid}",
                                  ignore_errors=True)
                    del active[p]
                    continue
            if res is not None:
                record(*res)
                p.join(5)
                if p.is_alive():
                    p.kill()
                    p.join(5)  # reap: a killed-but-unjoined child is a
                    # zombie for the rest of a long sf1 sweep
                del active[p]
            elif time.time() > deadline:
                p.kill()
                p.join(5)
                # a killed child never reaches check_one's spill-dir
                # cleanup — and a timed-out replay is exactly the one that
                # spilled multi-GB temp files
                shutil.rmtree(f"/tmp/duckdb_oracle_{p.pid}",
                              ignore_errors=True)
                record(name, False, f"timeout after {TIMEOUT_S}s")
                del active[p]

    n_fail = sum(1 for r in results.values() if not r["hash_match"])
    artifact = {"sf_dir": sf_dir, "checked": len(results),
                "pass": len(results) - n_fail, "fail": n_fail,
                "queries": dict(sorted(results.items()))}
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"== {len(results) - n_fail} pass, {n_fail} fail -> {out_json} ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
