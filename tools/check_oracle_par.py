#!/usr/bin/env python3
"""Parallel, JSON-emitting variant of check_oracle.py for the big-SF gates:
same per-query fresh-subprocess isolation (duckdb's allocator never returns
memory to a long-lived process), but N workers at once and a
CORRECTNESS-style JSON artifact out. Usage:

    python3 tools/check_oracle_par.py <sfDir> <verifyOutDir> <outJson> \
        [workers] [query ...]

Worker count x ORACLE_MEMORY_LIMIT must fit the box alongside anything
else running (default 4 x 8GB).
"""
import json
import multiprocessing as mp
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from check_oracle import check_one  # noqa: E402


def main():
    sf_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    workers = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    only = set(sys.argv[5:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    tasks = [(sf_dir, out_dir, name, sql)
             for name, sql in sorted(oracles.items())
             if not only or name in only]
    results = {}
    # maxtasksperchild=1 = the fresh-process-per-query contract
    with mp.get_context("spawn").Pool(workers, maxtasksperchild=1) as pool:
        for name, ok, msg in pool.imap_unordered(check_one, tasks):
            results[name] = {"hash_match": ok,
                             "detail": msg if not ok else msg.strip()}
            print(("PASS " if ok else "FAIL ") + name, flush=True)
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
