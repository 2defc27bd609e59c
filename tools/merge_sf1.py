#!/usr/bin/env python3
"""Merge retry artifacts into CORRECTNESS_SF1.json: later files override
earlier per-query entries (the retry reruns a fixed query list after an
infra failure — disk-full / OOM on the ORACLE side, see PERF_NOTES).
Usage: merge_sf1.py <base.json> <retry.json> [retry2.json ...]"""
import json
import sys


def main():
    base = json.load(open(sys.argv[1]))
    for p in sys.argv[2:]:
        retry = json.load(open(p))
        base["queries"].update(retry["queries"])
    n_fail = sum(1 for r in base["queries"].values() if not r["hash_match"])
    base["checked"] = len(base["queries"])
    base["pass"] = base["checked"] - n_fail
    base["fail"] = n_fail
    json.dump(base, open(sys.argv[1], "w"), indent=1)
    print(f"{base['pass']} pass, {n_fail} fail -> {sys.argv[1]}")
    for k, v in sorted(base["queries"].items()):
        if not v["hash_match"]:
            print("FAIL", k, "::", v["detail"][:100])


if __name__ == "__main__":
    main()
