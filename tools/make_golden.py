#!/usr/bin/env python3
"""Independent golden oracle for q_text_compression.

Java's Deflater(6) and CPython's zlib.compress(_, 6) wrap the same zlib
(verified byte-size-identical on the real corpus), so a Python-computed
compressed length is a genuinely independent cross-implementation oracle
for the engine's Deflate quality gate — the one codec DuckDB cannot
replay in SQL.

Keyed by md5(utf8(text)) — NOT doc_id — because the synthetic corpora
draw different texts per scale factor for the same ids. Regenerate (one
command, idempotent) whenever the driver regenerates testdata:

    python3 tools/make_golden.py

Writes golden/text_compression.parquet with (text_md5, comp_len); the
q_text_compression oracle SQL joins it on md5(text) and computes
raw_len/ratio natively.
"""
import glob
import hashlib
import os
import zlib

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE_DIRS = sorted(
    glob.glob("/root/testdata/sf*") + glob.glob(f"{REPO}/testdata_sf*"))


def main():
    seen = {}
    for d in SCALE_DIRS:
        p = f"{d}/documents.parquet"
        if not (os.path.exists(p) or os.path.isdir(p)):
            continue
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        texts = duckdb.sql(f"SELECT text FROM '{src}'").fetchall()
        for (t,) in texts:
            b = (t or "").encode("utf-8")
            k = hashlib.md5(b).hexdigest()
            if k not in seen:
                seen[k] = len(zlib.compress(b, 6))
        print(f"{d}: {len(texts)} docs, {len(seen)} distinct texts so far")
    os.makedirs(f"{REPO}/golden", exist_ok=True)
    out = f"{REPO}/golden/text_compression.parquet"
    keys = sorted(seen)
    pq.write_table(pa.table({
        "text_md5": pa.array(keys, pa.string()),
        "comp_len": pa.array([seen[k] for k in keys], pa.int64()),
    }), out)
    print(f"wrote {out}: {len(keys)} rows")


if __name__ == "__main__":
    main()
