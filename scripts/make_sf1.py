#!/usr/bin/env python
"""Generate scaled bench fixtures from /root/testdata/sf0.1.

- ``main()`` / CLI default: 10x -> ./bench_sf1/ (single-file tables,
  the BASELINE.md §3 crossover fixture).
- ``make(..., copies=100, file_size_bytes=...)`` / ``make_sf10.py``:
  100x -> ./bench_sf10/ with MULTI-FILE parquet for the scaled tables,
  so Spark scans are naturally wide (many splits without
  maxPartitionBytes heroics) and the shuffle machinery actually
  engages — the sf1 fixture reads as ~2 row-group-bound partitions,
  which under-exercises exactly the regime a 100 TB cluster lives in.

Scaling preserves join semantics: fact/bridge keys are offset per copy
so orders⋈lineitem and customer⋈orders fan-out stays identical to
sf0.1, while per-group cardinalities (sessionize users, dedup corpus)
grow ``copies``x. Dim tables (region/nation/supplier, plus embeddings)
are copied unchanged — at real scale dims stay broadcast-size by design.
"""
from __future__ import annotations

import os
import shutil

import duckdb

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(REPO, "bench_sf1")
COPIES = 10

# table -> columns offset per copy i (by i * (max(col)+1))
OFFSETS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
}
COPY_AS_IS = ["region", "nation", "supplier", "embeddings"]


def make(
    src: str = SRC,
    dst: str = DST,
    copies: int = COPIES,
    file_size_bytes: int | None = None,
) -> None:
    """Write the scaled fixture. With ``file_size_bytes``, scaled tables
    become DIRECTORIES of ~that-size parquet files (still named
    ``<table>.parquet`` so both Spark and the glob-aware DuckDB readers
    resolve them)."""
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # events.ts must land as UTC-adjusted parquet timestamp (Spark
    # TIMESTAMP_LTZ, matching the sf0.1 read path); plain TIMESTAMP would
    # surface as TIMESTAMP_NTZ which Spark refuses to cast to double.
    con.execute("SET TimeZone='UTC'")
    for t in COPY_AS_IS:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        print("copied", t, flush=True)
    for t, key_cols in OFFSETS.items():
        src_file = f"{src}/{t}.parquet"
        strides = {
            c: con.sql(f"SELECT max({c})+1 FROM '{src_file}'").fetchone()[0]
            for c in key_cols
        }
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src_file}'").fetchall()]

        def render(c: str) -> str:
            if c in strides:
                return f"{c} + i.i * {strides[c]} AS {c}"
            if t == "events" and c == "ts":
                return "CAST(ts AS TIMESTAMPTZ) AS ts"
            return c

        sel = ", ".join(render(c) for c in cols)
        out = f"{dst}/{t}.parquet"
        opts = "FORMAT PARQUET"
        if file_size_bytes:
            # directory-of-files output; clear any stale previous output
            if os.path.isfile(out):
                os.remove(out)
            elif os.path.isdir(out):
                shutil.rmtree(out)
            opts += f", FILE_SIZE_BYTES {file_size_bytes}"
        con.sql(
            f"COPY (SELECT {sel} FROM '{src_file}', range({copies}) i(i)) "
            f"TO '{out}' ({opts})"
        )
        glob = f"{out}/*.parquet" if os.path.isdir(out) else out
        n = con.sql(f"SELECT count(*) FROM '{glob}'").fetchone()[0]
        print("scaled", t, n, flush=True)


def main() -> None:
    make()


if __name__ == "__main__":
    main()
