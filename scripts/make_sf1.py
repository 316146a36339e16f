#!/usr/bin/env python
"""Generate a 10x-scaled 'sf1' fixture from /root/testdata/sf0.1 into
./bench_sf1/ (git-ignored) for the bench crossover measurement
(BASELINE.md §3).

Scaling preserves join semantics: fact/bridge keys are offset per copy
so orders⋈lineitem and customer⋈orders fan-out stays identical to
sf0.1, while per-group cardinalities (sessionize users, dedup corpus)
grow 10x. Dim tables (region/nation/supplier, plus embeddings) are
copied unchanged — at real scale dims stay broadcast-size by design.
"""
from __future__ import annotations

import os
import shutil

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_sf1")
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


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    # events.ts must land as UTC-adjusted parquet timestamp (Spark
    # TIMESTAMP_LTZ, matching the sf0.1 read path); plain TIMESTAMP would
    # surface as TIMESTAMP_NTZ which Spark refuses to cast to double.
    con.execute("SET TimeZone='UTC'")
    for t in COPY_AS_IS:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
        print("copied", t)
    for t, key_cols in OFFSETS.items():
        src = f"{SRC}/{t}.parquet"
        strides = {
            c: con.sql(f"SELECT max({c})+1 FROM '{src}'").fetchone()[0]
            for c in key_cols
        }
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]

        def render(c: str) -> str:
            if c in strides:
                return f"{c} + i.i * {strides[c]} AS {c}"
            if t == "events" and c == "ts":
                return "CAST(ts AS TIMESTAMPTZ) AS ts"
            return c

        sel = ", ".join(render(c) for c in cols)
        con.sql(
            f"COPY (SELECT {sel} FROM '{src}', range({COPIES}) i(i)) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print("scaled", t, n)


if __name__ == "__main__":
    main()
