#!/usr/bin/env python
"""DuckDB-oracle timing for the headline B1-B9 queries at an arbitrary
SF dir (BASELINE.md method: 1 warm-up, mean of 3, full fetch).

Usage: python scripts/oracle_bench.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import BENCH_QUERIES
from kfai_pipeline_spark.queries import REGISTRY
from kfai_pipeline_spark.catalog import TABLES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    timings = {}
    for bname, qname in BENCH_QUERIES.items():
        sql = REGISTRY[qname].oracle
        con.sql(sql).fetchall()  # warm-up
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            runs.append(time.perf_counter() - t0)
        timings[bname] = round(sum(runs) / len(runs), 4)
    print(json.dumps({"engine": "duckdb", "sf_dir": sf_dir,
                      "total": round(sum(timings.values()), 4),
                      "queries": timings}))


if __name__ == "__main__":
    main()
