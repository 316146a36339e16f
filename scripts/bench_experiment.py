#!/usr/bin/env python
"""One-off experiment: bench headline queries under different session
configs to find the sf0.1 sweet spot (VERDICT r1 'Next round' #2).

Runs each variant in a fresh subprocess (fresh JVM) so configs don't
bleed via getOrCreate. Sequential — never two Spark JVMs timed at once.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

VARIANTS = {
    "baseline_aqe_on_32": {},
    "aqe_off_8": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
    },
    "aqe_off_16": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "16",
    },
    "aqe_off_8_nocompress": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
    },
    "aqe_on_8": {
        "spark.sql.shuffle.partitions": "8",
    },
}

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
extra = json.loads(os.environ["BENCH_EXTRA_CONF"])
from kfai_pipeline_spark.catalog import register_views
from kfai_pipeline_spark.queries.spark_sql import BENCH_SQL
from kfai_pipeline_spark.session import get_spark
import bench

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="bench-exp", extra_conf=extra)
register_views(spark, sf_dir)
timings = {}
for bname, qname in bench.BENCH_QUERIES.items():
    sql = BENCH_SQL[qname]
    spark.sql(sql).collect()
    runs = []
    for _ in range(5):
        t = time.perf_counter()
        spark.sql(sql).collect()
        runs.append(time.perf_counter() - t)
    timings[bname] = round(sorted(runs)[len(runs) // 2], 4)
print("RESULT " + json.dumps({"total": round(sum(timings.values()), 4), "queries": timings}))
spark.stop()
"""


def main() -> None:
    for name, conf in VARIANTS.items():
        env = dict(os.environ, BENCH_EXTRA_CONF=json.dumps(conf))
        out = subprocess.run(
            [sys.executable, "-c", CHILD], env=env, capture_output=True, text=True,
            timeout=600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
        if line:
            print(name, line[0][7:], flush=True)
        else:
            print(name, "FAILED", out.stderr[-500:], flush=True)


if __name__ == "__main__":
    main()
