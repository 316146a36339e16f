#!/usr/bin/env python
"""Capture .explain('formatted') for round-15 optimization evidence.

Writes plans/r15/<name>_{before|after}.txt for:
  - every bench query's Spark-SQL twin (the timed artifact), under the
    exact bench session conf (AQE off, bench shuffle partitions), and
  - any registry query named on the command line (driver conf).

Usage: python scripts/r15_capture_plans.py before|after [name ...]
With no names: all bench twins. Names may be bench ids (b1..b9) or
registry query names (q07, q94_dup_spans, ...).
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]

    from bench import BENCH_QUERIES
    from kfai_pipeline_spark.catalog import register_views
    from kfai_pipeline_spark.queries import REGISTRY
    from kfai_pipeline_spark.queries.spark_sql import BENCH_SQL
    from kfai_pipeline_spark.session import get_spark

    out_dir = os.path.join(REPO, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)

    # bench-session conf, mirroring bench.py's sf<=0.1 arm
    spark = get_spark(
        app_name="r15-plan-capture",
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.shuffle.partitions": "4",
            "spark.sql.files.maxPartitionBytes": "1048576",
            "spark.sql.files.openCostInBytes": "65536",
            "spark.sql.join.preferSortMergeJoin": "false",
        },
    )
    register_views(spark, SF_DIR)

    if not names:
        names = list(BENCH_QUERIES)

    for name in names:
        if name in BENCH_QUERIES:  # bench id -> SQL twin
            qname = BENCH_QUERIES[name]
            df = spark.sql(BENCH_SQL[qname])
            label = name
        elif name in BENCH_SQL:
            df = spark.sql(BENCH_SQL[name])
            label = name
        elif name in REGISTRY:
            df = REGISTRY[name].build(spark, SF_DIR)
            label = name
        else:
            print(f"unknown name: {name}", file=sys.stderr)
            continue
        path = os.path.join(out_dir, f"{label}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(explain_str(df))
        print(f"wrote {path}")

    spark.stop()


if __name__ == "__main__":
    main()
