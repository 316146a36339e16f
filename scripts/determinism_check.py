#!/usr/bin/env python
"""Run-to-run determinism sweep: execute every registry query TWICE in
one session and compare canonical forms.

Why this exists: the driver hashes query output, so ANY execution
nondeterminism — unordered ``collect_list``, ``F.first`` over an
unordered group, floating-point aggregation whose partial-merge order
depends on task scheduling — can pass one run and fail the next. Two
executions of the same plan under 32-way parallelism take different
merge orders, so a diff here catches the class directly (the BM25
per-doc sum was fixed to an ordered fold for exactly this reason).

Usage: python scripts/determinism_check.py [sf_dir]
Exits non-zero on any query whose two executions differ.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from oracle_utils import canonical_rows

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    unstable: list[str] = []
    for name in queries:
        t0 = time.time()
        try:
            df = queries[name](spark, sf_dir)
            a = canonical_rows(df.toPandas())
            b = canonical_rows(df.toPandas())  # same plan, fresh execution
            ok = a == b
            print(
                f"{name}: {'STABLE' if ok else 'UNSTABLE'} ({time.time()-t0:.1f}s)",
                flush=True,
            )
            if not ok:
                unstable.append(name)
        except Exception as ex:  # noqa: BLE001
            unstable.append(name)
            print(f"{name}: ERROR {str(ex)[:200]}", flush=True)
    print(f"\nsummary: {len(queries) - len(unstable)} stable, {len(unstable)} unstable")
    if unstable:
        print("unstable:", unstable)
        sys.exit(1)


if __name__ == "__main__":
    main()
