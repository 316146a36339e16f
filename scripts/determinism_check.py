#!/usr/bin/env python
"""Run-to-run determinism sweep: BUILD and execute every registry query
twice and compare canonical forms.

Why this exists: the driver hashes query output, so ANY execution
nondeterminism — unordered ``collect_list``, ``F.first`` over an
unordered group, floating-point aggregation whose partial-merge order
depends on task scheduling — can pass one run and fail the next.

The second run must have FRESH RDD lineage: re-executing the SAME
DataFrame object reuses its completed shuffle-map stages (Spark
memoizes the exchange RDDs), which would freeze exactly the map-side
partial-merge order this sweep exists to vary. The registry's plan
memo is cleared between runs so both executions shuffle from scratch
(the BM25 per-doc sum was fixed to an ordered fold for precisely this
failure class).

Usage: python scripts/determinism_check.py [sf_dir]
Exits non-zero on any query whose two executions differ.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _driver_session import plain_driver_session  # noqa: E402


def main() -> None:
    spark = plain_driver_session()

    import __spark_entry__ as entrymod
    from kfai_pipeline_spark.queries.base import _PLAN_MEMO
    from oracle_utils import canonical_rows

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    queries = entrymod.queries()
    unstable: list[str] = []
    for name in queries:
        t0 = time.time()
        try:
            _PLAN_MEMO.clear()
            a = canonical_rows(queries[name](spark, sf_dir).toPandas())
            _PLAN_MEMO.clear()  # fresh plan -> fresh shuffles on run 2
            b = canonical_rows(queries[name](spark, sf_dir).toPandas())
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
