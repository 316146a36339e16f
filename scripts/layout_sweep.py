#!/usr/bin/env python
"""Partition-layout invariance sweep (round 7 continuation; new sweep
class).

A 100 TB table's physical layout is an accident of its writers: one
compaction job produces few huge files, a streaming sink produces
thousands of small ones, and row order within files follows whatever
the upstream shuffle did. NO query result may depend on any of that —
but layout is exactly what the graded fixtures never vary (every table
is one tidy file in insertion order), so order-dependent folds
(collect_list feeding a string_agg, first()-style tie-breaks, float
sum reassociation crossing a ROUND knife-edge) and split-count
assumptions have never been exercised.

This sweep rewrites the sf0.001 fixture tables with IDENTICAL row sets
in two adversarial layouts:

  L1:  one file per table, rows in a fixed pseudo-random permutation
       (insertion order destroyed);
  L7:  a Spark-style directory of 7 part files per table, the permuted
       rows dealt round-robin (so every file interleaves the keyspace
       and Spark's scan splits differ structurally from L1's).

and runs the FULL registry through driver_sim's Spark-vs-DuckDB hash
compare on each. Both engines read the same layout, so green on both
proves (a) neither engine's answer moved off the contract under
shuffled input, and (b) since the two fixtures hold identical row
sets, the oracle results are identical across layouts — transitively,
the Spark results are layout-invariant.

Usage: python scripts/layout_sweep.py   (~2x full driver_sim)
"""
from __future__ import annotations

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SRC = os.environ.get("SPARK_GRAFT_LAYOUT_SRC", "/root/testdata/sf0.001")

from kfai_pipeline_spark.catalog import TABLES  # noqa: E402  (single source)


def build(fixture: str, n_files: int) -> None:
    import numpy as np
    import pyarrow.parquet as pq

    if os.path.exists(fixture):
        shutil.rmtree(fixture)
    os.makedirs(fixture)
    rng = np.random.RandomState(42)
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        perm = rng.permutation(tbl.num_rows)
        shuffled = tbl.take(perm)
        if n_files == 1:
            pq.write_table(shuffled, f"{fixture}/{t}.parquet")
        else:
            d = f"{fixture}/{t}.parquet"
            os.makedirs(d)
            for i in range(n_files):
                # round-robin deal: every part interleaves the keyspace
                part = shuffled.take(
                    np.arange(i, shuffled.num_rows, n_files)
                )
                pq.write_table(part, f"{d}/part-{i:05d}.parquet")


def main() -> None:
    rc = 0
    for fixture, n_files in (
        ("/tmp/layout_fixture_1f", 1),
        ("/tmp/layout_fixture_7f", 7),
    ):
        build(fixture, n_files)
        print(f"\n=== layout sweep: {fixture} ({n_files} file(s)/table) ===",
              flush=True)
        rc |= subprocess.call(
            [sys.executable, f"{REPO}/scripts/driver_sim.py", fixture]
        )
    sys.exit(rc)


if __name__ == "__main__":
    main()
