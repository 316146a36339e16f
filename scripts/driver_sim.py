#!/usr/bin/env python
"""Full dry-run of the grading driver's correctness harness.

Builds a PLAIN SparkSession (no repo session factory — exactly what the
driver does), runs every ``queries()`` entry at sf0.01, and compares
against ``oracle_sql()`` in DuckDB under the driver canonicalization
(tests/oracle_utils.py). Prints one status line per query and a
summary; exits non-zero on any mismatch/error so it can gate a round.

Usage: python scripts/driver_sim.py [sf_dir] [query_name ...]
(query names restrict the sweep — the fast per-change spot check)
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import duckdb

    from _driver_session import plain_driver_session

    spark = plain_driver_session()

    import __spark_entry__ as entrymod
    from kfai_pipeline_spark.catalog import TABLES
    from oracle_utils import canonical_rows

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            # multi-file (Spark-style directory) layout — glob the parts
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only:
        unknown = only - set(queries)
        if unknown:
            sys.exit(f"unknown query names: {sorted(unknown)}")
        queries = {k: v for k, v in queries.items() if k in only}
    n_pass = n_rows_only = 0
    failures: list[str] = []
    for name in queries:
        t0 = time.time()
        try:
            spk = queries[name](spark, sf_dir).toPandas()
            if name not in oracles:
                n_rows_only += 1
                print(f"{name}: rows-only ({len(spk)} rows, {time.time()-t0:.1f}s)")
                continue
            dck = con.execute(oracles[name]).fetchdf()
            ok = (
                sorted(spk.columns) == sorted(dck.columns)
                and len(spk) == len(dck)
                and canonical_rows(spk) == canonical_rows(dck)
            )
            if ok:
                n_pass += 1
                print(f"{name}: PASS ({len(spk)} rows, {time.time()-t0:.1f}s)")
            else:
                failures.append(name)
                print(
                    f"{name}: MISMATCH spark={len(spk)} oracle={len(dck)} "
                    f"cols={sorted(spk.columns)} vs {sorted(dck.columns)}"
                )
        except Exception as ex:  # noqa: BLE001 — report and continue, like the driver
            failures.append(name)
            print(f"{name}: ERROR {str(ex)[:200]}")
    print(
        f"\nsummary: {n_pass} pass, {n_rows_only} rows-only, "
        f"{len(failures)} failing of {len(queries)}"
    )
    if failures:
        print("failing:", failures)
        sys.exit(1)


if __name__ == "__main__":
    main()
