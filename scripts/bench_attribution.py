#!/usr/bin/env python
"""Bench-flag attribution protocol (round-8 verdict item #3).

When a round's BENCH_r{N}.json carries a non-empty ``flagged`` list,
the freeze checklist requires attributing each flagged query IN-round:

  1. re-run the flagged query 5x in a FRESH session (fresh JVM — no
     warm-cache bleed from whatever flagged it);
  2. A/B it against the prior round's SQL twin (and any candidate
     rewrite) INSIDE that same session, interleaved round-robin so
     machine drift cancels (bench noise is +/-10-15% BETWEEN sessions
     but variants inside one session are comparable);
  3. record a one-line verdict in BASELINE.md §3/§5 — machine load,
     plan change, or regression — before the freeze commit.

Usage:
    python scripts/bench_attribution.py <sf_dir> <variants.json>

``variants.json``: {"label": "SQL string", ...} — variants are
expected to compute the same result; per-variant parity against the
first variant is RECORDED in the output JSON (not asserted — a
knife-edge divergence between a float and an exact-domain variant is
itself attribution evidence; a verdict drawn from parity=false rows
must say so). Prints one JSON line with per-variant run lists and
medians. DuckDB's matching timing rides along as the machine-load
control (if DuckDB co-moves, it's the machine, not the plan).

A ``"__duckdb__"`` key, when present, is excluded from the Spark
variants and used verbatim as the DuckDB control SQL — needed whenever
the Spark arms use dialect-only syntax (e.g. the ``100.0D`` double
literal, make_timestamp_ntz). Without it the control runs the first
Spark variant as-is.
"""
from __future__ import annotations

import json
import statistics
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

REPS = 5


def main() -> None:
    sf_dir = sys.argv[1]
    with open(sys.argv[2]) as fh:
        variants: dict[str, str] = json.load(fh)
    duck_sql = variants.pop("__duckdb__", None)

    from kfai_pipeline_spark.catalog import TABLES, register_views
    from kfai_pipeline_spark.session import get_spark

    # BENCH_ATTR_CONF_JSON: optional {"spark.conf.key": "value"} overrides
    # so a flag measured under bench.py's interactive conf (AQE off, small
    # shuffle-partition count, split-sized scans) can be attributed under
    # the SAME conf — cross-conf comparisons are not attribution evidence.
    import os

    conf_env = os.environ.get("BENCH_ATTR_CONF_JSON")
    extra_conf = json.loads(conf_env) if conf_env else None
    spark = get_spark(app_name="bench-attribution", extra_conf=extra_conf)
    register_views(spark, sf_dir)

    # parity check: variants should produce the same rows (sorted).
    # Recorded, not asserted — a knife-edge divergence between a float
    # and an exact-domain variant is itself attribution evidence.
    first = None
    parity: dict[str, bool] = {}
    for label, sql in variants.items():
        rows = sorted(map(tuple, spark.sql(sql).collect()))
        if first is None:
            first = (label, rows)
        parity[label] = rows == first[1]

    # warmup once per variant, then interleave timed reps round-robin
    for sql in variants.values():
        spark.sql(sql).collect()
    runs: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(REPS):
        for label, sql in variants.items():
            t = time.perf_counter()
            spark.sql(sql).collect()
            runs[label].append(round(time.perf_counter() - t, 4))

    # DuckDB control: same-machine co-movement detector
    duck = None
    try:
        import duckdb

        import os

        con = duckdb.connect()
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(p):  # Spark-written directory table
                p = f"{p}/*.parquet"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        dsql = duck_sql or next(iter(variants.values()))
        con.execute(dsql).fetchall()  # warm
        dts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            con.execute(dsql).fetchall()
            dts.append(round(time.perf_counter() - t0, 4))
        duck = {"runs": dts, "median": round(statistics.median(dts), 4)}
    except Exception as exc:  # control only — never block the verdict
        duck = {"error": str(exc)[:200]}

    print(json.dumps({
        "sf_dir": sf_dir,
        "reps": REPS,
        "parity": parity,
        "variants": {
            k: {"runs": v, "median": round(statistics.median(v), 4)}
            for k, v in runs.items()
        },
        "duckdb_control": duck,
    }))


if __name__ == "__main__":
    main()
