#!/usr/bin/env python
"""Round-15 interleaved A/B harness.

Extends scripts/bench_attribution.py with PER-VARIANT session conf:
each variant is {"sql": ..., "conf": {...}} — the conf keys are set via
spark.conf.set right before every timed run of that variant and
restored to the session default after, so runtime-settable optimizer
confs (e.g. the runtime Bloom-filter thresholds) can be A/B'd
INTERLEAVED in one session (fresh spark.sql() per run re-plans under
the current conf; cross-session absolutes are not comparable on this
host — BASELINE §5s).

Usage:
    python scripts/r15_experiment.py <sf_dir> <variants.json> [reps]

variants.json:
    {"__conf__": {...session-wide extra conf...},
     "__duckdb__": "control SQL (optional)",
     "label": {"sql": "...", "conf": {"k": "v", ...}}, ...}

Prints one JSON line: per-variant run lists + medians, parity vs the
first variant (recorded, not asserted), DuckDB machine-load control.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1]
    with open(sys.argv[2]) as fh:
        spec = json.load(fh)
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    session_conf = spec.pop("__conf__", {})
    duck_sql = spec.pop("__duckdb__", None)
    variants = {
        k: (v if isinstance(v, dict) else {"sql": v, "conf": {}})
        for k, v in spec.items()
    }

    from kfai_pipeline_spark.catalog import TABLES, register_views
    from kfai_pipeline_spark.session import get_spark

    spark = get_spark(app_name="r15-experiment", extra_conf=session_conf)
    register_views(spark, sf_dir)

    defaults: dict[str, str | None] = {}
    for v in variants.values():
        for k in v.get("conf", {}):
            if k not in defaults:
                try:
                    defaults[k] = spark.conf.get(k)
                except Exception:
                    defaults[k] = None

    def with_conf(conf: dict, fn):
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            return fn()
        finally:
            for k in conf:
                if defaults.get(k) is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, defaults[k])

    # parity (recorded): every variant vs the first
    first = None
    parity: dict[str, bool] = {}
    for label, v in variants.items():
        rows = with_conf(
            v.get("conf", {}),
            lambda: sorted(map(tuple, spark.sql(v["sql"]).collect())),
        )
        if first is None:
            first = (label, rows)
        parity[label] = rows == first[1]

    # warm-up once per variant, then interleave round-robin
    for v in variants.values():
        with_conf(v.get("conf", {}), lambda: spark.sql(v["sql"]).collect())
    runs: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(reps):
        for label, v in variants.items():
            def timed():
                t0 = time.perf_counter()
                spark.sql(v["sql"]).collect()
                return time.perf_counter() - t0
            runs[label].append(round(with_conf(v.get("conf", {}), timed), 4))

    duck = None
    try:
        import duckdb

        con = duckdb.connect()
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(p):
                p = f"{p}/*.parquet"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        dsql = duck_sql or next(iter(variants.values()))["sql"]
        con.execute(dsql).fetchall()
        dts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            con.execute(dsql).fetchall()
            dts.append(round(time.perf_counter() - t0, 4))
        duck = {"runs": dts, "median": round(statistics.median(dts), 4)}
    except Exception as exc:
        duck = {"error": str(exc)[:200]}

    print(json.dumps({
        "sf_dir": sf_dir,
        "reps": reps,
        "session_conf": session_conf,
        "parity": parity,
        "variants": {
            k: {"runs": v, "median": round(statistics.median(v), 4)}
            for k, v in runs.items()
        },
        "duckdb_control": duck,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
