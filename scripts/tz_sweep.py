#!/usr/bin/env python
"""Timezone / timestamp-precision cross-engine sweep (round 7; the
round-6 verdict's "next sweep" candidate).

The graded events fixture is TIMESTAMP_NTZ at whole-second-ish
precision, generated and graded in one timezone. Production event
streams carry microsecond precision, pre-epoch timestamps, and rows
whose NAIVE wall-clock falls inside a DST spring-forward gap (a local
time that never existed) or fall-back overlap (one that existed
twice) — and the cluster's JVM timezone is whatever the deployment
set. NTZ semantics promise timezone-invariance; this sweep PROVES it
for the events family instead of assuming it:

  fixture = sf0.001 events with
    - odd microsecond fractions (...123456) on a third of rows
    - rows at 2024-03-10 02:30 (US spring-forward gap) and
      2024-11-03 01:30 (fall-back overlap) naive wall-clock
    - a pre-epoch timestamp (1969-07-20 20:17:40 — negative epoch:
      floor-division and bucket math must not truncate toward zero)

  then driver_sim (Spark vs DuckDB hash compare) runs the events
  family in THREE subprocess JVMs: TZ=UTC, TZ=America/New_York,
  TZ=Asia/Kolkata (a half-hour-offset zone). DuckDB's naive-timestamp
  arithmetic is timezone-free, so green in every zone proves
  Spark_A == DuckDB == Spark_B — the engine's event-time semantics
  are timezone-invariant end to end.

Usage: python scripts/tz_sweep.py  (builds /tmp/tz_fixture)
"""
from __future__ import annotations

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EVENT_QUERIES = [
    "q16", "q17", "q24", "q25", "q28", "q39_asof",
    "q54_sessionize_terminator", "q58_sliding_window", "q72_interval_join",
    "q80_rolling_range", "q84_funnel", "q85_retention", "q89_asof_tolerance",
    "q95_scd2_history", "q100_rolling_zscore", "q102_incremental_agg",
    "q107_zscore_backfill",
]

ZONES = ["UTC", "America/New_York", "Asia/Kolkata"]


def main() -> None:
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    fixture = os.environ.get("SPARK_GRAFT_TZ_DIR", "/tmp/tz_fixture")
    os.makedirs(fixture, exist_ok=True)
    src = "/root/testdata/sf0.001"
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        shutil.copy(f"{src}/{t}.parquet", f"{fixture}/{t}.parquet")

    ev = duckdb.sql(
        f"SELECT * FROM read_parquet('{src}/events.parquet')"
    ).fetchdf()
    ts = pd.to_datetime(ev["ts"])
    # microsecond fractions on a third of rows (NOT on rows the asof /
    # interval queries pin to exact boundaries — shifting every row
    # would change legitimate results, which is fine: the oracle sees
    # the same shifted data)
    ts = ts + pd.to_timedelta((ev.index % 3 == 0) * 123456, unit="us")
    ev["ts"] = ts
    # DST gap / overlap / pre-epoch probes on three existing rows
    # (keeps user/event structure intact)
    ev.loc[5, "ts"] = pd.Timestamp("2024-03-10 02:30:00.000001")
    ev.loc[9, "ts"] = pd.Timestamp("2024-11-03 01:30:00.500000")
    ev.loc[21, "ts"] = pd.Timestamp("1969-07-20 20:17:40.000000")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(ev["event_id"], pa.int64()),
                "ts": pa.array(ev["ts"], pa.timestamp("us")),
                "user_id": pa.array(ev["user_id"], pa.int64()),
                "event_type": pa.array(ev["event_type"], pa.string()),
                "value": pa.array(ev["value"], pa.float64()),
                "props": pa.array(ev["props"], pa.string()),
            }
        ),
        f"{fixture}/events.parquet",
    )

    failures = []
    for zone in ZONES:
        env = dict(os.environ, TZ=zone)
        print(f"--- TZ={zone}", flush=True)
        rc = subprocess.call(
            [
                sys.executable,
                f"{REPO}/scripts/driver_sim.py",
                fixture,
                *EVENT_QUERIES,
            ],
            env=env,
        )
        if rc != 0:
            failures.append(zone)
    if failures:
        print(f"tz sweep FAILED in zones: {failures}")
        sys.exit(1)
    print(f"tz sweep green in all zones: {ZONES}")


if __name__ == "__main__":
    main()
