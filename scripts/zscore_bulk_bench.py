#!/usr/bin/env python
"""One-off timing: the X23b streaming z-score's JVM bulk arm
(streaming/zscore_bulk.py foreachBatch RANGE-frame fold) vs the
custom-state arm (stateful.rolling_zscore_stream) on the 10M-event
sf10 drain — the BASELINE.md §5f comparison. Same session, same
source, sequential (bench-noise rule: only compare within one
session). Usage:

    python scripts/zscore_bulk_bench.py [events_dir] [--skip-stateful]

Default events_dir: bench_sf10/events.parquet. Prints one JSON line.
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kfai_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    events_dir = args[0] if args else "bench_sf10/events.parquet"
    skip_stateful = "--skip-stateful" in sys.argv

    spark = get_spark()
    scratch = tempfile.mkdtemp(prefix="zscore_bulk_bench_")
    cols = ["event_id", "user_id", "ts", "value"]
    schema = spark.read.parquet(events_dir).select(*cols).schema
    n = spark.read.parquet(events_dir).count()
    out: dict = {"metric": "zscore_10M_drain", "events": n, "unit": "sec"}

    def stream():
        return (
            spark.readStream.schema(schema)
            .parquet(events_dir)
            .select(*cols)
        )

    # --- JVM bulk arm -------------------------------------------------
    from kfai_pipeline_spark.streaming.zscore_bulk import rolling_zscore_backfill

    t0 = time.time()
    q = rolling_zscore_backfill(
        stream(),
        f"{scratch}/bulk_out",
        f"{scratch}/bulk_state",
        f"{scratch}/bulk_ckpt",
        duration_seconds=3600,
        min_points=3,
        z_threshold=2.0,
    )
    q.awaitTermination()
    out["bulk_jvm_sec"] = round(time.time() - t0, 1)
    scored = spark.read.parquet(f"{scratch}/bulk_out/batch_*")
    out["bulk_rows"] = scored.count()
    out["bulk_anomalies"] = scored.where(F.col("is_anomaly")).count()

    # --- custom-state arm (control) ----------------------------------
    if not skip_stateful:
        from kfai_pipeline_spark.streaming.stateful import rolling_zscore_stream

        t0 = time.time()
        q2 = (
            rolling_zscore_stream(
                stream(), duration_seconds=3600, min_points=3, z_threshold=2.0
            )
            .writeStream.format("parquet")
            .option("path", f"{scratch}/state_out")
            .option("checkpointLocation", f"{scratch}/state_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination()
        out["custom_state_sec"] = round(time.time() - t0, 1)
        ss = spark.read.parquet(f"{scratch}/state_out")
        out["custom_state_rows"] = ss.count()
        out["speedup"] = round(out["custom_state_sec"] / out["bulk_jvm_sec"], 1)

    shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
