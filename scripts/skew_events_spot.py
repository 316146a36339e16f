#!/usr/bin/env python
"""Hot-key skew spot for the events/window family (round-7 verdict
item 5, the q108 winner-election argument applied to events): what
happens to the partitionBy(user_id) operators when ONE bot user owns
half the corpus?

The skew is structural: WindowExec materializes each key's run in one
task, so a 50%-hot key serializes half the data into one slot no
matter the cluster size. Measured here, uniform vs hot, same session:

  rolling_agg      — trailing RANGE count/sum (q80's operator)
  rolling_agg_bkt  — the exact salt-by-time arm (bucket_seconds):
                     hot key splits across its time buckets
  rolling_zscore   — q100's operator (plain vs bucketed)
  sessionize       — gaps-and-islands session stats (q25 family);
                     inherently sequential per key (session ids chain
                     through the FULL history) — measured to document
                     the bound, no salted arm exists without a
                     boundary-stitch pass
  retention        — day-over-day key intersection (q85 family) —
                     groupBy, not window: hash partial aggs absorb the
                     hot key map-side (the control group)

Usage: python scripts/skew_events_spot.py [n_events] [hot_frac] [dur_s]
Prints one JSON line; findings recorded in BASELINE.md §5o.

Sizing note (first 10M attempt, killed): Spark's SlidingWindowFrame
re-evaluates the WHOLE frame per output row for non-invertible
aggregates (stddev), so the hot arm costs O(hot_rows x frame_rows) in
ONE task — 5M hot rows x ~7k-row frames ≈ 3.5e10 ops ≈ hours. That
blow-up is exactly the finding; measure it at a size that terminates
(2M x 600 s frames) and report the RATIOS.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kfai_pipeline_spark.operators.rolling import (  # noqa: E402
    rolling_time_agg,
    rolling_zscore,
)
from kfai_pipeline_spark.operators.sessionize import session_stats  # noqa: E402
from kfai_pipeline_spark.session import get_spark  # noqa: E402

DAY_US = 86_400 * 1_000_000


def make_events(spark, n: int, hot_frac: float, n_users: int = 10_000):
    """Deterministic synthetic events over ~30 days; a hot_frac share
    of rows belongs to user 0, the rest spread uniformly."""
    hot_cut = int((1 << 20) * hot_frac)
    return (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.when(F.pmod(F.xxhash64("id"), F.lit(1 << 20)) < hot_cut, 0)
            .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_users)) + 1)
            .alias("user_id"),
            F.timestamp_seconds(
                (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(30 * 86_400 * 10)) / 10.0)
            ).alias("ts"),
            (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1000)) / 100.0).alias("value"),
        )
    )


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 1)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    dur = float(sys.argv[3]) if len(sys.argv) > 3 else 600.0
    spark = get_spark()
    out: dict = {
        "metric": "skew_events_spot", "n_events": n, "hot_frac": hot_frac,
        "duration_s": dur,
    }

    def retention(ev):
        # day-over-day retained users: groupBy control arm
        days = ev.select(
            "user_id", F.date_trunc("day", "ts").alias("day")
        ).distinct()
        nxt = days.select(
            "user_id", (F.col("day") + F.expr("INTERVAL 1 DAY")).alias("day")
        )
        return days.join(nxt, ["user_id", "day"]).groupBy("day").count()

    for label, frac in (("uniform", 0.0), ("hot", hot_frac)):
        ev = make_events(spark, n, frac).persist()
        ev.count()
        arm = {
            "rolling_agg": timed(
                lambda: rolling_time_agg(
                    ev, "user_id", "ts", "value", dur
                ).foreach(lambda r: None)
            ),
            "rolling_agg_bkt": timed(
                lambda: rolling_time_agg(
                    ev, "user_id", "ts", "value", dur, bucket_seconds=dur
                ).foreach(lambda r: None)
            ),
            "rolling_zscore": timed(
                lambda: rolling_zscore(
                    ev, "user_id", "ts", "value", dur
                ).foreach(lambda r: None)
            ),
            "rolling_zscore_bkt": timed(
                lambda: rolling_zscore(
                    ev, "user_id", "ts", "value", dur, bucket_seconds=dur
                ).foreach(lambda r: None)
            ),
            "sessionize": timed(
                lambda: session_stats(
                    ev, "user_id", "ts", dur, tiebreak_cols=["event_id"]
                ).foreach(lambda r: None)
            ),
            "retention": timed(lambda: retention(ev).foreach(lambda r: None)),
        }
        out[label] = arm
        print(json.dumps({label: arm}), file=sys.stderr)
        ev.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
