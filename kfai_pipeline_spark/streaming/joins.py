"""Stream-stream event-time interval join (§2.10 extension): attribute
each left event to right events of the same key within a bounded
event-time interval — the streaming form of "purchase → views in the
preceding hour" attribution.

Mode-agnostic like streaming/windows.py: on batch inputs this is a
plain equi+range join (Catalyst plans the equi part as a hash join with
the range as a post-filter); on streaming inputs both sides get
watermarks and the range condition is what lets Spark BOUND THE STATE —
a stream-stream join without a time constraint would buffer both
streams forever. State retention per side ≈ watermark + interval width;
the join keys shuffle both streams symmetrically (state store is
hash-partitioned on key), so skewed keys skew state — salt upstream if
a key dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    interval: str = "1 hour",
    watermark: str = "10 minutes",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Join rows sharing ``on`` where the right event-time lies in
    ``[left_ts - interval, left_ts]``.

    Columns are prefixed (``l_``/``r_``) so both sides' payloads survive
    without ambiguity; the join key keeps its name unprefixed.

    ``how="left_outer"`` keeps unmatched left rows (purchases with no
    attributable view). On streams, outer results for a left row are
    emitted only once the watermark passes its interval — Spark must
    know no matching right row can still arrive — so outer rows trail
    inner ones by the watermark delay; with Trigger.AvailableNow the
    final batch flushes them.
    """
    from kfai_pipeline_spark.streaming.event_time import as_event_time

    if left.isStreaming:
        left = as_event_time(left, left_ts).withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = as_event_time(right, right_ts).withWatermark(right_ts, watermark)

    l = left.select(
        F.col(on),
        *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns if c != on],
    )
    r = right.select(
        F.col(on).alias("__rk"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns if c != on],
    )
    lts, rts = f"{left_prefix}{left_ts}", f"{right_prefix}{right_ts}"
    cond = (
        (F.col(on) == F.col("__rk"))
        & (F.col(rts) <= F.col(lts))
        & (F.col(rts) >= F.col(lts) - F.expr(f"INTERVAL {interval}"))
    )
    return l.join(r, cond, how).drop("__rk")
