"""Time-range rolling aggregates (W-family completion): per-key
sliding aggregates over a trailing time interval, the batch twin of
SQL's ``RANGE BETWEEN INTERVAL x PRECEDING AND CURRENT ROW`` frame.

The reference has no rolling-interval analytics; declared for engine
completeness alongside the ROW-frame windows (SURVEY.md §2.5, W5) —
ROW frames count events, RANGE frames count *time*, and time-based
trailing metrics (events-per-user-per-hour, rolling spend) need the
latter.

Spark form: one shuffle on the partition key, then WindowExec walks
each sorted run with a moving frame — no self-join, so cost is
O(rows × frame size) worst case and O(rows) for the common
monotone-frame path. The relational alternative (a range self-join
then re-aggregate) duplicates every row once per window hit and
shuffles twice; at 100 TB the window form wins on both counts.

The ordering key is integer epoch microseconds (``epoch_micros_fn``),
which is NTZ-safe and lets the frame bound be an exact long offset —
``rangeBetween`` over a timestamp column would reject interval
offsets from the Python API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kfai_pipeline_spark.functions.datetime_fns import epoch_micros_fn


def rolling_time_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    duration_seconds: float,
    out_count: str = "roll_n",
    out_sum: str = "roll_sum",
) -> DataFrame:
    """Append trailing-interval count and sum per key: for each row,
    aggregate all rows of the same key with ``ts`` in
    ``[row.ts - duration, row.ts]`` (inclusive both ends, matching the
    SQL RANGE-INTERVAL frame)."""
    micros = epoch_micros_fn(df, ts_col)
    frame_us = int(round(duration_seconds * 1_000_000))
    # Materialize the ordering key once and express both aggregates over
    # the SAME window spec in one select — Spark then plans a single
    # Window operator (one sort per partition) instead of two stacked
    # ones with independent ordering expressions.
    ordered = df.withColumn("__roll_us", micros(F.col(ts_col)))
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("__roll_us"))
        .rangeBetween(-frame_us, 0)
    )
    return ordered.select(
        *df.columns,
        F.count(F.lit(1)).over(w).alias(out_count),
        F.sum(value_col).over(w).alias(out_sum),
    )


def rolling_zscore(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    duration_seconds: float,
    min_points: int = 3,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Trailing-window anomaly score per key: z-score of each value
    against the mean/stddev of the same key's values in
    ``[ts - duration, ts]`` (inclusive, current row included — the
    plain RANGE-INTERVAL frame, so the score is "how unusual is this
    event vs its own recent context"). Rows whose frame holds fewer
    than ``min_points`` values get NULL score and ``false`` flag —
    a 1-point frame would always be "normal" and a 2-point frame makes
    the sample stddev degenerate.

    This is the batch twin of streaming metric-anomaly detection
    (per-device/per-user trailing baselines); same single-shuffle
    Window shape as :func:`rolling_time_agg` — both aggregates and the
    z arithmetic ride ONE Window operator, no self-join, no second
    sort. Emits ``roll_mean``/``roll_std`` (ROUND 4) and
    ``zscore`` (ROUND 4) with ``is_anomaly = |z| > z_threshold``.
    """
    micros = epoch_micros_fn(df, ts_col)
    frame_us = int(round(duration_seconds * 1_000_000))
    ordered = df.withColumn("__roll_us", micros(F.col(ts_col)))
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("__roll_us"))
        .rangeBetween(-frame_us, 0)
    )
    n = F.count(F.lit(1)).over(w)
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    z = F.when(
        (n >= min_points) & (std > 0), (F.col(value_col) - mean) / std
    )
    return ordered.select(
        *df.columns,
        F.round(mean, 4).alias("roll_mean"),
        F.round(std, 4).alias("roll_std"),
        F.round(z, 4).alias("zscore"),
        F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("is_anomaly"),
    )
