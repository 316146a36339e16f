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


def _bucketed_context(
    ordered: DataFrame, frame_us: int, bucket_seconds: float
) -> tuple[DataFrame, list]:
    """Salt-by-time scaffolding for the hot-key arm (round-7 skew
    sweep): duplicate every row into its own time bucket AND the next
    one (as frame CONTEXT), so a trailing RANGE frame of width
    ``frame_us`` is always fully contained in one (key, bucket)
    partition — ``bucket >= duration`` guarantees the frame reaches at
    most one bucket back. The window can then partition on
    (key, __bkt): a hot key with 10^8 events splits across its time
    buckets instead of serializing into ONE WindowExec task. Exact
    semantics; costs one map-side 2x row duplication (explode, NOT a
    union — a union would re-execute the upstream subplan twice).
    Returns (augmented frame with __bkt/__ctx, partition cols).
    Callers window over it, then drop ``__ctx`` rows — context copies
    exist only to be *visible* to frames, their own scores are
    recomputed (correctly) in their home bucket."""
    bucket_us = int(round(bucket_seconds * 1_000_000))
    if bucket_us < frame_us:
        raise ValueError(
            f"bucket_seconds ({bucket_seconds}) must be >= the frame "
            "duration — a smaller bucket would cut frames off mid-window"
        )
    bucket = F.floor(F.col("__roll_us") / F.lit(bucket_us))
    both = (
        ordered.withColumn("__off", F.explode(F.array(F.lit(0), F.lit(1))))
        # a NULL ts buckets to NULL, so its context copy would land in
        # the SAME (key, NULL) partition as its own copy and the range
        # frame would see the row twice — keep only the own copy there
        .where((F.col("__off") == 0) | F.col("__roll_us").isNotNull())
        .select(
            "*",
            (bucket + F.col("__off")).alias("__bkt"),
            (F.col("__off") == 1).alias("__ctx"),
        )
    )
    return both, ["__bkt"]


def rolling_time_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    duration_seconds: float,
    out_count: str = "roll_n",
    out_sum: str = "roll_sum",
    bucket_seconds: float | None = None,
) -> DataFrame:
    """Append trailing-interval count and sum per key: for each row,
    aggregate all rows of the same key with ``ts`` in
    ``[row.ts - duration, row.ts]`` (inclusive both ends, matching the
    SQL RANGE-INTERVAL frame).

    ``bucket_seconds`` (>= ``duration_seconds``) enables the exact
    salt-by-time arm for HOT keys: the window partitions on
    (key, time-bucket) with the previous bucket's rows duplicated in
    as frame context, so one bot user with 10^8 events parallelizes
    across its buckets instead of sorting in one task (see
    :func:`_bucketed_context`; measured crossover in BASELINE.md §5o).
    Default (None) keeps the single-window plan — right whenever
    per-key volume fits one task comfortably."""
    micros = epoch_micros_fn(df, ts_col)
    frame_us = int(round(duration_seconds * 1_000_000))
    # Materialize the ordering key once and express both aggregates over
    # the SAME window spec in one select — Spark then plans a single
    # Window operator (one sort per partition) instead of two stacked
    # ones with independent ordering expressions.
    ordered = df.withColumn("__roll_us", micros(F.col(ts_col)))
    part = [key_col]
    if bucket_seconds is not None:
        ordered, extra = _bucketed_context(ordered, frame_us, bucket_seconds)
        part += extra
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col("__roll_us"))
        .rangeBetween(-frame_us, 0)
    )
    out = ordered.select(
        *df.columns,
        *(["__ctx"] if bucket_seconds is not None else []),
        F.count(F.lit(1)).over(w).alias(out_count),
        F.sum(value_col).over(w).alias(out_sum),
    )
    if bucket_seconds is not None:
        out = out.where(~F.col("__ctx")).drop("__ctx")
    return out


def rolling_zscore(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    duration_seconds: float,
    min_points: int = 3,
    z_threshold: float = 2.0,
    bucket_seconds: float | None = None,
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

    ``bucket_seconds``: same exact hot-key salt-by-time arm as
    :func:`rolling_time_agg` (partition on (key, time-bucket) with
    previous-bucket context rows; BASELINE.md §5o).
    """
    micros = epoch_micros_fn(df, ts_col)
    frame_us = int(round(duration_seconds * 1_000_000))
    ordered = df.withColumn("__roll_us", micros(F.col(ts_col)))
    part = [key_col]
    if bucket_seconds is not None:
        ordered, extra = _bucketed_context(ordered, frame_us, bucket_seconds)
        part += extra
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col("__roll_us"))
        .rangeBetween(-frame_us, 0)
    )
    n = F.count(F.lit(1)).over(w)
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    z = F.when(
        (n >= min_points) & (std > 0), (F.col(value_col) - mean) / std
    )
    out = ordered.select(
        *df.columns,
        *(["__ctx"] if bucket_seconds is not None else []),
        F.round(mean, 4).alias("roll_mean"),
        F.round(std, 4).alias("roll_std"),
        F.round(z, 4).alias("zscore"),
        F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("is_anomaly"),
    )
    if bucket_seconds is not None:
        out = out.where(~F.col("__ctx")).drop("__ctx")
    return out
