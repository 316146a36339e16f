"""Sessionization (gaps-and-islands) — batch form of session windows.

The reference has no session semantics; declared for engine completeness
(SURVEY.md §2.10, Q25). The streaming twin is
``F.session_window(ts, gap)`` (see streaming/windows.py).

Scale: one shuffle on the session key for the window, one more for the
per-session aggregate. Both partition by ``key_col`` so a 1000-executor
run distributes by user; skewed users are bounded by per-user event
counts, not total volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    tiebreak_cols: list[str] | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-key session id; a new session starts when the gap to
    the previous event exceeds ``gap_seconds``.

    Timestamps compare at full (sub-second) precision via
    ``epoch_seconds_fn`` — the NTZ-safe twin of SQL ``epoch(ts)``.
    """
    from kfai_pipeline_spark.functions.datetime_fns import epoch_seconds_fn

    secs = epoch_seconds_fn(df, ts_col)
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_ts: Column = F.lag(F.col(ts_col)).over(w)
    gap = secs(F.col(ts_col)) - secs(prev_ts)
    is_new = F.when(prev_ts.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key session count and mean session length (seconds, 2dp)."""
    from kfai_pipeline_spark.functions.datetime_fns import epoch_seconds_fn

    secs = epoch_seconds_fn(df, ts_col)
    sess = sessionize(df, key_col, ts_col, gap_seconds, tiebreak_cols)
    per_session = sess.groupBy(key_col, "session_id").agg(
        (F.max(secs(F.col(ts_col))) - F.min(secs(F.col(ts_col)))).alias("session_len")
    )
    return (
        per_session.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(F.avg("session_len"), 2).alias("avg_len"),
        )
        .orderBy(key_col)
    )
