"""Custom stateful streaming operator (§2.10): terminator-aware
sessionization via ``applyInPandasWithState``.

Built-in ``session_window`` closes sessions on inactivity gaps only.
Real clickstream sessions ALSO close on an explicit terminal event (a
purchase, a logout): the terminator belongs to the session it ends, and
the next event starts a fresh session regardless of how soon it
arrives. That rule needs custom state — exactly the
``applyInPandasWithState`` use case.

Semantics (both arms):
  - events order by (ts, tiebreaks) per key;
  - a session BREAKS before event i when the gap to event i-1 exceeds
    ``gap_seconds`` OR event i-1 was a terminator;
  - output one row per closed session: (key, start_s, end_s, n_events).

The batch twin (:func:`sessionize_terminator_batch`) is plain window
functions — SQL-expressible, so the driver hash-checks it (q54) — and
the streaming arm is parity-tested against it on Trigger.AvailableNow.

State sizing at 100 TB: one (start, last_ts, n) triple per live key —
bytes per user, bounded by the event-time timeout (watermark + gap), so
state never grows with history, only with concurrent-active keys.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

SESSION_SCHEMA_TEMPLATE = [
    StructField("start_s", DoubleType()),
    StructField("end_s", DoubleType()),
    StructField("n_events", LongType()),
]

_STATE_SCHEMA = StructType(
    [
        StructField("start_s", DoubleType()),
        StructField("last_s", DoubleType()),
        StructField("n_events", LongType()),
    ]
)


def sessionize_terminator_batch(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    terminator: str = "purchase",
    gap_seconds: float = 1800.0,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Batch arm: gaps-and-islands with the extra terminator break rule.
    One shuffle on the key (window), then a per-session aggregate."""
    from kfai_pipeline_spark.functions.datetime_fns import epoch_seconds_fn

    secs = epoch_seconds_fn(df, ts_col)
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_ts: Column = F.lag(F.col(ts_col)).over(w)
    prev_ev: Column = F.lag(F.col(event_col)).over(w)
    gap = secs(F.col(ts_col)) - secs(prev_ts)
    is_new = F.when(
        prev_ts.isNull() | (gap > gap_seconds) | (prev_ev == terminator), 1
    ).otherwise(0)
    sess = df.withColumn(
        "__sid", F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy(key_col, "__sid").agg(
        F.min(secs(F.col(ts_col))).alias("start_s"),
        F.max(secs(F.col(ts_col))).alias("end_s"),
        F.count(F.lit(1)).alias("n_events"),
    ).drop("__sid")


def sessionize_terminator_stream(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    terminator: str = "purchase",
    gap_seconds: float = 1800.0,
    watermark: str = "10 minutes",
    key_type: str = "long",
) -> DataFrame:
    """Streaming arm: per-key custom state via ``applyInPandasWithState``.

    Closed sessions emit as they close (terminator or in-batch gap);
    sessions left open emit when the event-time timeout fires — the
    watermark passing ``last_ts + gap``. State is one (start, last, n)
    triple per live key.
    """
    import pandas as pd

    out_schema = StructType(
        [StructField(key_col, df.schema[key_col].dataType)] + SESSION_SCHEMA_TEMPLATE
    )

    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        closed: list[tuple[Any, float, float, int]] = []
        k = key[0]

        if state.hasTimedOut:
            if state.exists:
                start_s, last_s, n = state.get
                closed.append((k, start_s, last_s, int(n)))
            state.remove()
            yield pd.DataFrame(closed, columns=[key_col, "start_s", "end_s", "n_events"])
            return

        start_s, last_s, n = state.get if state.exists else (None, None, 0)
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values([ts_col, event_col])
        for ts, ev in zip(rows[ts_col], rows[event_col]):
            s = ts.timestamp() if hasattr(ts, "timestamp") else float(ts)
            if start_s is not None and s - last_s > gap_seconds:
                closed.append((k, start_s, last_s, int(n)))
                start_s, last_s, n = None, None, 0
            if start_s is None:
                start_s = s
            last_s, n = s, n + 1
            if ev == terminator:
                closed.append((k, start_s, last_s, int(n)))
                start_s, last_s, n = None, None, 0
        if start_s is not None:
            state.update((start_s, last_s, n))
            # event-time timeout: fires once the watermark passes the gap
            state.setTimeoutTimestamp(int((last_s + gap_seconds) * 1000) + 1)
        elif state.exists:
            state.remove()
        yield pd.DataFrame(closed, columns=[key_col, "start_s", "end_s", "n_events"])

    from kfai_pipeline_spark.streaming.event_time import as_event_time

    return (
        as_event_time(df, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
