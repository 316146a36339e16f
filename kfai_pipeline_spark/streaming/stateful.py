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
    ArrayType,
    BooleanType,
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


_ZSCORE_STATE_SCHEMA = StructType(
    [
        StructField("ts_buf", ArrayType(DoubleType())),
        StructField("val_buf", ArrayType(DoubleType())),
    ]
)


def rolling_zscore_stream(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    duration_seconds: float = 3600.0,
    min_points: int = 3,
    z_threshold: float = 2.0,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of :func:`operators.rolling.rolling_zscore`
    (X23b): per-key trailing-window anomaly scores with custom state.

    State per live key = the (ts, value) pairs inside the newest
    event's trailing window — bounded by ``duration_seconds`` worth of
    events, evicted as the frame slides (deque, O(1) per eviction),
    with an event-time timeout (watermark past last_ts + duration)
    clearing idle keys entirely. Frame arithmetic matches the batch
    arm exactly: INTEGER epoch-micros bounds (inclusive both ends —
    float seconds could evict a boundary-exact peer the batch RANGE
    frame keeps), row-count gating on ALL rows, statistics over the
    non-NULL values only (NULL values ride the frame without
    poisoning mean/std, like ``avg``/``stddev_samp``).

    Tie semantics: equal-timestamp events WITHIN a micro-batch score
    against their full tie group (the batch RANGE frame's peer rule).
    An equal-or-older timestamp arriving in a LATER micro-batch scores
    against the accumulated frame without retracting already-emitted
    peers — append-mode streams cannot retract, so exact batch parity
    holds when each key's ties share a batch (the AvailableNow parity
    test's shape); the watermark bounds how late that can happen.

    Emits one row per event: (key, id, ts_s, value, roll_mean,
    roll_std, zscore, is_anomaly) — rounded like the batch arm, parity
    asserted in test_streaming.
    """
    import math
    from collections import deque

    import pandas as pd

    out_schema = StructType(
        [
            StructField(key_col, df.schema[key_col].dataType),
            StructField(id_col, df.schema[id_col].dataType),
            StructField("ts_s", DoubleType()),
            StructField(value_col, DoubleType()),
            StructField("roll_mean", DoubleType()),
            StructField("roll_std", DoubleType()),
            StructField("zscore", DoubleType()),
            StructField("is_anomaly", BooleanType()),
        ]
    )
    cols = [key_col, id_col, "ts_s", value_col, "roll_mean", "roll_std", "zscore", "is_anomaly"]
    frame_us = int(round(duration_seconds * 1_000_000))

    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        k = key[0]
        if state.exists:
            ts_buf = deque(int(t) for t in state.get[0])
            val_buf = deque(state.get[1])  # NaN marks a NULL value
        else:
            ts_buf, val_buf = deque(), deque()
        rows = pd.concat(list(pdfs)).sort_values([ts_col, id_col])
        out: list[tuple] = []
        # exact integer micros from the ns-resolution pandas timestamps
        micros = [
            int(t.value) // 1000 if hasattr(t, "value") else int(round(float(t) * 1e6))
            for t in rows[ts_col]
        ]
        idx = list(zip(micros, rows[id_col], rows[value_col]))
        i = 0
        while i < len(idx):
            us = idx[i][0]
            if ts_buf and us < ts_buf[-1]:
                i += 1  # too late to retro-insert; watermark bounds this
                continue
            # absorb the whole equal-ts tie group before scoring any of
            # it — the batch RANGE frame includes all peers
            group = []
            while i < len(idx) and idx[i][0] == us:
                v = idx[i][2]
                vf = float("nan") if v is None or (isinstance(v, float) and v != v) else float(v)
                group.append((idx[i][1], vf))
                ts_buf.append(us)
                val_buf.append(vf)
                i += 1
            lo = us - frame_us
            while ts_buf and ts_buf[0] < lo:
                ts_buf.popleft()
                val_buf.popleft()
            n_rows = len(ts_buf)  # batch gates on count(*), NULLs included
            vals = [x for x in val_buf if x == x]
            mean = sum(vals) / len(vals) if vals else None
            var = (
                sum((x - mean) ** 2 for x in vals) / (len(vals) - 1)
                if len(vals) >= 2
                else None
            )
            std = math.sqrt(var) if var is not None else None
            for id_, vf in group:
                z = (
                    (vf - mean) / std
                    if n_rows >= min_points
                    and std is not None
                    and std > 0
                    and vf == vf
                    else None
                )
                out.append(
                    (
                        k,
                        id_,
                        us / 1e6,
                        None if vf != vf else vf,
                        round(mean, 4) if mean is not None else None,
                        round(std, 4) if std is not None else None,
                        round(z, 4) if z is not None else None,
                        bool(z is not None and abs(z) > z_threshold),
                    )
                )
        state.update((list(map(float, ts_buf)), list(val_buf)))
        state.setTimeoutTimestamp(int(ts_buf[-1] // 1000 + duration_seconds * 1000) + 1)
        yield pd.DataFrame(out, columns=cols)

    from kfai_pipeline_spark.streaming.event_time import as_event_time

    return (
        as_event_time(df, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=_ZSCORE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
