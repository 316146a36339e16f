"""JVM bulk arm for streaming trailing z-scores (X23b backfill).

:func:`stateful.rolling_zscore_stream` keeps exact per-event state in
``applyInPandasWithState`` — the right shape for CONTINUOUS low-latency
emission, but the Arrow/pandas per-key boundary caps it at ~140-180k
events/s (BASELINE.md §5f). Backfilling months of history through that
boundary wastes the cluster: the scoring itself is a plain RANGE-frame
window the JVM runs at batch speed.

This module is the rollup-pattern answer (streaming/rollup.py): a
``foreachBatch`` fold that scores each micro-batch with the BATCH
operator (:func:`operators.rolling.rolling_zscore` — one Window op,
whole-stage codegen, no Python) against a small per-key TAIL snapshot
(each key's rows inside the trailing ``duration`` of its newest event),
then advances the snapshot. Per trigger the work is
O(batch + |tail|) entirely JVM-side; the tail is bounded by
``duration × per-key rate``, independent of history length.

Exactly-once follows rollup's version-monotonicity contract: state
version = ``start_version + batch_id``; a replayed batch finds
``latest >= version`` and no-ops; outputs land in per-batch
directories rewritten idempotently (overwrite) before the state
version commits, so a crash between the two replays into the same
content.

Parity contract (asserted in tests/test_streaming.py): when each key's
event time is non-decreasing ACROSS micro-batches (any order within a
batch — the frame is computed over the union), the concatenated
outputs are row-identical to running ``rolling_zscore`` over the whole
history in one batch. An event older than its key's tail horizon
scores against the surviving tail only — the same append-mode
boundary the custom-state arm draws (it skips too-late events); the
source's watermark bounds how late that can happen.

Division of labour: THIS arm for high-rate backfill/bulk drains, the
custom-state arm for low-latency continuous scoring; both emit the
same schema, so a pipeline can drain history here and hand the
checkpoint to the stateful query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kfai_pipeline_spark.functions.datetime_fns import epoch_micros_fn
from kfai_pipeline_spark.operators.rolling import rolling_zscore
from kfai_pipeline_spark.streaming.rollup import (
    _read_latest_version,
    _write_latest_version,
)
from kfai_pipeline_spark.streaming.sinks import write_stream_foreach_batch

_NEW = "__zb_new"


def _score_batch_against_tail(
    batch_df: DataFrame,
    tail_df: DataFrame | None,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    duration_seconds: float,
    min_points: int,
    z_threshold: float,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One fold step, JVM only: returns (scored NEW rows, next tail,
    persisted union handle).

    The union feeds TWO actions (the output write and the tail write),
    so it is persisted HERE and the third return value hands the caller
    the handle to unpersist after both writes — without it each write
    would re-read the batch source and the tail parquet and re-run the
    union."""
    from pyspark import StorageLevel

    cols = [key_col, id_col, ts_col, value_col]
    batch = batch_df.select(*cols).withColumn(_NEW, F.lit(True))
    union = (
        batch
        if tail_df is None
        else tail_df.select(*cols).withColumn(_NEW, F.lit(False)).unionByName(batch)
    )
    union = union.persist(StorageLevel.MEMORY_AND_DISK)
    scored = rolling_zscore(
        union, key_col, ts_col, value_col, duration_seconds, min_points, z_threshold
    )
    out = scored.where(F.col(_NEW)).drop(_NEW)

    micros = epoch_micros_fn(union, ts_col)
    frame_us = int(round(duration_seconds * 1_000_000))
    w = Window.partitionBy(key_col)
    tail = (
        union.withColumn("__us", micros(F.col(ts_col)))
        .withColumn("__max_us", F.max("__us").over(w))
        .where(F.col("__us") >= F.col("__max_us") - F.lit(frame_us))
        .select(*cols)
    )
    return out, tail, union


def rolling_zscore_backfill(
    stream_df: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    duration_seconds: float = 3600.0,
    min_points: int = 3,
    z_threshold: float = 2.0,
    start_version: int = 0,
):
    """Start an AvailableNow query that scores the stream with the
    batch RANGE-frame kernel per micro-batch (see module docstring).

    Outputs land as parquet under ``out_dir/batch_<id>/`` (one
    directory per epoch, ``_SUCCESS``-gated, rewritten in place on
    replay); the per-key tail snapshot versions under ``state_dir``
    exactly like the rollup maintainer's. As there, resuming an
    existing ``state_dir`` under a FRESH checkpoint needs
    ``start_version = latest + 1``."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        version = start_version + batch_id
        latest = _read_latest_version(spark, state_dir)
        if latest >= version:
            return  # replayed epoch — output and state already committed
        tail = (
            spark.read.parquet(f"{state_dir}/v_{latest}") if latest >= 0 else None
        )
        out, new_tail, union = _score_batch_against_tail(
            batch_df, tail, key_col, ts_col, value_col, id_col,
            duration_seconds, min_points, z_threshold,
        )
        try:
            out.write.mode("overwrite").parquet(f"{out_dir}/batch_{batch_id}")
            new_tail.write.mode("overwrite").parquet(f"{state_dir}/v_{version}")
        finally:
            union.unpersist()
        _write_latest_version(spark, state_dir, version)

    return write_stream_foreach_batch(stream_df, fold, checkpoint_dir)
