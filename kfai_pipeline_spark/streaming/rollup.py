"""Exactly-once incremental rollup maintenance over a stream — the
streaming twin of ``pipeline.merge_agg_snapshots`` (I7).

The pattern: each micro-batch is aggregated to key grain, merged onto
the previous snapshot VERSION, and written as a NEW immutable version
directory named by the batch id. Replay safety comes from version
monotonicity, not transactions: a replayed batch sees that its version
already exists (``latest >= batch_id``) and skips — the same
(content, batch_id)-pure contract as ``sinks.write_stream_foreach_batch``.
This is how you keep a 100 TB-scale "counts per key, ever" table fresh
without ever rescanning history: per trigger, the work is
O(batch + |snapshot keys|), and the snapshot itself is key-grain
parquet any batch job can read.

Mirrors the reference's resume story (ref build_vector_store.py:38-48
re-derives "what's done" from the materialized store, then adds only
the delta) — lifted from per-row membership to per-key aggregates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from kfai_pipeline_spark.operators.pipeline import merge_agg_snapshots

_LATEST = "_LATEST"


def _read_latest_version(snapshot_dir: str) -> int:
    path = os.path.join(snapshot_dir, _LATEST)
    if not os.path.exists(path):
        return -1
    with open(path, encoding="utf-8") as f:
        return int(f.read().strip())


def _write_latest_version(snapshot_dir: str, version: int) -> None:
    path = os.path.join(snapshot_dir, _LATEST)
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(str(version))
    os.replace(tmp, path)  # atomic pointer swap (POSIX)


def read_rollup_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame:
    """Latest committed snapshot (empty key-grain frame when none)."""
    v = _read_latest_version(snapshot_dir)
    if v < 0:
        from pyspark.sql.types import StructType

        return spark.createDataFrame([], StructType([]))
    return spark.read.parquet(os.path.join(snapshot_dir, f"v_{v}"))


def maintain_rollup(
    stream_df: DataFrame,
    agg_fn,
    keys: list[str],
    merge: dict[str, str],
    snapshot_dir: str,
    checkpoint_dir: str,
):
    """Start an AvailableNow foreachBatch query that folds each
    micro-batch into a versioned key-grain rollup under
    ``snapshot_dir``. ``agg_fn(batch_df) -> DataFrame`` aggregates a
    batch to key grain with exactly ``keys + merge.keys()`` columns;
    ``merge`` maps each measure to its mergeable combine fn
    (``sum``/``min``/``max``). Returns the started query.

    Exactly-once: version = batch_id; a replayed batch finds
    ``latest >= batch_id`` and no-ops, so a crash between the parquet
    write and the checkpoint commit cannot double-count.
    """
    from kfai_pipeline_spark.streaming.sinks import write_stream_foreach_batch

    os.makedirs(snapshot_dir, exist_ok=True)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        apply_batch(batch_df, batch_id, agg_fn, keys, merge, snapshot_dir)

    return write_stream_foreach_batch(stream_df, fold, checkpoint_dir)


def apply_batch(
    batch_df: DataFrame,
    batch_id: int,
    agg_fn,
    keys: list[str],
    merge: dict[str, str],
    snapshot_dir: str,
) -> bool:
    """One fold step (exposed so the replay guard is directly
    testable): merge ``agg_fn(batch_df)`` onto the latest snapshot and
    commit version ``batch_id``. Returns False (no-op) when
    ``batch_id`` is already committed — the replayed-epoch case."""
    latest = _read_latest_version(snapshot_dir)
    if latest >= batch_id:
        return False  # replayed epoch — version already committed
    spark = batch_df.sparkSession
    delta = agg_fn(batch_df)
    if latest < 0:
        merged = delta
    else:
        prev = spark.read.parquet(os.path.join(snapshot_dir, f"v_{latest}"))
        merged = merge_agg_snapshots(prev, delta, keys, merge)
    merged.write.mode("overwrite").parquet(
        os.path.join(snapshot_dir, f"v_{batch_id}")
    )
    _write_latest_version(snapshot_dir, batch_id)
    return True
