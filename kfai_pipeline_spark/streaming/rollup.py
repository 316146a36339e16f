"""Exactly-once incremental rollup maintenance over a stream — the
streaming twin of ``pipeline.merge_agg_snapshots`` (I7).

The pattern: each micro-batch is aggregated to key grain, merged onto
the previous snapshot VERSION, and written as a NEW immutable version
directory named by the batch id. Replay safety comes from version
monotonicity, not transactions: a replayed batch sees that its version
already exists (``latest >= version``) and skips — the same
(content, batch_id)-pure contract as ``sinks.write_stream_foreach_batch``.
This is how you keep a 100 TB-scale "counts per key, ever" table fresh
without ever rescanning history: per trigger, the work is
O(batch + |snapshot keys|), and the snapshot itself is key-grain
parquet any batch job can read.

All snapshot metadata I/O (the ``_LATEST`` pointer) goes through
Spark's Hadoop FileSystem API, so ``snapshot_dir`` may live on any
filesystem the cluster can reach (``hdfs://``, ``s3a://``, local) and
a driver failover on another node still sees the committed state —
driver-local ``open()`` would silently reset history to -1 there.
The pointer swap is write-temp + delete + rename; on HDFS the window
between delete and rename is non-atomic, so the pointer is a CACHE,
not the source of truth: a reader finding no pointer recovers the
latest committed version by listing ``v_N`` directories that carry a
``_SUCCESS`` marker (the marker separates committed versions from a
version whose parquet write crashed midway). ``rename``'s boolean is
checked and raised on, so a failed swap can never pass silently.

Mirrors the reference's resume story (ref build_vector_store.py:38-48
re-derives "what's done" from the materialized store, then adds only
the delta) — lifted from per-row membership to per-key aggregates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from kfai_pipeline_spark.operators.pipeline import merge_agg_snapshots

_LATEST = "_LATEST"


def _hadoop_path(spark: SparkSession, path_str: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path_str)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def _list_committed_versions(
    spark: SparkSession, snapshot_dir: str, marker: str = "_SUCCESS"
) -> list[int]:
    """Versions whose write COMPLETED (``v_N/<marker>`` exists). A
    version directory without the marker is a crashed-midway write and
    must not be treated as committed. ``marker`` defaults to parquet's
    ``_SUCCESS`` (the rollup snapshot layout); the ANN serving-index
    lifecycle passes ``_COMMITTED`` (its versions are multi-table
    directories whose parquet ``_SUCCESS`` files live in SUBdirs, so
    the version-level marker is written separately, last)."""
    fs, root, jvm = _hadoop_path(spark, snapshot_dir)
    if not fs.exists(root):
        return []
    versions: list[int] = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if not (status.isDirectory() and name.startswith("v_")):
            continue
        try:
            v = int(name[2:])
        except ValueError:
            continue
        if fs.exists(
            jvm.org.apache.hadoop.fs.Path(f"{snapshot_dir}/{name}/{marker}")
        ):
            versions.append(v)
    return sorted(versions)


def _read_pointer_raw(spark: SparkSession, snapshot_dir: str) -> int | None:
    """The ``_LATEST`` pointer's RAW integer word — no committed-marker
    validation, no listing recovery; ``None`` when the pointer is
    absent, unreadable, or garbled. Readers want the validated
    :func:`_read_latest_version`; this raw read exists for the
    maintenance force-reclaim path (round-11 advice): that path is
    about to UNCOMMIT a version, after which a validated read would
    degrade to listing recovery and return an older version — hiding
    that a racing writer's flip already points at the dir being
    reclaimed."""
    fs, p, _ = _hadoop_path(spark, f"{snapshot_dir}/{_LATEST}")
    if not fs.exists(p):
        return None
    try:
        stream = fs.open(p)
        try:
            out = bytearray()
            b = stream.read()
            while b != -1 and len(out) < 64:  # pointer: small integer
                out.append(b)
                b = stream.read()
        finally:
            stream.close()
        return int(bytes(out).decode("utf-8", errors="replace").strip())
    except Exception:
        # torn/garbled/checksum-failed pointer: the write side is
        # temp+rename, but rename is NOT atomic on every store this
        # protocol targets (object-store rename is copy+delete) — a
        # reader crossing a flip there can observe a half-written
        # pointer, and a corrupted one fails the FS checksum. The
        # pointer is only a cache; callers fall through to listing
        # recovery instead of crashing every reader (round-11).
        return None


def _read_latest_version(
    spark: SparkSession, snapshot_dir: str, marker: str = "_SUCCESS"
) -> int:
    fs, _, jvm = _hadoop_path(spark, snapshot_dir)
    v = _read_pointer_raw(spark, snapshot_dir)
    if v is not None:
        if fs.exists(
            jvm.org.apache.hadoop.fs.Path(f"{snapshot_dir}/v_{v}/{marker}")
        ):
            return v
        # a pointer at a version with no committed marker (externally
        # pruned dir, or a flip raced by maintenance) would send every
        # reader into a missing directory — recover instead
    # Pointer lost (crash between delete and rename), never written, or
    # unusable (above). The pointer is only a cache — recover from the
    # committed-version listing so a bad pointer degrades to
    # re-resolution, never to silently restarting history at -1.
    committed = _list_committed_versions(spark, snapshot_dir, marker)
    return committed[-1] if committed else -1


def _write_latest_version(spark: SparkSession, snapshot_dir: str, version: int) -> None:
    fs, p, jvm = _hadoop_path(spark, f"{snapshot_dir}/{_LATEST}")
    tmp = jvm.org.apache.hadoop.fs.Path(
        f"{snapshot_dir}/{_LATEST}.{os.getpid()}.tmp"
    )
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(str(version).encode("utf-8")))
    finally:
        out.close()
    if fs.exists(p):
        fs.delete(p, False)
    try:
        renamed = fs.rename(tmp, p)
    except Exception:
        renamed = False
    if not renamed:
        # The delete+rename swap is non-atomic: a racing writer flipping
        # to the SAME version (the idempotent-flip contract — orphan
        # repair racing the crashed writer's own resumed flip, round-13
        # advice) can land its pointer between our delete and rename,
        # making rename-onto-existing return false even though the
        # pointer state is exactly what this call intended. Re-read
        # before declaring failure.
        if _read_pointer_raw(spark, snapshot_dir) == version:
            if fs.exists(tmp):
                fs.delete(tmp, False)
            return
        raise IOError(
            f"rollup pointer swap failed: rename {tmp} -> {p} returned false; "
            f"latest committed version remains recoverable from v_* listing"
        )


def _prune_old_versions(
    spark: SparkSession, snapshot_dir: str, latest: int, retain: int
) -> None:
    """Garbage-collect snapshot versions older than the retention window
    (``retain`` committed versions ending at ``latest`` stay). Without
    this, a long-running maintenance loop grows by one full snapshot copy
    per trigger — unbounded at 100 TB scale."""
    if retain <= 0:
        return
    fs, _, jvm = _hadoop_path(spark, snapshot_dir)
    for v in _list_committed_versions(spark, snapshot_dir):
        if v <= latest - retain:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{snapshot_dir}/v_{v}"), True)


def read_rollup_snapshot(
    spark: SparkSession, snapshot_dir: str, schema=None
) -> DataFrame:
    """Latest committed snapshot. Before the first commit, returns an
    empty frame with ``schema`` (a StructType or DDL string, so
    key/measure columns still resolve for joins/merges) — or a
    zero-column frame when no schema is given."""
    v = _read_latest_version(spark, snapshot_dir)
    if v < 0:
        from pyspark.sql.types import StructType

        return spark.createDataFrame([], schema if schema is not None else StructType([]))
    return spark.read.parquet(f"{snapshot_dir}/v_{v}")


def maintain_rollup(
    stream_df: DataFrame,
    agg_fn,
    keys: list[str],
    merge: dict[str, str],
    snapshot_dir: str,
    checkpoint_dir: str,
    start_version: int = 0,
    retain_versions: int = 0,
):
    """Start an AvailableNow foreachBatch query that folds each
    micro-batch into a versioned key-grain rollup under
    ``snapshot_dir``. ``agg_fn(batch_df) -> DataFrame`` aggregates a
    batch to key grain with exactly ``keys + merge.keys()`` columns;
    ``merge`` maps each measure to its mergeable combine fn
    (``sum``/``min``/``max``). Returns the started query.

    Exactly-once: version = ``start_version + batch_id``; a replayed
    batch finds ``latest >= version`` and no-ops, so a crash between
    the parquet write and the checkpoint commit cannot double-count.
    The snapshot and checkpoint share a LIFECYCLE: batch ids restart at
    0 under a fresh checkpoint, so resuming an EXISTING snapshot with a
    new checkpoint must pass ``start_version = latest + 1`` (from
    ``_read_latest_version``) — otherwise every replayed-looking batch
    would be silently skipped.

    ``retain_versions`` bounds storage: when > 0, after each commit,
    committed versions older than the newest ``retain_versions`` are
    deleted. The DEFAULT (0) keeps every version: pruning right after a
    commit can delete a snapshot out from under an in-flight reader
    that resolved an older version, so GC is opt-in — size the window
    to cover your longest reader (versions are one trigger apart, so
    ``retain_versions`` ~ reader latency / trigger interval, plus
    slack), or run an offline sweep during a read quiesce.

    .. note:: BREAKING (round 6): the default changed from 3 to 0
       (keep everything). Callers that relied on the old implicit GC
       now accumulate one snapshot per trigger until they opt in; a
       one-time warning fires when the default is left in place and
       the version count passes ``_RETAIN_DEFAULT_WARN_ABOVE`` so the
       change is visible, not silent.
    """
    from kfai_pipeline_spark.streaming.sinks import write_stream_foreach_batch

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        apply_batch(
            batch_df,
            start_version + batch_id,
            agg_fn,
            keys,
            merge,
            snapshot_dir,
            retain_versions=retain_versions,
        )

    return write_stream_foreach_batch(stream_df, fold, checkpoint_dir)


def apply_batch(
    batch_df: DataFrame,
    version: int,
    agg_fn,
    keys: list[str],
    merge: dict[str, str],
    snapshot_dir: str,
    retain_versions: int = 0,
) -> bool:
    """One fold step (exposed so the replay guard is directly
    testable): merge ``agg_fn(batch_df)`` onto the latest snapshot and
    commit ``version``. Returns False (no-op) when ``version`` is
    already committed — the replayed-epoch case."""
    spark = batch_df.sparkSession
    latest = _read_latest_version(spark, snapshot_dir)
    if latest >= version:
        return False  # replayed epoch — version already committed
    delta = agg_fn(batch_df)
    if latest < 0:
        merged = delta
    else:
        prev = spark.read.parquet(f"{snapshot_dir}/v_{latest}")
        merged = merge_agg_snapshots(prev, delta, keys, merge)
    merged.write.mode("overwrite").parquet(f"{snapshot_dir}/v_{version}")
    _write_latest_version(spark, snapshot_dir, version)
    _prune_old_versions(spark, snapshot_dir, version, retain_versions)
    if retain_versions == 0:
        _warn_unbounded_versions_once(spark, snapshot_dir)
    return True


# one warning per (process, snapshot_dir): the round-6 default change
# (retain_versions 3 -> 0, reader-safety rationale in maintain_rollup's
# docstring) must not silently turn a long-running maintenance loop
# into unbounded snapshot growth for callers still on the old default
_RETAIN_DEFAULT_WARN_ABOVE = 50
_warned_snapshot_dirs: set[str] = set()


def _warn_unbounded_versions_once(spark: SparkSession, snapshot_dir: str) -> None:
    if snapshot_dir in _warned_snapshot_dirs:
        return
    versions = _list_committed_versions(spark, snapshot_dir)
    if len(versions) > _RETAIN_DEFAULT_WARN_ABOVE:
        import warnings

        _warned_snapshot_dirs.add(snapshot_dir)
        warnings.warn(
            f"rollup snapshot {snapshot_dir!r} holds {len(versions)} committed "
            "versions with retain_versions=0 (the keep-everything default "
            "since round 6 — it used to be 3). Set retain_versions to a "
            "window covering your longest reader, or prune offline.",
            ResourceWarning,
            stacklevel=3,
        )
