"""foreachBatch sink adapter: exactly-once streaming writes into
non-transactional stores (JDBC/pgvector — the streaming twin of
sources/jdbc.py's batch sinks, ref build_vector_store.py's upsert
loop).

Spark's file sink is exactly-once on its own (commit log); everything
else gets at-least-once batch replays after a failure. The standard
recipe is: route each micro-batch through ``foreachBatch`` and make the
write a pure function of (batch content, batch_id) — an upsert keyed on
the row key, or a delete-then-insert scoped to the batch_id — so a
replayed batch overwrites itself instead of duplicating.

The adapter keeps that contract testable without a database: the
injected ``write_fn(df, batch_id)`` receives the SAME (content,
batch_id) pairs on replay, which the test asserts by draining one
checkpoint twice.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def write_stream_foreach_batch(
    stream_df: DataFrame,
    write_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Run a stream through ``foreachBatch(write_fn)`` with checkpointed
    batch ids. Returns the started query (caller awaits/stops).

    ``write_fn`` MUST be idempotent per (key, batch_id) — e.g. a JDBC
    ``INSERT ... ON CONFLICT (key) DO UPDATE`` (sources/jdbc.py builds
    that statement) or a partition overwrite keyed on batch_id. The
    checkpoint guarantees a replayed epoch presents the same batch_id,
    which is what makes the overwrite safe.
    """
    writer = stream_df.writeStream.foreachBatch(write_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
