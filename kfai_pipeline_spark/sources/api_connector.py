"""Batched external-API connector (S7/S8/I4): partition-local batching,
rate limiting, and status-typed results with dead-letter routing.

Generalizes the reference's YouTube metadata fetch (50-ID batches,
ref youtube.py:44-81) and transcript fetch (tri-state result: rows |
permanent-skip | transient-failure, ref transcript.py:32-89): the
``fetch_fn`` receives a batch of keys and returns per-key
``(status, payload)``; everything else — batching, per-partition
throttling, retry of transients — is generic.

Scale shape: ``mapInPandas`` keeps each executor's HTTP client warm
across batches; rate limiting is per-partition (I4 — the reference
sleeps 2-4 s per item, here ``min_interval_s`` per batch); keys should
be ``repartition(n_partitions)``-ed to match the external service's
aggregate rate budget. No shuffle, no driver round-trips.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

# status values (ref transcript.py sentinel mapping):
#   ok        -> payload rows
#   skip      -> permanent failure, goes to the skip list (I3)
#   transient -> retryable; stays out of the skip list (ref returns None)
STATUS_OK = "ok"
STATUS_SKIP = "skip"
STATUS_TRANSIENT = "transient"

FetchFn = Callable[[list[str]], list[tuple[str, str | None]]]


def fetch_batched(
    df: DataFrame,
    fetch_fn: FetchFn,
    key_col: str = "video_id",
    batch_size: int = 50,
    min_interval_s: float = 0.0,
    max_retries: int = 2,
    payload_col: str = "payload",
) -> DataFrame:
    """Run ``fetch_fn`` over ``key_col`` in batches of ``batch_size``.

    Output: input columns + ``status`` + ``payload_col`` (JSON string or
    None). Transient statuses are retried up to ``max_retries`` within
    the partition before being emitted as transient."""
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("status", StringType()), StructField(payload_col, StringType())]
    )
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last_call = 0.0
        for pdf in batches:
            statuses: list[str] = [""] * len(pdf)
            payloads: list[str | None] = [None] * len(pdf)
            keys = pdf[key_col].tolist()
            for lo in range(0, len(keys), batch_size):
                idxs = list(range(lo, min(lo + batch_size, len(keys))))
                pending = idxs
                for attempt in range(max_retries + 1):
                    if min_interval_s > 0:
                        wait = min_interval_s - (time.monotonic() - last_call)
                        if wait > 0:
                            time.sleep(wait)
                        last_call = time.monotonic()
                    results = fetch_fn([keys[i] for i in pending])
                    retry = []
                    for i, (status, payload) in zip(pending, results):
                        if status == STATUS_TRANSIENT and attempt < max_retries:
                            retry.append(i)
                        else:
                            statuses[i] = status
                            payloads[i] = payload
                    if not retry:
                        break
                    pending = retry
            pdf = pdf.copy()
            pdf["status"] = statuses
            pdf[payload_col] = pd.Series(payloads, index=pdf.index, dtype=object)
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def route_statuses(df: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(ok, skip, transient) split — skip feeds the skip-list sidecar
    (I3), transient re-enters the next incremental run (I1)."""
    return (
        df.where(F.col("status") == STATUS_OK),
        df.where(F.col("status") == STATUS_SKIP),
        df.where(F.col("status") == STATUS_TRANSIENT),
    )
