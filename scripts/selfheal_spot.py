#!/usr/bin/env python
"""Armed-maintainer overhead at 10M vectors (round 10, X53c/q135's
shape): the self-healing stream pays a drift measurement on EVERY
micro-batch — is the monitor cheap relative to the work the maintainer
already does (the epoch encode), and what does the breach path cost?

Three numbers per kind over a 10M-vector serving root and a 100k-row
micro-batch (a generous 1-minute-trigger ingest slice):
- drift_check_s: index_drift_stats on the batch vs the serving
  artifacts (sq8: one codegen HOF aggregate; ivfpq: one V@C.T GEMM per
  Arrow batch) — the per-batch cost of ARMING the maintainer.
- epoch_encode_s: write_serving_epoch for the same batch — the cost
  the maintainer pays anyway per batch.
- rebuild_s: the breach path (x3-drifted batch through
  rebuild_if_drifted) — the full corpus retrain THAT trigger pays,
  which is the point of the policy: rebuilds happen when measured
  drift says the artifacts are stale, not on a timer.

Usage: python scripts/selfheal_spot.py [fixture_dir] [kind] [batch_rows]
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kfai_pipeline_spark.operators.index_lifecycle import (  # noqa: E402
    init_serving_index,
    rebuild_if_drifted,
    serving_index_path,
    serving_version,
    write_serving_epoch,
)
from kfai_pipeline_spark.operators.dedup import CacheScope  # noqa: E402
from kfai_pipeline_spark.operators.similarity import (  # noqa: E402
    index_drift_stats,
)
from kfai_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else "bench_vec10m"
    kind = sys.argv[2] if len(sys.argv) > 2 else "sq8"
    batch_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    spark = get_spark()
    scratch = tempfile.mkdtemp(prefix="selfheal_spot_")
    out: dict = {"metric": "vec10m_selfheal_spot", "kind": kind,
                 "batch_rows": batch_rows}
    try:
        vec = spark.read.parquet(f"{fixture}/embeddings.parquet").select(
            F.col("vec_id").alias("doc_id"), "embedding"
        )
        # seed the serving root from everything EXCEPT the batch slice
        seed = vec.where(F.col("doc_id") >= batch_rows)
        batch = vec.where(F.col("doc_id") < batch_rows)
        out["n_seed"] = seed.count()
        root = f"{scratch}/root"
        t0 = time.perf_counter()
        init_serving_index(
            seed, root, kind=kind, id_col="doc_id", n_clusters=32,
        )
        out["init_build_s"] = round(time.perf_counter() - t0, 1)
        vpath = serving_index_path(spark, root)

        # the per-batch monitor cost (fresh batch, same distribution)
        scope = CacheScope()
        t0 = time.perf_counter()
        stats = index_drift_stats(
            batch, vpath, kind=kind, id_col="doc_id", scope=scope
        ).collect()[0].asDict()
        out["drift_check_s"] = round(time.perf_counter() - t0, 2)
        scope.release()
        out["fresh_stats"] = {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in stats.items()
        }

        # the work the maintainer pays anyway: one epoch encode
        t0 = time.perf_counter()
        write_serving_epoch(batch, root, 0, kind=kind, id_col="doc_id")
        out["epoch_encode_s"] = round(time.perf_counter() - t0, 2)
        out["monitor_over_encode"] = round(
            out["drift_check_s"] / max(out["epoch_encode_s"], 1e-9), 3
        )

        # the breach path: a x3-drifted batch through the policy
        drifted = batch.select(
            "doc_id",
            F.transform(
                F.col("embedding").cast("array<double>"), lambda x: x * 3.0
            ).alias("embedding"),
        )
        kw = {"min_p10_cos": 1.1} if kind == "ivfpq" else {}
        t0 = time.perf_counter()
        res = rebuild_if_drifted(
            lambda: vec, drifted, root, kind=kind, id_col="doc_id",
            n_clusters=32, routing_sample_mod=100, **kw,
        )
        out["rebuild_s"] = round(time.perf_counter() - t0, 1)
        out["rebuilt"] = res["rebuilt"]
        out["serving_version"] = serving_version(spark, root)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
