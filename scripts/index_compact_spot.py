#!/usr/bin/env python
"""Index-compaction payoff spot at 10M vectors (round 9, X52c).

Simulates the X52b steady state — an SQ8 index seeded from half the
corpus and maintained by N streamed epochs over the rest — then
measures the serving probe (sq8_topk + exact re-rank, the q121 inner
loop) over the FRAGMENTED index vs the same index after
compact_ann_index. Probes are asserted row-identical (compaction
never re-encodes). The fragmented probe's plan is a union of 1+N
member scans; the compacted one is a single scan at target-sized
files — the delta is the per-epoch plan/scan overhead a daily
maintainer accretes until its next compaction.

Usage: python scripts/index_compact_spot.py [fixture_dir] [n_epochs]
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kfai_pipeline_spark.operators.similarity import (  # noqa: E402
    _sq8_encoded,
    compact_ann_index,
    sq8_topk,
    write_sq8_index,
)
from kfai_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else "bench_vec10m"
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark()
    scratch = tempfile.mkdtemp(prefix="compact_spot_")
    out: dict = {"metric": "vec10m_compact_spot", "n_epochs": n_epochs}
    try:
        import numpy as np

        vec = spark.read.parquet(f"{fixture}/embeddings.parquet")
        out["n_vectors"] = vec.count()
        live = f"{scratch}/live"
        seed = vec.where(F.col("vec_id") % 2 == 0)
        t0 = time.perf_counter()
        write_sq8_index(seed, live)
        # N maintenance epochs: encode each odd slice against the
        # frozen stats into its own committed batch dir (exactly what
        # maintain_ann_index_stream's fold writes; done directly so the
        # spot doesn't pay streaming-trigger overhead in the build)
        srow = spark.read.parquet(f"{live}/stats").collect()[0]
        mn = np.array(srow["__mn"], dtype=np.float64)
        mx = np.array(srow["__mx"], dtype=np.float64)
        for e in range(n_epochs):
            sl = vec.where(
                (F.col("vec_id") % 2 == 1)
                & (F.col("vec_id") % (2 * n_epochs) == 2 * e + 1)
            )
            _sq8_encoded(sl, mn, mx, "embedding", "vec_id").write.mode(
                "overwrite"
            ).parquet(f"{live}/codes_batches/batch_{e}")
        out["build_s"] = round(time.perf_counter() - t0, 1)

        queries = vec.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        queries.cache().count()
        kw = dict(k=10, refine=32, vectors=vec)

        def probe(path):
            t = time.perf_counter()
            rows = sorted(
                map(tuple, sq8_topk(spark, path, queries, **kw).collect())
            )
            return round(time.perf_counter() - t, 2), rows

        # warm both paths once, then 3 timed reps each, interleaved
        frag_t, frag_rows = probe(live)
        t0 = time.perf_counter()
        stats = compact_ann_index(spark, live, f"{scratch}/opt", kind="sq8")
        out["compact_s"] = round(time.perf_counter() - t0, 1)
        out["files_before"] = stats["files_before"]
        out["files_after"] = stats["files_after"]
        comp_t, comp_rows = probe(f"{scratch}/opt")
        out["rows_identical"] = frag_rows == comp_rows
        frag, comp = [frag_t], [comp_t]
        for _ in range(3):
            t, _r = probe(live)
            frag.append(t)
            t, _r = probe(f"{scratch}/opt")
            comp.append(t)
        # median of the timed reps (skip the warm-up rep)
        out["fragmented_probe_s"] = sorted(frag[1:])[1]
        out["compacted_probe_s"] = sorted(comp[1:])[1]
        out["probe_speedup"] = round(
            out["fragmented_probe_s"] / max(out["compacted_probe_s"], 1e-9), 2
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
