#!/usr/bin/env python
"""IVF nprobe recall/latency curve at 10M vectors (companion to
vec_scale_spot.py): builds the colocated index once, then probes at
nprobe = 4/8/16/32/64 against the BLAS exact ground truth — the
operating-point table a 100 TB deployment tunes against.

Usage: python scripts/ivf_nprobe_curve.py [fixture_dir]
Prints one JSON line.
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kfai_pipeline_spark.operators import similarity as S  # noqa: E402
from kfai_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else "bench_vec10m"
    n_q, k = 20, 10
    spark = get_spark()
    scratch = tempfile.mkdtemp(prefix="ivf_curve_")
    out: dict = {"metric": "ivf_nprobe_curve", "k": k, "n_queries": n_q}

    vectors = spark.read.parquet(f"{fixture}/embeddings.parquet")
    queries = (
        vectors.where(F.col("vec_id") < n_q)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    queries.cache().count()

    def topk_set(df):
        return {
            (r["query_id"], r["vec_id"])
            for r in df.select("query_id", "vec_id").collect()
        }

    t0 = time.time()
    truth = topk_set(S.cosine_topk_blas(vectors, queries, k))
    out["blas_exact_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    centroids = S.kmeans_centroids(vectors.sample(0.05, seed=7), 256)
    index = S.ivf_index(vectors, centroids)
    S.save_ivf_index(index, centroids, f"{scratch}/ivf")
    out["build_sec"] = round(time.time() - t0, 1)

    idx, cents = S.load_ivf_index(spark, f"{scratch}/ivf")
    curve = []
    for nprobe in (4, 8, 16, 32, 64):
        t0 = time.time()
        probed = topk_set(S.ivf_probe_topk(idx, cents, queries, k, nprobe=nprobe))
        curve.append(
            {
                "nprobe": nprobe,
                "sec": round(time.time() - t0, 1),
                "recall": round(len(probed & truth) / len(truth), 3),
            }
        )
    out["curve"] = curve
    shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
