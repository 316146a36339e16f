#!/usr/bin/env python
"""SQ8 quantized-index spot at 10M vectors (round 6, X42).

Builds the packed-byte SQ8 index over bench_vec10m, then times — same
session, sequential — the float brute scan (cosine_topk_blas, the
existing BLAS arm) vs the SQ8 candidate scan (approx only) vs SQ8 +
exact re-rank, with recall vs the exact baseline. Also reports bytes
on disk: the bandwidth claim is only honest if the codes table really
is ~4x smaller than the float parquet it replaces.

Usage: python scripts/sq8_vec_spot.py [fixture_dir] [n_queries] [k]
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kfai_pipeline_spark.operators import similarity as S  # noqa: E402
from kfai_pipeline_spark.session import get_spark  # noqa: E402


def du(path: str) -> int:
    out = subprocess.check_output(["du", "-sb", path])
    return int(out.split()[0])


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else "bench_vec10m"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark()
    scratch = tempfile.mkdtemp(prefix="sq8_spot_")
    out: dict = {"metric": "vec10m_sq8_spot", "k": k, "n_queries": n_q}
    try:
        vectors = spark.read.parquet(f"{fixture}/embeddings.parquet")
        out["n_vectors"] = vectors.count()
        queries = vectors.where(F.col("vec_id") < n_q).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        queries.cache().count()

        t0 = time.perf_counter()
        write_path = f"{scratch}/sq8"
        S.write_sq8_index(vectors, write_path)
        out["index_build_s"] = round(time.perf_counter() - t0, 1)
        out["float_parquet_mb"] = du(f"{fixture}/embeddings.parquet") // 2**20
        out["codes_mb"] = du(f"{write_path}/codes") // 2**20

        def topk_set(df):
            return {(r["query_id"], r["vec_id"]) for r in df.collect()}

        t0 = time.perf_counter()
        exact = topk_set(S.cosine_topk_blas(vectors, queries, k))
        out["brute_blas_s"] = round(time.perf_counter() - t0, 1)

        t0 = time.perf_counter()
        approx = topk_set(
            S.sq8_topk(spark, write_path, queries, k, refine=4)
        )
        out["sq8_approx_s"] = round(time.perf_counter() - t0, 1)
        out["sq8_approx_recall"] = round(
            len(approx & exact) / max(len(exact), 1), 3
        )

        t0 = time.perf_counter()
        rer = topk_set(
            S.sq8_topk(
                spark, write_path, queries, k, refine=4, vectors=vectors
            )
        )
        out["sq8_rerank_s"] = round(time.perf_counter() - t0, 1)
        out["sq8_rerank_recall"] = round(
            len(rer & exact) / max(len(exact), 1), 3
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
