#!/usr/bin/env python
"""PQ (ADC) spot at 10M vectors (round 6, X43) — sibling of
sq8_vec_spot.py. Trains m=16 x 256-code codebooks on a 100k sample
(the measured operating point for this 64-dim corpus: recall 0.95 at
refine=32 vs 0.375 at m=8/refine=8 — see BASELINE §5n for the full
refine/m curve), encodes 10M x 64d into 16-byte packed codes (16x
smaller than float32), then times the ADC scan and ADC + exact
re-rank vs the float brute scan, with recall vs exact.
Usage: python scripts/pq_vec_spot.py [dir] [n_q] [k]
"""
from __future__ import annotations

import json
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
    return int(subprocess.check_output(["du", "-sb", path]).split()[0])


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else "bench_vec10m"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark()
    scratch = tempfile.mkdtemp(prefix="pq_spot_")
    out: dict = {"metric": "vec10m_pq_spot", "k": k, "n_queries": n_q}
    try:
        vectors = spark.read.parquet(f"{fixture}/embeddings.parquet")
        out["n_vectors"] = vectors.count()
        queries = vectors.where(F.col("vec_id") < n_q).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        queries.cache().count()

        t0 = time.perf_counter()
        books = S.train_pq_codebooks(vectors, m=16, n_codes=256)
        out["train_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        idx = f"{scratch}/pq"
        S.write_pq_index(vectors, idx, books)
        S.save_pq_index(spark, idx, books)
        out["encode_s"] = round(time.perf_counter() - t0, 1)
        out["float_parquet_mb"] = du(f"{fixture}/embeddings.parquet") // 2**20
        out["codes_mb"] = du(f"{idx}/codes") // 2**20

        def topk_set(df):
            return {(r["query_id"], r["vec_id"]) for r in df.collect()}

        t0 = time.perf_counter()
        exact = topk_set(S.cosine_topk_blas(vectors, queries, k))
        out["brute_blas_s"] = round(time.perf_counter() - t0, 1)

        t0 = time.perf_counter()
        approx = topk_set(S.pq_topk(spark, idx, queries, k, refine=32))
        out["pq_approx_s"] = round(time.perf_counter() - t0, 1)
        out["pq_approx_recall"] = round(len(approx & exact) / max(len(exact), 1), 3)

        t0 = time.perf_counter()
        rer = topk_set(
            S.pq_topk(spark, idx, queries, k, refine=32, vectors=vectors)
        )
        out["pq_rerank_s"] = round(time.perf_counter() - t0, 1)
        out["pq_rerank_recall"] = round(len(rer & exact) / max(len(exact), 1), 3)
        print(json.dumps(out))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
