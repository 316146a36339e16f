#!/usr/bin/env python
"""OPQ-vs-plain IVFPQ at 10M vectors (round 10, X54 / q137's shape):
does the learned residual rotation (Ge et al. 2013) buy recall at the
SAME byte budget on the clustered (production-like) fixture?

Same recipe as ivfpq_vec_spot.py (coarse=256, m=16 x 256 codes,
refine=32), two indexes trained on the same corpus — plain residual PQ
vs OPQ-rotated residual PQ — probed with the same nprobe sweep against
the same exact top-k. The delta column is the measurement; rotation
cost shows up in train_s (one driver-side SVD loop over the 100k
sample) and NOWHERE else (the encode adds one sample-side GEMM).

Usage: python scripts/opq_vec_spot.py [dir] [n_q] [k] [opq_iters]
       [refines]

``refines`` (round-11): comma list, default "32". The exact re-rank
absorbs code error when refine >> k — at refine=32/k=10 a candidate
set from EITHER codebook nearly always contains the true top-10, so
recall is insensitive to the quantizer's quality and the OPQ delta
reads ~0 even where its quantization error is measurably lower. The
thin-slack point (refine=k) is where code quality IS the recall.
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
    fixture = sys.argv[1] if len(sys.argv) > 1 else "bench_vec10m_clustered"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    opq_iters = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    refines = (
        [int(x) for x in sys.argv[5].split(",")]
        if len(sys.argv) > 5
        else [32]
    )
    spark = get_spark()
    scratch = tempfile.mkdtemp(prefix="opq_spot_")
    out: dict = {"metric": "vec10m_opq_spot", "k": k, "n_queries": n_q,
                 "opq_iters": opq_iters, "refines": refines}
    try:
        vectors = spark.read.parquet(f"{fixture}/embeddings.parquet")
        out["n_vectors"] = vectors.count()
        queries = vectors.where(F.col("vec_id") < n_q).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        queries.cache().count()

        t0 = time.perf_counter()
        cents, books = S.train_ivfpq(vectors, n_clusters=256, m=16,
                                     n_codes=256)
        out["train_plain_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        cents_o, books_o, rot = S.train_ivfpq(
            vectors, n_clusters=256, m=16, n_codes=256, opq_iters=opq_iters
        )
        out["train_opq_s"] = round(time.perf_counter() - t0, 1)

        plain, opq = f"{scratch}/plain", f"{scratch}/opq"
        t0 = time.perf_counter()
        S.write_ivfpq_index(vectors, plain, cents, books)
        out["encode_plain_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        S.write_ivfpq_index(vectors, opq, cents_o, books_o, rotation=rot)
        out["encode_opq_s"] = round(time.perf_counter() - t0, 1)

        def topk_set(df):
            return {(r["query_id"], r["vec_id"]) for r in df.collect()}

        t0 = time.perf_counter()
        exact = topk_set(S.cosine_topk_blas(vectors, queries, k))
        out["brute_blas_s"] = round(time.perf_counter() - t0, 1)

        out["nprobe_curve"] = []
        for refine in refines:
            for nprobe in (8, 16, 32, 64):
                row = {"nprobe": nprobe, "refine": refine}
                for name, idx in (("plain", plain), ("opq", opq)):
                    t0 = time.perf_counter()
                    got = topk_set(
                        S.ivfpq_topk(
                            spark, idx, queries, k, nprobe=nprobe,
                            refine=refine, vectors=vectors,
                        )
                    )
                    row[f"recall_{name}"] = round(
                        len(got & exact) / max(len(exact), 1), 3
                    )
                    row[f"s_{name}"] = round(time.perf_counter() - t0, 1)
                row["delta"] = round(
                    row["recall_opq"] - row["recall_plain"], 3
                )
                out["nprobe_curve"].append(row)
                print(json.dumps(row), file=sys.stderr)
        print(json.dumps(out))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
