#!/usr/bin/env python
"""Vector-scale spot run (VERDICT r5 sweep item): the ANN family at
10M vectors (bench_vec10m, scripts/make_vec10m.py) — the scale the
LSH/IVF arms exist for, 5000x the sf fixtures' 2k vectors.

Measures, same session, sequential:
  brute_jvm   — cosine_topk (codegen zip_with/aggregate scan)
  brute_blas  — cosine_topk_blas (Arrow-batch numpy matmul scan)
  ivf         — sample-fit kmeans (k=256) -> build + partitioned save
                -> load -> probe (nprobe=8); recall vs brute
  lsh         — cosine_topk_lsh sign-LSH banding; recall vs brute

Prints one JSON line. Usage:
  python scripts/vec_scale_spot.py [fixture_dir] [n_queries] [k]
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
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark()
    scratch = tempfile.mkdtemp(prefix="vec_spot_")
    out: dict = {"metric": "vec10m_ann_spot", "k": k, "n_queries": n_q}

    vectors = spark.read.parquet(f"{fixture}/embeddings.parquet")
    out["n_vectors"] = vectors.count()
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
    brute = S.cosine_topk(vectors, queries, k)
    truth = topk_set(brute)
    out["brute_jvm_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    blas = topk_set(S.cosine_topk_blas(vectors, queries, k))
    out["brute_blas_sec"] = round(time.time() - t0, 1)
    out["blas_matches_jvm"] = len(blas & truth) / len(truth)

    # IVF: the 100 TB shape — fit routing on a sample, assign the full
    # corpus once, persist partitioned, probe with pruning
    t0 = time.time()
    sample = vectors.sample(0.05, seed=7)
    centroids = S.kmeans_centroids(sample, 256)
    out["ivf_fit_sec"] = round(time.time() - t0, 1)
    t0 = time.time()
    index = S.ivf_index(vectors, centroids)
    S.save_ivf_index(index, centroids, f"{scratch}/ivf")
    out["ivf_build_save_sec"] = round(time.time() - t0, 1)
    t0 = time.time()
    idx, cents = S.load_ivf_index(spark, f"{scratch}/ivf")
    probed = topk_set(S.ivf_probe_topk(idx, cents, queries, k, nprobe=8))
    out["ivf_probe_sec"] = round(time.time() - t0, 1)
    out["ivf_recall"] = round(len(probed & truth) / len(truth), 3)

    t0 = time.time()
    lsh = topk_set(
        S.cosine_topk_lsh(vectors, queries, k, dim=64, bands=16, rows_per_band=12)
    )
    out["lsh_sec"] = round(time.time() - t0, 1)
    out["lsh_recall"] = round(len(lsh & truth) / len(truth), 3)

    shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
