#!/usr/bin/env python
"""Hard-negative mining at 10M vectors (X47, BASELINE §5 addendum).

Measures the expression arm (per-pair interpreted HOF dot) against the
BLAS arm (one V @ Q.T matmul per Arrow batch + same-label mask +
two-level top-k) on the 10M-vector fixture with a derived 50-class
label (vec_id % 50), 32 anchors, k=10. Also asserts both arms return
identical rows — the contract-equality check at scale, not just at
fixture size.

Usage: python scripts/hardneg_vec_spot.py    (~5-15 min)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from kfai_pipeline_spark.operators import similarity as S  # noqa: E402

FIXTURE = os.environ.get("SPARK_GRAFT_VEC10M", "/root/repo/bench_vec10m")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_ANCHORS = 32
K = 10


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory", "24g")
        .appName("hardneg-vec-spot")
        .getOrCreate()
    )
    emb = (
        spark.read.parquet(f"{FIXTURE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .withColumn("label", F.pmod(F.col("vec_id"), F.lit(50)).cast("int"))
    )
    anchors = emb.where(F.col("vec_id") < N_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"), "embedding", "label"
    )
    n = emb.count()

    t0 = time.time()
    blas = sorted(
        map(tuple, S.mine_hard_negatives_blas(emb, anchors, k=K).collect())
    )
    t_blas = time.time() - t0

    t0 = time.time()
    expr = sorted(
        map(tuple, S.mine_hard_negatives(emb, anchors, k=K).collect())
    )
    t_expr = time.time() - t0

    assert blas == expr, "arms diverged at 10M vectors"
    print(
        f"\ncorpus {n} vectors, {N_ANCHORS} anchors, k={K}, 50 labels\n"
        f"expression arm: {t_expr:.1f} s\n"
        f"BLAS arm:       {t_blas:.1f} s ({t_expr / max(t_blas, 1e-9):.1f}x)\n"
        f"arms identical: True ({len(blas)} rows)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
