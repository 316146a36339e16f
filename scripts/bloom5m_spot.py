#!/usr/bin/env python
"""Bloom decontamination at 5M documents (X45, BASELINE §5r addendum).

§5r's fixture-scale measurement is dominated by TRUE overlap (the
synthetic generator shares 3-grams across every doc), so the claim
"on a realistic corpus where contamination is rare, prune rate
approaches 1 - fp-rate" stayed unmeasured. This spot measures it:

  corpus = the 5M-doc fixture (docs5m_spot's 1000-copy sf0.1 table)
  bench  = 50k docs over a DISJOINT token vocabulary (zq-prefixed),
           so true overlap is exactly zero and the survivor count IS
           the false-positive count — prune rate = 1 - fp-rate by
           construction.

Also times the two exact arms end-to-end on the 5M corpus:
  bloom   — bitmap prune map-side, survivors (= fps only) semi-join
  shuffle — the no-broadcast fallback the Bloom arm replaces: every
            corpus shingle shuffle-joins the benchmark set
(The broadcast-exact arm is deliberately absent: this spot models the
regime where the bench does NOT fit a broadcast.)

Usage: python scripts/bloom5m_spot.py   (~6-10 min; builds /tmp/docs5m)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from kfai_pipeline_spark.operators import decontaminate as DC  # noqa: E402
from kfai_pipeline_spark.operators.dedup import word_shingles  # noqa: E402

FIXTURE = "/tmp/docs5m"
N_BENCH = 50_000
N_BITS = 1 << 24  # ~16.8M bits over ~1.1M bench shingles ~ 15 bits/key
K = 5
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from docs5m_spot import build_fixture  # reuse the 5M-doc builder

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    build_fixture()
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory", "24g")
        .appName("bloom5m-spot")
        .getOrCreate()
    )
    corpus = spark.read.parquet(f"{FIXTURE}/documents.parquet").select(
        "doc_id", "text"
    )
    # disjoint-vocabulary benchmark: 20 zq-tokens per doc from a 200k
    # vocab — zero shared shingles with the corpus by construction
    bench = spark.range(N_BENCH).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("zq"),
                    F.pmod(
                        F.xxhash64(F.col("id"), F.lit(i)), F.lit(200_000)
                    ).cast("string"),
                )
                for i in range(20)
            ],
        ).alias("text"),
    )

    n_corpus_sh = word_shingles(corpus, "text", "doc_id").count()
    bench_sh = DC.benchmark_shingle_set(bench, repartition_to="auto")
    n_bench_sh = bench_sh.count()

    t0 = time.time()
    bloom = DC.contamination_bloom(
        corpus, bench, threshold=0.1, n_bits=N_BITS, k_hashes=K
    )
    n_contam_bloom = bloom.where(F.col("contaminated")).count()
    survivors = bloom.agg(F.sum("n_overlap")).collect()[0][0] or 0
    t_bloom = time.time() - t0

    # survivor count BEFORE the verify join = fp count (true overlap is
    # zero by construction); measure it directly with the probe kernel
    import numpy as np

    bitmap = DC.build_bloom_filter(bench_sh, "shingle", N_BITS, K)
    bc = spark.sparkContext.broadcast(bitmap)
    doc_sh = word_shingles(corpus, "text", "doc_id")
    probe_in = doc_sh.withColumn(
        "__pos", DC._bloom_positions(F.col("shingle"), N_BITS, K)
    )

    def bloom_test(batches):
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            p = np.array(pdf["__pos"].tolist(), dtype=np.int64)
            hits = (bm[p >> 3] & (np.uint8(1) << (p & 7).astype(np.uint8))) != 0
            keep = hits.all(axis=1)
            if keep.any():
                yield pdf.loc[keep, ["doc_id", "shingle"]]

    n_fp = probe_in.mapInPandas(
        bloom_test, schema="doc_id long, shingle string"
    ).count()
    bc.destroy()

    # the no-broadcast fallback: every corpus shingle shuffle-joins the
    # benchmark (merge-pinned both sides so nothing rides the
    # auto-broadcast threshold — the regime premise)
    t0 = time.time()
    flagged = doc_sh.join(
        bench_sh.hint("merge").withColumn("__hit", F.lit(1)),
        "shingle",
        "left",
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_overlap"),
    )
    n_contam_shuffle = per_doc.where(
        F.col("n_overlap") / F.col("n_shingles") >= 0.1
    ).count()
    t_shuffle = time.time() - t0

    assert n_contam_bloom == n_contam_shuffle == 0, (
        n_contam_bloom, n_contam_shuffle,
    )
    print(
        f"\ncorpus: 5M docs, {n_corpus_sh} shingles; "
        f"bench: {N_BENCH} disjoint-vocab docs, {n_bench_sh} shingles\n"
        f"bloom sizing: {N_BITS} bits, k={K} "
        f"(~{N_BITS / max(1, n_bench_sh):.1f} bits/key)\n"
        f"bloom survivors (= false positives): {n_fp} "
        f"(fp-rate {n_fp / max(1, n_corpus_sh):.6f}); verified overlap "
        f"after exact join: {survivors}\n"
        f"prune rate: {1 - n_fp / max(1, n_corpus_sh):.6f} of corpus "
        f"shingles never reach a shuffle\n"
        f"bloom arm:   {t_bloom:.1f} s\n"
        f"shuffle arm: {t_shuffle:.1f} s (joins all {n_corpus_sh} "
        f"corpus shingles)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
