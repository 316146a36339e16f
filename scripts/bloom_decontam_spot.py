#!/usr/bin/env python
"""Bloom-pruned decontamination (X45) operating spot.

Measures, at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1):
  - corpus shingle count (what the naive shuffle-join arm would move),
  - Bloom survivor count at the default 10-bits/key sizing (what the
    pruned arm shuffles: true hits + false positives),
  - true overlap count (the irreducible join work),
  - wall-clock of the broadcast-exact arm vs the Bloom arm.

The local verdict is expected and documented: at fixture scale the
broadcast-exact arm wins outright (the benchmark set is tiny, and the
Bloom arm pays a bitmap build + a second shingle pass). The number that
transfers to 100 TB is the PRUNE RATE — the fraction of corpus shingles
that never reach a shuffle when the benchmark side is too large to
broadcast and the only alternative is shuffling every corpus shingle.

Usage: python scripts/bloom_decontam_spot.py
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from kfai_pipeline_spark.operators import decontaminate as DC  # noqa: E402
from kfai_pipeline_spark.operators.dedup import word_shingles  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_BITS = 1 << 23
K_HASHES = 5


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory", "16g")
        .appName("bloom-decontam-spot")
        .getOrCreate()
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    bench = docs.where(F.col("doc_id") % 10 == 0)

    doc_sh = word_shingles(corpus.select("doc_id", "text"), "text", "doc_id")
    n_corpus_shingles = doc_sh.count()

    bench_sh = DC.benchmark_shingle_set(bench)
    n_bench = bench_sh.count()

    import numpy as np

    true_hits = doc_sh.join(bench_sh, "shingle", "left_semi").count()

    def survivors_at(n_bits: int) -> int:
        """Bloom-test survivor count (before exact verify) at a sizing."""
        bitmap = DC.build_bloom_filter(bench_sh, "shingle", n_bits, K_HASHES)
        bc = spark.sparkContext.broadcast(bitmap)
        probe_in = doc_sh.withColumn(
            "__pos", DC._bloom_positions(F.col("shingle"), n_bits, K_HASHES)
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

        n = probe_in.mapInPandas(
            bloom_test, schema="doc_id long, shingle string"
        ).count()
        bc.destroy()
        return n

    # production sizing is ~10 bits/key; also measure the oversized arm
    ten_bits_per_key = 1 << max(8, int(np.ceil(np.log2(10 * max(1, n_bench)))))
    survivors_10bpk = survivors_at(ten_bits_per_key)
    survivors = survivors_at(N_BITS)

    t0 = time.time()
    DC.contamination(corpus, bench, threshold=0.2).count()
    t_exact = time.time() - t0

    t0 = time.time()
    DC.contamination_bloom(
        corpus, bench, threshold=0.2, n_bits=N_BITS, k_hashes=K_HASHES
    ).count()
    t_bloom = time.time() - t0

    fp = survivors - true_hits
    fp10 = survivors_10bpk - true_hits
    nonhit = max(1, n_corpus_shingles - true_hits)
    print(
        f"\nsf_dir={SF_DIR} k={K_HASHES}\n"
        f"bench distinct shingles: {n_bench}\n"
        f"corpus shingles:         {n_corpus_shingles} "
        f"(true overlap {true_hits} — fixture docs share heavily; the "
        f"operator-quality number is the fp-rate on the NON-overlapping rest)\n"
        f"@{ten_bits_per_key} bits (~10/key): survivors {survivors_10bpk}, "
        f"fp {fp10}, fp-rate {fp10 / nonhit:.4f}\n"
        f"@{N_BITS} bits:        survivors {survivors}, "
        f"fp {fp}, fp-rate {fp / nonhit:.4f}\n"
        f"prune rate (@10/key):    "
        f"{1 - survivors_10bpk / max(1, n_corpus_shingles):.4f} of corpus "
        f"shingles never reach a shuffle\n"
        f"broadcast-exact arm:     {t_exact:.1f} s\n"
        f"bloom arm:               {t_bloom:.1f} s "
        f"(expected slower locally: bitmap build + second shingle pass; "
        f"the arm targets un-broadcastable benchmark sets)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
