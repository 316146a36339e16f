#!/usr/bin/env python
"""sf1 (10x) extension-operator spot-run — the scale-bug detector.

Re-measures the BASELINE.md §4 table on bench_sf1/ (generate with
scripts/make_sf1.py). Each op is fully materialized (count/collect);
wall includes scan. Run AFTER correctness is green; the point is
catching O(work) redundancy that sf0.01 hides (per-branch re-scans,
per-iteration re-execution, per-element lambda re-evaluation).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from kfai_pipeline_spark.catalog import load_table
    from kfai_pipeline_spark.session import get_spark

    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/bench_sf1")
    spark = get_spark(app_name="sf1-spot")
    docs = load_table(spark, sf1, "documents")
    emb = load_table(spark, sf1, "embeddings")

    def t(label, fn):
        t0 = time.perf_counter()
        n = fn()
        print(f"{label}: {time.perf_counter() - t0:.1f} s ({n} rows)", flush=True)

    from kfai_pipeline_spark.operators import decontaminate as DC
    from kfai_pipeline_spark.operators import dedup as D
    from kfai_pipeline_spark.operators import text_analysis as TA

    corpus = docs.where(F.col("doc_id") % 10 != 0)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    t("contamination 3-gram", lambda: DC.contamination(corpus, bench).count())
    t(
        "minhash_dedup full",
        lambda: D.minhash_dedup(docs, "text", "doc_id").count(),
    )
    t(
        "semantic_dedup sign-LSH",
        lambda: D.semantic_dedup(emb).count(),
    )
    t(
        "simhash_candidates h<=3",
        lambda: D.simhash_candidates(
            D.simhash(docs, "text", "doc_id"), "doc_id"
        ).count(),
    )
    t(
        "fingerprint winnow xxhash",
        lambda: TA.fingerprint(docs, "text", "doc_id", k=5, window=4)
        .select(F.sum(F.size("fingerprint")))
        .collect()[0][0],
    )
    t(
        "repetition_features",
        lambda: TA.repetition_features(docs, "text", "doc_id").count(),
    )
    t(
        "bigram_logprob",
        lambda: TA.bigram_logprob(docs).count(),
    )
    t(
        "duplicated_spans 8-gram",
        lambda: D.duplicated_spans(docs, "text", "doc_id").count(),
    )


if __name__ == "__main__":
    main()
