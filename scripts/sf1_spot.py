#!/usr/bin/env python
"""sf1 (10x) extension-operator spot-run — the scale-bug detector.

Re-measures the BASELINE.md §4 table on bench_sf1/ (generate with
scripts/make_sf1.py). Each op is fully materialized (count/collect);
wall includes scan. Run AFTER correctness is green; the point is
catching O(work) redundancy that sf0.01 hides (per-branch re-scans,
per-iteration re-execution, per-element lambda re-evaluation).

Also runs at 100x for the shuffle regime (BASELINE.md §5c):
    SPARK_GRAFT_SF1_DIR=/root/repo/bench_sf10 python scripts/sf1_spot.py
(generate bench_sf10/ with scripts/make_sf10.py). The 100x fixture's
100-copies-per-doc structure is what exposed the round-4 broadcast
and quadratic-clique defects — keep it in the rotation.
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
    # components API, not raw candidate emission: candidates are
    # inherently quadratic inside exact-dup cliques (the 100x fixture
    # has 100 copies/doc) — simhash_dedup collapses those first, which
    # is the shape any real pipeline runs
    t(
        "simhash_dedup h<=3",
        lambda: D.simhash_dedup(docs, "text", "doc_id").count(),
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
    t(
        "segment_dedup 8-word",
        lambda: D.dedup_segments_text(docs, "doc_id", "text").count(),
    )

    def _dsir():
        from kfai_pipeline_spark.operators.sampling import dsir_sample_scoped

        with dsir_sample_scoped(
            docs, F.col("lang") == "en", k=50, text_col="text"
        ) as sel:
            return sel.count()

    t("dsir top-50 (en target)", _dsir)

    def _index_probe():
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            path = f"{tmp}/mh_index"
            corpus = docs.where(F.col("doc_id") % 10 != 0)
            batch = docs.where(F.col("doc_id") % 10 == 0)
            D.write_minhash_index(corpus, path)
            return D.neardup_against_index(batch, path).count()

    t("neardup vs persisted index (90/10 split)", _index_probe)
    from kfai_pipeline_spark.operators.bm25 import bm25_topk
    from kfai_pipeline_spark.operators.fusion import rrf_fuse, with_rank
    from kfai_pipeline_spark.operators.heavy_hitters import heavy_hitters
    from kfai_pipeline_spark.operators.source_filter import (
        filter_by_source,
        source_stats,
    )

    t(
        "bm25 top-10 (3 terms)",
        lambda: bm25_topk(docs, ["spark", "window", "hash"], k=10).count(),
    )
    t(
        "heavy_hitters k=30",
        lambda: heavy_hitters(docs, "text", "doc_id", k=30).count(),
    )
    t(
        "source curation filter",
        lambda: filter_by_source(docs, source_stats(docs)).count(),
    )

    def _rrf():
        lex = with_rank(
            bm25_topk(docs, ["spark", "window", "hash"], k=50),
            [F.col("bm25").desc(), F.col("doc_id")],
        ).select("doc_id", "rank")
        from kfai_pipeline_spark.operators.similarity import cosine_topk

        qv = emb.where(F.col("vec_id") == 0).select(
            F.lit(0).alias("query_id"), "embedding"
        )
        vec = with_rank(
            cosine_topk(emb.where(F.col("vec_id") != 0), qv, k=50),
            [F.col("score").desc(), F.col("vec_id")],
        ).select(F.col("vec_id").alias("doc_id"), "rank")
        return rrf_fuse([lex, vec], "doc_id", k=10).count()

    t("hybrid rrf fusion", _rrf)


if __name__ == "__main__":
    main()
