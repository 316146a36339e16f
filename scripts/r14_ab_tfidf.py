#!/usr/bin/env python
"""Interleaved A/B for the r14 tfidf_top_terms restructure (q81).

Old shape: tf and countDistinct df both derived from the raw explode —
plans the scan/regex-split/explode pipeline twice.
New shape (operators.text_analysis.tfidf_top_terms at HEAD): linear
lvl1/lvl2 aggregates + vocab-sized window for df.

Method per OPTIMIZATION_r14.md: one session, documents replicated REPS
times, noop sink, alternating A/B runs, report per-variant medians and
a DuckDB wall ratio is NOT needed (same-session interleave is the
load control).
"""
from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kfai_pipeline_spark.operators.text_analysis import _words, tfidf_top_terms
from kfai_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "100"))
RUNS = int(os.environ.get("AB_RUNS", "5"))


def old_tfidf(df, text_col="text", group_col="lang", id_col="doc_id", k=10):
    wx = df.select(F.col(id_col), F.col(group_col), F.explode(_words(text_col)).alias("w"))
    wx = wx.where(F.col("w") != "")
    tf = wx.groupBy(group_col, "w").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = wx.groupBy("w").agg(F.count_distinct(id_col).alias("dfn"))
    total = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "w")
        .crossJoin(F.broadcast(total))
        .select(
            group_col,
            F.col("w").alias("term"),
            F.round(
                F.col("tf") * F.log(F.col("n_docs") * F.lit(1.0) / F.col("dfn")), 4
            ).alias("score"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy(group_col).orderBy(F.col("score").desc(), F.col("term"))
    )
    return scored.withColumn("rn", rn).where(F.col("rn") <= k)


def main() -> None:
    spark = get_spark(app_name="r14-ab-tfidf")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # Materialize the replicated corpus to parquet (untimed) so each
    # timed variant pays a REAL scan (decompress + decode) per
    # derivation — an in-memory crossJoin replica makes the duplicated
    # scan/regex pipeline nearly free and understates what the
    # single-derivation shape saves at 100 TB.
    big_path = os.environ.get("AB_FIXTURE", "/tmp/ab_tfidf_docs100x.parquet")
    if not os.path.exists(big_path):
        docs.crossJoin(spark.range(REPS).select(F.col("id").alias("__rep"))).select(
            F.concat_ws("_", F.col("doc_id").cast("string"), "__rep").alias("doc_id"),
            "lang",
            "text",
        ).write.mode("overwrite").parquet(big_path)
    big = spark.read.parquet(big_path)
    variants = {"old": old_tfidf, "new": tfidf_top_terms}
    times: dict[str, list[float]] = {v: [] for v in variants}
    # warm both
    for name, fn in variants.items():
        fn(big, "text", "lang", "doc_id", 10).write.format("noop").mode("overwrite").save()
    for i in range(RUNS):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"tfidf-{name}-run{i}")
            t0 = time.perf_counter()
            fn(big, "text", "lang", "doc_id", 10).write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(
            f"{name}: median {statistics.median(ts):.3f}s  runs {[round(t, 3) for t in ts]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
