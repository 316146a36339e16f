#!/usr/bin/env python
"""Batched tiered serving spot at 10M vectors (round 9, q126's shape).

The q126 claim, measured: offline eval over Q queries through the
interactive ``retrieve_tiered`` loop costs Q x rounds codes scans and
Q x rounds driver round-trips; ``retrieve_tiered_batch`` serves ALL
pending queries from ONE codes scan per top-up round. Same session,
sequential: the per-query loop vs the batched arm over the same
persisted SQ8 index, identical-row assertion per query (the two arms
run the same probe/certificate logic, so their rows must match even
in the non-exhaustive regime), wall-clock both.

Doc metadata (video_id/start_time/show_name/published_at) is
synthesized from vec_id (the q121 fixture recipe) so the post-probe
metadata filter is real (~2/8 shows pass -> the top-up loop fires).

Usage: python scripts/tiered_batch_spot.py [fixture_dir] [n_queries] [k]
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kfai_pipeline_spark.plans.rag import (  # noqa: E402
    ParsedQuery,
    build_retrieval_index,
    retrieve_tiered,
    retrieve_tiered_batch,
)
from kfai_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else "bench_vec10m"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark()
    scratch = tempfile.mkdtemp(prefix="tiered_batch_spot_")
    out: dict = {"metric": "vec10m_tiered_batch_spot", "k": k, "n_queries": n_q}
    try:
        vec = spark.read.parquet(f"{fixture}/embeddings.parquet")
        docs = vec.select(
            F.col("vec_id").alias("doc_id"),
            F.concat(F.lit("v"), (F.col("vec_id") % 100000).cast("string")).alias(
                "video_id"
            ),
            ((F.col("vec_id") / 100000).cast("long") * 30).cast("double").alias(
                "start_time"
            ),
            F.concat(F.lit("src"), (F.col("vec_id") % 8).cast("string")).alias(
                "show_name"
            ),
            (F.lit(1577836800) + (F.col("vec_id") % 1000) * 86400).alias(
                "published_at"
            ),
            F.lit("t").alias("title"),
            "embedding",
        )
        out["n_vectors"] = docs.count()

        t0 = time.perf_counter()
        idx = f"{scratch}/sq8"
        build_retrieval_index(docs, idx, id_col="doc_id")
        out["index_build_s"] = round(time.perf_counter() - t0, 1)

        q_rows = vec.where(F.col("vec_id") < n_q).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ).collect()
        parsed = ParsedQuery(shows=["src1", "src3"])  # post-probe ~25% pass
        kw = dict(k=k, id_col="doc_id", index_path=idx, refine=32,
                  topup_factor=4, max_rounds=4)
        cols = ["doc_id", "video_id", "start_time", "score"]

        # arm A: the interactive loop, once per query
        t0 = time.perf_counter()
        loop_rows: dict[int, list[tuple]] = {}
        for r in q_rows:
            got = retrieve_tiered(
                docs, [float(x) for x in r["embedding"]], parsed,
                tier="ann", **kw,
            ).select(*cols).collect()
            loop_rows[r["query_id"]] = sorted(tuple(x) for x in got)
        out["per_query_loop_s"] = round(time.perf_counter() - t0, 1)

        # arm B: one batched call
        queries = spark.createDataFrame(
            [(r["query_id"], [float(x) for x in r["embedding"]]) for r in q_rows],
            "query_id long, embedding array<double>",
        )
        t0 = time.perf_counter()
        got = retrieve_tiered_batch(docs, queries, parsed, **kw).select(
            "query_id", *cols
        ).collect()
        out["batch_s"] = round(time.perf_counter() - t0, 1)
        batch_rows: dict[int, list[tuple]] = {}
        for r in got:
            batch_rows.setdefault(r["query_id"], []).append(tuple(r)[1:])
        batch_rows = {q: sorted(v) for q, v in batch_rows.items()}
        out["rows_identical"] = batch_rows == {
            q: v for q, v in loop_rows.items() if v
        }
        out["speedup"] = round(out["per_query_loop_s"] / max(out["batch_s"], 1e-9), 2)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
