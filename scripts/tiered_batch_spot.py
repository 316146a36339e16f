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

Round-10 extension (verdict item #4 — the 10^4-query claim rested on a
16-query measurement): ``n_loop_sample`` caps the per-query-loop
baseline at a sample (the loop at 1k queries is ~15 h; its per-query
cost is flat by construction, so the baseline extrapolates linearly),
while the BATCH arm runs the full query count — which is what
exercises the per-round O(#queries) status collect and the
``isin(topup_ids)`` literal at real eval size. Row parity asserts over
the sampled ids. A third arm re-runs the batch with PER-QUERY filters
(4 templates cycled over the query set — the X50e mapping form) to
price the CASE predicate at scale.

Usage: python scripts/tiered_batch_spot.py [fixture_dir] [n_queries]
       [k] [n_loop_sample]
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
    n_sample = min(n_q, int(sys.argv[4]) if len(sys.argv) > 4 else n_q)
    spark = get_spark()
    scratch = tempfile.mkdtemp(prefix="tiered_batch_spot_")
    out: dict = {
        "metric": "vec10m_tiered_batch_spot", "k": k, "n_queries": n_q,
        "n_loop_sample": n_sample,
    }
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

        # arm A: the interactive loop, once per SAMPLED query (flat
        # per-query cost by construction — every call scans the same
        # codes table the same number of rounds — so the full-set
        # baseline extrapolates linearly)
        sample = q_rows[:n_sample]
        t0 = time.perf_counter()
        loop_rows: dict[int, list[tuple]] = {}
        for r in sample:
            got = retrieve_tiered(
                docs, [float(x) for x in r["embedding"]], parsed,
                tier="ann", **kw,
            ).select(*cols).collect()
            loop_rows[r["query_id"]] = sorted(tuple(x) for x in got)
        loop_s = time.perf_counter() - t0
        out["per_query_loop_sample_s"] = round(loop_s, 1)
        out["per_query_loop_extrapolated_s"] = round(loop_s * n_q / n_sample, 1)

        # arm B: one batched call over the FULL query set
        queries = spark.createDataFrame(
            [(r["query_id"], [float(x) for x in r["embedding"]]) for r in q_rows],
            "query_id long, embedding array<double>",
        )
        t0 = time.perf_counter()
        got = retrieve_tiered_batch(docs, queries, parsed, **kw).select(
            "query_id", *cols
        ).collect()
        out["batch_s"] = round(time.perf_counter() - t0, 1)
        out["batch_rows"] = len(got)
        batch_rows: dict[int, list[tuple]] = {}
        for r in got:
            batch_rows.setdefault(r["query_id"], []).append(tuple(r)[1:])
        batch_rows = {q: sorted(v) for q, v in batch_rows.items()}
        sample_ids = {r["query_id"] for r in sample}
        out["rows_identical_on_sample"] = {
            q: v for q, v in batch_rows.items() if q in sample_ids
        } == {q: v for q, v in loop_rows.items() if v}
        out["speedup_extrapolated"] = round(
            out["per_query_loop_extrapolated_s"] / max(out["batch_s"], 1e-9), 2
        )

        # arm C: the batch again with PER-QUERY filters (X50e) — 4
        # predicate templates cycled across the query set prices the
        # CASE routing at eval size (same index, same top-up rules)
        per_query = {
            r["query_id"]: ParsedQuery(
                shows=[
                    ["src1", "src3"],
                    ["src0", "src2", "src4"],
                    ["src5"],
                    ["src1", "src6", "src7"],
                ][r["query_id"] % 4]
            )
            for r in q_rows
        }
        t0 = time.perf_counter()
        got_pq = retrieve_tiered_batch(docs, queries, per_query, **kw).select(
            "query_id", *cols
        ).collect()
        out["batch_per_query_filters_s"] = round(time.perf_counter() - t0, 1)
        out["batch_per_query_filters_rows"] = len(got_pq)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
