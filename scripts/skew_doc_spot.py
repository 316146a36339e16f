#!/usr/bin/env python
"""Skewed text-length spot run (VERDICT r5 sweep item): what happens
to the text pipelines when ONE document is ~4 orders of magnitude
longer than its peers (the '10-hour transcript' / boilerplate-dump
shape real crawls contain)?

The skew risk is structural: shingling/tokenizing explodes one ROW
into millions, and a single row cannot be split across tasks — the
giant doc's explode+hash runs in one task no matter the partitioning.
This measures how bad that is for the hot text operators, uniform
corpus vs uniform+giant, same session:

  minhash_sign  — word_shingles -> minhash_signatures (the dedup front)
  tokens        — token counting (text_analysis)
  quality       — quality scoring
  chunk         — recursive chunker (grouped pandas kernel)

Usage: python scripts/skew_doc_spot.py [n_normal_docs] [giant_mb]
Prints one JSON line.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kfai_pipeline_spark.operators import dedup as D  # noqa: E402
from kfai_pipeline_spark.operators import text_analysis as TA  # noqa: E402
from kfai_pipeline_spark.session import get_spark  # noqa: E402

WORDS = (
    "the quick brown fox jumps over lazy dog data spark shuffle "
    "partition vector stream batch window join agg filter scan"
).split()


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    giant_mb = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark()
    out: dict = {"metric": "skew_doc_spot", "n_normal": n_docs, "giant_mb": giant_mb}

    # normal docs: ~200 words each, deterministic
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.array(
                *[
                    F.lit(WORDS[i % len(WORDS)])
                    for i in range(40)
                ]
            ),
        ).alias("__w40"),
    )
    normal = base.select(
        "doc_id",
        F.concat_ws(
            " ", *[F.concat(F.col("__w40"), F.lit(f" d{i}")) for i in range(5)]
        ).alias("text"),
    )
    # one giant doc: giant_mb of repeated vocabulary with a per-block
    # counter so shingles stay diverse (worst case for minhash)
    n_words = giant_mb * 1024 * 1024 // 6
    block = " ".join(f"{WORDS[i % len(WORDS)]}{i % 997}" for i in range(2048))
    reps = max(1, n_words // 2048)
    giant_text = " ".join([block] * reps)
    giant = spark.createDataFrame(
        [(10_000_000, giant_text)], "doc_id long, text string"
    )

    def timed(fn):
        t = time.time()
        fn()
        return round(time.time() - t, 1)

    skewed = normal.unionByName(giant)
    truncated = TA.truncate_long_docs(skewed, "text", max_chars=100_000).select(
        "doc_id", "text"
    )
    for tag, df in (
        ("uniform", normal),
        ("skewed", skewed),
        ("skewed_trunc100k", truncated),
    ):
        sigs = D.minhash_signatures(
            D.word_shingles(df, "text", "doc_id", 3), "doc_id", 32
        )
        out[f"minhash_sign_{tag}_sec"] = timed(lambda: sigs.count())
        out[f"quality_{tag}_sec"] = timed(
            lambda: TA.quality_features(df, "text").agg(
                F.sum("n_tokens"), F.avg("quality_score")
            ).collect()
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
