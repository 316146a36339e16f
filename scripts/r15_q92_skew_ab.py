#!/usr/bin/env python
"""Round-15 q92 skew study (r14 verdict item 5 / advice item 2).

The r14 bigram_logprob restructure attached c(w1,w2) as a count window
over RAW occurrence rows — every occurrence of a hot bigram lands in
one unsplittable window task with no map-side combine. This study
measures three shapes on a ZIPF-SKEWED corpus (the adversarial input
the advice asked about), interleaved in one session, noop sink:

  occ_window    r14 shape: count().over(partitionBy(w1,w2)) on bx
  preagg_window candidate: groupBy(id,w1,w2).count() first (map-side
                combine; shuffle moves distinct-per-doc grains), then
                sum(m) window over (w1,w2) — hot-bigram partition
                bounded by #docs containing it, not #occurrences
  joinback_aqe  pre-r14 shape: groupBy(w1,w2)+join-back, AQE skew
                splitting on (re-derives the corpus explode twice)

Fixture: ndocs docs x words_per_doc tokens drawn zipf(alpha) from a
vocab — top bigram covers a few % of all transitions, the documented
"of the" profile. Deterministic seed.

Usage: python scripts/r15_q92_skew_ab.py [ndocs] [words] [reps]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE = "/tmp/r15_zipf_docs.parquet"


def make_fixture(ndocs: int, words_per_doc: int) -> None:
    import numpy as np

    rng = np.random.default_rng(20260817)
    vocab_sz = 30000
    # zipf ranks; clip to vocab
    draws = rng.zipf(1.6, size=ndocs * words_per_doc)
    draws = np.minimum(draws, vocab_sz)
    words = np.char.add("w", draws.astype("U8"))
    docs = [
        " ".join(words[i * words_per_doc:(i + 1) * words_per_doc])
        for i in range(ndocs)
    ]
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (SELECT unnest(range(?)) AS doc_id, unnest(?) AS text)", [ndocs, docs])
    con.execute(f"COPY t TO '{FIXTURE}' (FORMAT parquet)")
    top = con.execute("""
        WITH w AS (SELECT doc_id, unnest(string_split(text,' ')) AS w,
                          generate_subscripts(string_split(text,' '),1) AS i FROM t),
        b AS (SELECT a.w AS w1, c.w AS w2 FROM w a JOIN w c
              ON a.doc_id=c.doc_id AND c.i=a.i+1)
        SELECT w1, w2, COUNT(*) c, COUNT(*)*1.0/(SELECT COUNT(*) FROM b) frac
        FROM b GROUP BY w1,w2 ORDER BY c DESC LIMIT 3
    """).fetchall()
    print("top bigrams (w1,w2,count,frac):", top, file=sys.stderr)


def main() -> None:
    ndocs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    words = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    if not os.path.exists(FIXTURE):
        make_fixture(ndocs, words)

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from kfai_pipeline_spark.session import get_spark

    spark = get_spark(app_name="r15-q92-skew")
    df = spark.read.parquet(FIXTURE)

    lam = 0.75

    def bx_frame():
        wordsc = F.split(F.col("text"), r"\s+")
        staged = df.select(F.col("doc_id"), wordsc.alias("__w"))
        wc = F.col("__w")
        pair = F.when(
            F.size(wc) >= 2,
            F.transform(
                F.sequence(F.lit(2), F.size(wc)),
                lambda i: F.struct(
                    F.element_at(wc, i - 1).alias("w1"),
                    F.element_at(wc, i).alias("w2"),
                ),
            ),
        ).otherwise(F.array())
        return staged.select(
            F.col("doc_id"), F.explode(pair).alias("p")
        ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))

    def wx_counts():
        wx = df.select(F.explode(F.split(F.col("text"), r"\s+")).alias("w"))
        c1 = wx.groupBy("w").agg(F.count(F.lit(1)).alias("__c1"))
        total = c1.agg(F.sum("__c1").alias("__n"))
        return c1, total

    def score(frame, c2col, weight=None):
        c1, total = wx_counts()
        scored = (
            frame
            .join(c1.withColumnsRenamed({"w": "w1", "__c1": "__cw1"}), "w1")
            .join(c1.withColumnsRenamed({"w": "w2", "__c1": "__cw2"}), "w2")
            .crossJoin(F.broadcast(total))
            .select(
                "doc_id",
                F.log(
                    F.lit(lam) * c2col / F.col("__cw1")
                    + F.lit(1.0 - lam) * F.col("__cw2") / F.col("__n")
                ).alias("__lp"),
                *( [F.col("m")] if weight else [] ),
            )
        )
        if weight:
            return scored.groupBy("doc_id").agg(
                F.round(
                    (F.sum(F.col("m") * F.col("__lp")) / F.sum("m")), 4
                ).alias("avg_logprob"),
                F.sum("m").alias("n_bigrams"),
            )
        return scored.groupBy("doc_id").agg(
            F.round(F.avg("__lp"), 4).alias("avg_logprob"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )

    def occ_window():
        bx = bx_frame()
        bcx = bx.withColumn(
            "__c2", F.count(F.lit(1)).over(Window.partitionBy("w1", "w2"))
        )
        return score(bcx, F.col("__c2"))

    def preagg_window():
        bg = bx_frame().groupBy("doc_id", "w1", "w2").agg(
            F.count(F.lit(1)).alias("m")
        )
        bcx = bg.withColumn(
            "__c2", F.sum("m").over(Window.partitionBy("w1", "w2"))
        )
        return score(bcx, F.col("__c2"), weight=True)

    def joinback_aqe():
        bx = bx_frame()
        c2 = bx.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c2"))
        bcx = bx.join(c2, ["w1", "w2"])
        return score(bcx, F.col("__c2"))

    shapes = {
        "occ_window": occ_window,
        "preagg_window": preagg_window,
        "joinback_aqe": joinback_aqe,
    }

    # parity (ROUND(4) canonical, like the oracle comparison)
    first = None
    parity = {}
    for label, fn in shapes.items():
        rows = sorted(map(tuple, fn().collect()))
        if first is None:
            first = (label, rows)
        parity[label] = rows == first[1]

    for fn in shapes.values():  # warm-up
        fn().write.format("noop").mode("overwrite").save()
    runs = {k: [] for k in shapes}
    for _ in range(reps):
        for label, fn in shapes.items():
            spark.sparkContext.setJobDescription(f"q92-skew {label}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            runs[label].append(round(time.perf_counter() - t0, 4))
    spark.sparkContext.setJobDescription(None)

    print(json.dumps({
        "fixture": {"ndocs": ndocs, "words_per_doc": words},
        "parity": parity,
        "variants": {
            k: {"runs": v, "median": round(statistics.median(v), 4)}
            for k, v in runs.items()
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
