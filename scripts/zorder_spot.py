#!/usr/bin/env python
"""Z-order scan-pruning spot (X46, BASELINE §5t).

Builds a 20M-row synthetic table (user_id uniform in [0, 100k), value
uniform in [0, 1000), ~96 B high-entropy payload) and writes it three
ways with 1 MB parquet row groups (pruning granularity = row group, so
small groups make the effect visible at fixture scale; override via
ZORDER_SPOT_N):

  linear   — range-partitioned + sorted by user_id (the classic
             single-column sort layout)
  zorder   — Morton-interleaved (user_id, value), bits=16
  shuffled — random layout (control: no stat locality at all)

then times a selective filter-count on each layout under three
predicates: user_id-only, value-only, and both. The expectation that
transfers to 100 TB: the linear layout prunes its prefix column only;
z-order prunes BOTH dimensions (each ~sqrt-of-selectivity worth of
row groups touched); the control reads everything regardless.

Usage: python scripts/zorder_spot.py
"""
from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from kfai_pipeline_spark.operators.partitioning import zorder_write  # noqa: E402

ROOT = "/tmp/zorder_spot"
N = int(os.environ.get("ZORDER_SPOT_N", 20_000_000))
RG = 1024 * 1024
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def timed(df) -> tuple[float, int]:
    """Time `fetch the matching rows' bodies': the aggregate forces the
    payload column of every MATCHING row group to be read, while
    skipped row groups never touch their payload pages — the realistic
    point-lookup/range-scan workload pruning exists for."""
    best, n = 1e9, -1
    for _ in range(2):
        t0 = time.time()
        row = df.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.length("payload")).alias("b")
        ).collect()[0]
        n = row["n"]
        best = min(best, time.time() - t0)
    return best, n


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory", "16g")
        .appName("zorder-spot")
        .getOrCreate()
    )
    if os.path.exists(ROOT):
        shutil.rmtree(ROOT)
    base = (
        spark.range(N)
        .select(
            F.col("id"),
            (F.xxhash64("id") % 100_000).alias("u"),
            ((F.xxhash64("id", F.lit(1)) % 1_000_000) / 1000.0).alias("v"),
        )
        .select(
            "id",
            F.abs("u").alias("user_id"),
            F.abs("v").alias("value"),
            # ~96 bytes of high-entropy payload per row: without it the
            # 3-column table compresses so well the scan never leaves
            # the per-job overhead floor and pruning is invisible
            F.concat(
                F.md5(F.col("id").cast("string")),
                F.md5((F.col("id") + 1).cast("string")),
                F.md5((F.col("id") + 2).cast("string")),
            ).alias("payload"),
        )
    )
    base.repartitionByRange(32, "user_id").sortWithinPartitions(
        "user_id"
    ).write.option("parquet.block.size", str(RG)).parquet(f"{ROOT}/linear")
    zorder_write(
        base, f"{ROOT}/zorder", ["user_id", "value"], bits=16,
        row_group_bytes=RG,
    )
    base.repartition(32).write.option(
        "parquet.block.size", str(RG)
    ).parquet(f"{ROOT}/shuffled")

    preds = {
        "user-only ": (F.col("user_id") >= 40_000) & (F.col("user_id") < 42_000),
        "value-only": (F.col("value") >= 400.0) & (F.col("value") < 420.0),
        "both      ": (F.col("user_id") >= 40_000)
        & (F.col("user_id") < 42_000)
        & (F.col("value") >= 400.0)
        & (F.col("value") < 420.0),
    }
    import pyarrow.parquet as pq

    f0 = next(
        os.path.join(f"{ROOT}/zorder", f)
        for f in sorted(os.listdir(f"{ROOT}/zorder"))
        if f.endswith(".parquet")
    )
    md = pq.ParquetFile(f0).metadata
    print(
        f"\nN={N} row_group={RG//1024}KB "
        f"(zorder part 0: {md.num_row_groups} row groups, "
        f"{md.num_rows} rows; times = best of 2, sec)"
    )
    header = "predicate   " + "".join(f"{k:>10}" for k in ("linear", "zorder", "shuffled"))
    print(header)
    for pname, pred in preds.items():
        row = [pname]
        counts = set()
        for layout in ("linear", "zorder", "shuffled"):
            df = spark.read.parquet(f"{ROOT}/{layout}").where(pred)
            t, n = timed(df)
            counts.add(n)
            row.append(f"{t:10.2f}")
        assert len(counts) == 1, f"layouts disagree on {pname}: {counts}"
        print("".join(row) + f"   ({counts.pop()} rows)")
    shutil.rmtree(ROOT)
    spark.stop()


if __name__ == "__main__":
    main()
