#!/usr/bin/env python
"""One-off experiment (VERDICT r4/r5 carried item): what does a
bucketed lakehouse layout buy the b2 flagship join at sf10?

The b2 kernel (q22) residual vs DuckDB at sf10 is the 60M-row
lineitem ⋈ orders exchange. Bucketing BOTH fact tables on the join key
(write-once layout investment) lets the join read co-located buckets
with ZERO Exchange above either scan — the lakehouse answer a
1000-executor cluster wants for a join it runs every day.

Times, same session, interleaved A/B runs (bench-noise rule: compare
only within one session):
  plain    — q22 as shipped (parquet scans, SMJ with exchanges)
  bucketed — the same plan reading 32-bucket bucketBy(orderkey) +
             sortBy tables for lineitem/orders

Also records the one-time bucketed-write cost and asserts the plan
shape (no Exchange between either bucketed scan and the first join).
Usage: python scripts/bucketed_b2_bench.py [sf_dir] [n_buckets]
Default sf_dir: bench_sf10. Prints one JSON line.
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kfai_pipeline_spark.operators.partitioning import write_bucketed  # noqa: E402
from kfai_pipeline_spark.queries.relational import q22  # noqa: E402
from kfai_pipeline_spark.session import get_spark  # noqa: E402


def _q22_bucketed(spark, sf_dir):
    """q22's exact plan with the two fact scans swapped for the
    bucketed tables (dims still read from parquet)."""
    region = spark.read.parquet(f"{sf_dir}/region.parquet").where(F.col("r_name") == "ASIA")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.table("b2_orders_bkt")
    lineitem = spark.table("b2_lineitem_bkt")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "bench_sf10"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark()
    scratch = tempfile.mkdtemp(prefix="b2_bucketed_")
    out: dict = {"metric": "b2_bucketed_vs_plain", "sf_dir": sf_dir, "n_buckets": n_buckets}

    t0 = time.time()
    write_bucketed(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
        "b2_lineitem_bkt", "l_orderkey", n_buckets, sort_key="l_orderkey",
        path=f"{scratch}/lineitem",
    )
    write_bucketed(
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        "b2_orders_bkt", "o_orderkey", n_buckets, sort_key="o_orderkey",
        path=f"{scratch}/orders",
    )
    out["bucketed_write_sec"] = round(time.time() - t0, 1)

    # plan audit on the FINALIZED adaptive plan (collect first, then read
    # executedPlan from the same DataFrame — the fresh-plan rule)
    bdf = _q22_bucketed(spark, sf_dir)
    rows_b = bdf.collect()
    plan = bdf._jdf.queryExecution().executedPlan().toString()
    pdf = q22(spark, sf_dir)
    rows_p = pdf.collect()
    plain_plan = pdf._jdf.queryExecution().executedPlan().toString()
    out["bucketed_scan_count"] = plan.count("Bucketed: true")
    out["exchange_count_bucketed"] = plan.count("Exchange")
    out["exchange_count_plain"] = plain_plan.count("Exchange")

    def timed(df):
        t = time.time()
        df.collect()
        return time.time() - t

    plain_t, bkt_t = [], []
    for _ in range(3):
        plain_t.append(timed(q22(spark, sf_dir)))
        bkt_t.append(timed(_q22_bucketed(spark, sf_dir)))
    out["plain_sec"] = [round(x, 2) for x in plain_t]
    out["bucketed_sec"] = [round(x, 2) for x in bkt_t]
    out["plain_best"] = round(min(plain_t), 2)
    out["bucketed_best"] = round(min(bkt_t), 2)
    out["speedup_best"] = round(min(plain_t) / min(bkt_t), 2)
    out["rows_match"] = sorted(map(tuple, rows_b)) == sorted(map(tuple, rows_p))

    for t in ("b2_lineitem_bkt", "b2_orders_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
