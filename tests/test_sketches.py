"""Sketch-aggregate accuracy: approx_count_distinct / approx_percentile
within documented error bounds of the exact values (q46 has no SQL
oracle — this is its correctness check)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kfai_pipeline_spark.queries import REGISTRY

from tests.conftest import SF_ORACLE


def test_sketch_vs_exact(spark):
    approx = {
        r["l_returnflag"]: r for r in REGISTRY["q46_sketch"].build(spark, SF_ORACLE).collect()
    }
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("median"),
        )
        .collect()
    }
    assert approx.keys() == exact.keys()
    for flag, a in approx.items():
        e = exact[flag]
        # HLL++ default rsd = 5%
        assert abs(a["approx_parts"] - e["parts"]) / e["parts"] < 0.10
        # KLL with accuracy 1000 -> well under 1% rank error here
        assert abs(a["approx_median"] - e["median"]) / e["median"] < 0.05
