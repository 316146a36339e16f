"""Sketch-aggregate accuracy: q46 now EMBEDS the tolerance check in its
output (per-group booleans comparing each engine's sketch against its
own exact aggregate — hash-comparable across engines). This test
asserts the booleans hold and independently re-derives the bound
against an exact computation, so a vacuous always-true query would
still be caught."""

from __future__ import annotations

from pyspark.sql import functions as F

from kfai_pipeline_spark.queries import REGISTRY

from tests.conftest import SF_ORACLE


def test_sketch_vs_exact(spark):
    out = {
        r["l_returnflag"]: r for r in REGISTRY["q46_sketch"].build(spark, SF_ORACLE).collect()
    }
    assert out, "q46 returned no groups"
    for flag, row in out.items():
        assert row["parts_within_10pct"] is True, flag
        assert row["median_within_5pct"] is True, flag

    # independent re-derivation: the sketches really do sit inside the band
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    both = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("ap"),
            F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(1000)).alias("am"),
            F.countDistinct("l_partkey").alias("ep"),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("em"),
        )
        .collect()
    )
    assert {r["l_returnflag"] for r in both} == out.keys()
    for r in both:
        # HLL++ default rsd = 5%; KLL accuracy 1000 -> <1% rank error here
        assert abs(r["ap"] - r["ep"]) / r["ep"] < 0.10
        assert abs(r["am"] - r["em"]) / r["em"] < 0.05
