"""Partitioning toolkit tests: salted-join equivalence, selective skew
split, and shuffle-free bucketed joins (Exchange absent from the plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kfai_pipeline_spark.operators.partitioning import (
    salted_join,
    split_skew_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # key 'hot' carries 5k rows; 50 cold keys carry 10 each
    hot = spark.range(5000).select(
        F.lit("hot").alias("k"), F.col("id").alias("lval")
    )
    cold = spark.range(500).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").alias("lval"),
    )
    left = hot.unionByName(cold)
    right = spark.createDataFrame(
        [("hot", "H")] + [(f"c{i}", f"C{i}") for i in range(50)], "k string, rval string"
    )
    return left.cache(), right.cache()


def test_salted_join_matches_plain_join(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k").select("k", "lval", "rval")
    salted = salted_join(left, right, "k", n_salts=8).select("k", "lval", "rval")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark, skewed):
    left, right = skewed
    right_missing = right.where(F.col("k") != "hot")  # hot unmatched
    out = salted_join(left, right_missing, "k", n_salts=4, how="left")
    plain = left.join(right_missing, "k", "left")
    assert out.count() == plain.count()
    assert out.where(F.col("k") == "hot").where(F.col("rval").isNotNull()).count() == 0


def test_split_skew_join(spark, skewed):
    left, right = skewed
    out = split_skew_join(left, right, "k", hot_keys=["hot"], n_salts=8)
    plain = left.join(right, "k")
    assert out.count() == plain.count()


def test_partition_pruning_on_partitioned_sink(spark, tmp_path_factory):
    """year/month-partitioned writes prune at the scan: a year filter
    reads only that year's directories (PartitionFilters in the plan)."""
    import io, contextlib

    from kfai_pipeline_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    out = str(tmp_path_factory.mktemp("events_part"))
    ev = load_table(spark, SF_SMOKE, "events").withColumns(
        {"year": F.year("ts"), "month": F.month("ts")}
    )
    ev.write.partitionBy("year", "month").parquet(out, mode="overwrite")

    back = spark.read.parquet(out).where("year = 2024 AND month = 1")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "isnotnull(year" in plan and "2024" in plan
    expected = ev.where("year = 2024 AND month = 1").count()
    assert back.count() == expected


def test_bucketed_join_has_no_exchange(spark, skewed, tmp_path_factory):
    import io, contextlib

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    left, right = skewed
    write_bucketed(left, "t_bucket_a", "k", n_buckets=8)
    write_bucketed(right, "t_bucket_b", "k", n_buckets=8)
    joined = spark.table("t_bucket_a").join(spark.table("t_bucket_b"), "k")
    # disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert joined.count() == left.join(right, "k").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_aqe_skew_join_split_engages(spark):
    """The SURVEY §7 skew risk ("a 10-hour video must not become one
    straggler") has a runtime answer before any manual salting: AQE's
    skew-join split. With thresholds scaled to the fixture, a join
    whose hash partitioning puts ~90% of rows on one key must finalize
    as SortMergeJoin(skew=true) with the hot partition split across
    multiple AQEShuffleRead slices — and the result must be identical
    to the same join with skew handling off. salted_join remains the
    fallback for engines/joins AQE can't rewrite (see
    test_salted_join_matches_plain_join)."""
    keys = [
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.shuffle.partitions",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    try:
        # scale the skew-detection thresholds DOWN to the fixture (the
        # cluster defaults are 256M/5x): detection math is identical,
        # only the byte sizes shrink. Broadcast is disabled so the join
        # actually shuffles (the skewed regime: both sides large).
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100k"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.shuffle.partitions", "16")

        hot = spark.range(300_000).select(
            F.lit(0).alias("k"), F.col("id").alias("lval")
        )
        cold = spark.range(30_000).select(
            (F.col("id") % 200 + 1).alias("k"), F.col("id").alias("lval")
        )
        left = hot.unionByName(cold)
        right = spark.range(201).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("rval")
        )

        out = left.join(right, "k")
        n = len(out.collect())  # finalize THIS df's adaptive plan
        assert n == 330_000
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, f"AQE skew split did not engage:\n{plan[:2000]}"
        assert "skewed" in plan  # AQEShuffleRead slices the hot partition

        # skew handling off: same rows, no split marker (the straggler plan)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        base = left.join(right, "k")
        assert len(base.collect()) == n
        base_plan = base._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" not in base_plan
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
