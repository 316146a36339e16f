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


# ------------------------------------------------------------------ z-order


def test_zvalue_hand_interleave(spark):
    from kfai_pipeline_spark.operators.partitioning import zvalue

    # bits=2, x=0b10, y=0b01: bit i of x -> pos 2i+1, bit i of y -> 2i
    # x bits (i=0:0, i=1:1) -> positions 1,3 => 0b1000
    # y bits (i=0:1, i=1:0) -> positions 0,2 => 0b0001
    df = spark.createDataFrame([(2, 1)], "x long, y long")
    z = df.select(zvalue([F.col("x"), F.col("y")], bits=2).alias("z")).collect()
    assert z[0]["z"] == 0b1001
    # single column degenerates to identity for bits covering the value
    one = spark.createDataFrame([(5,)], "x long")
    assert one.select(zvalue([F.col("x")], bits=4).alias("z")).collect()[0]["z"] == 5


def test_zvalue_guards():
    import pytest as _pytest

    from kfai_pipeline_spark.operators.partitioning import zvalue

    with _pytest.raises(ValueError):
        zvalue([], bits=4)
    with _pytest.raises(ValueError):
        zvalue([F.lit(0), F.lit(0)], bits=32)  # 64 > 62


def test_zorder_frame_preserves_content_and_handles_nulls(spark):
    from kfai_pipeline_spark.operators.partitioning import zorder_frame

    rows = [(i, float((i * 37) % 101), f"p{i}") for i in range(500)]
    rows += [(500, None, "pn"), (501, 3.0, None)]
    df = spark.createDataFrame(rows, "user_id long, value double, payload string")
    out = zorder_frame(df, ["user_id", "value"], bits=8)
    assert sorted(map(tuple, out.collect())) == sorted(rows)
    assert out.columns == df.columns  # helper column dropped


def test_zorder_frame_empty_and_constant_columns(spark):
    from kfai_pipeline_spark.operators.partitioning import zorder_frame

    empty = spark.createDataFrame([], "user_id long, value double")
    assert zorder_frame(empty, ["user_id", "value"]).collect() == []
    const = spark.createDataFrame([(1, 7.0), (2, 7.0)], "u long, v double")
    assert sorted(
        map(tuple, zorder_frame(const, ["v"]).collect())
    ) == [(1, 7.0), (2, 7.0)]


def test_zorder_write_roundtrip_and_row_groups(spark, tmp_path_factory):
    import pyarrow.parquet as pq

    from kfai_pipeline_spark.operators.partitioning import zorder_write

    path = str(tmp_path_factory.mktemp("zorder") / "t")
    df = spark.range(20_000).select(
        F.col("id"),
        (F.col("id") % 97).alias("user_id"),
        (F.col("id") % 31 * 1.5).alias("value"),
    )
    zorder_write(df, path, ["user_id", "value"], bits=10, num_partitions=4,
                 row_group_bytes=64 * 1024)
    back = spark.read.parquet(path)
    assert back.count() == 20_000
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # the row-group cap took effect: at least one multi-group file
    import os as _os

    parts = [
        f for f in _os.listdir(path) if f.endswith(".parquet")
    ]
    assert 1 <= len(parts) <= 4
    groups = sum(pq.ParquetFile(_os.path.join(path, f)).metadata.num_row_groups
                 for f in parts)
    assert groups >= len(parts)  # sanity: metadata readable, >=1 group/file


def test_zorder_quantile_bucketing_resists_outliers(spark):
    from kfai_pipeline_spark.operators.partitioning import zorder_frame

    # 1000 uniform values + one 1e12 outlier: linear min/max squashes
    # the whole uniform bulk into bucket 0 (no clustering at all);
    # quantile bucketing assigns rank-like ids so the bulk still
    # clusters by value
    rows = [(i, float(i % 100)) for i in range(1000)] + [(1000, 1e12)]
    df = spark.createDataFrame(rows, "id long, v double")

    lin = zorder_frame(df, ["v"], bits=8, bucketing="linear", num_partitions=8)
    qnt = zorder_frame(df, ["v"], bits=8, bucketing="quantile", num_partitions=8)
    # content preserved by both
    assert sorted(map(tuple, lin.collect())) == sorted(rows)
    assert sorted(map(tuple, qnt.collect())) == sorted(rows)

    def bulk_spans(out) -> list[float]:
        """Per-partition value span of the uniform bulk (outlier
        excluded — it legitimately shares a partition with the top
        ranks and would dominate any span it touches)."""
        parts = out.where(F.col("v") < 1000).select("v").rdd.glom().collect()
        return [
            max(r["v"] for r in p) - min(r["v"] for r in p)
            for p in parts
            if len(p) > 1
        ]

    spans_lin = bulk_spans(lin)
    spans_qnt = bulk_spans(qnt)
    # linear: the bulk is one constant-0 bucket -> at least one
    # partition mixes (nearly) the full 0-99 range
    assert max(spans_lin) > 90.0, spans_lin
    # quantile: every partition of the bulk is a tight value range
    assert max(spans_qnt) < 40.0, spans_qnt


def test_zorder_bucketing_guard(spark):
    import pytest as _pytest

    from kfai_pipeline_spark.operators.partitioning import zorder_frame

    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    with _pytest.raises(ValueError):
        zorder_frame(df, ["v"], bucketing="nope")


def test_zorder_quantile_wide_column_set_fits_interleave(spark):
    # quantile buckets occupy at most 8 bits, so 5 columns at the
    # default bits=16 must NOT trip the bits*cols<=62 overflow guard
    # (5 x 8 = 40); linear at 16 bits correctly would (5 x 16 = 80)
    import pytest as _pytest

    from kfai_pipeline_spark.operators.partitioning import zorder_frame

    cols = ["a", "b", "c", "d", "e"]
    df = spark.createDataFrame(
        [(float(i), float(i * 2), float(i % 3), float(i % 5), float(i % 7))
         for i in range(50)],
        "a double, b double, c double, d double, e double",
    )
    out = zorder_frame(df, cols, bits=16, bucketing="quantile")
    assert out.count() == 50
    with _pytest.raises(ValueError):
        zorder_frame(df, cols, bits=16, bucketing="linear")


# ------------------------------------------------------------------ compaction


def test_compact_to_reduces_files_and_preserves_content(spark, tmp_path_factory):
    from kfai_pipeline_spark.operators.partitioning import compact_to

    root = tmp_path_factory.mktemp("compact")
    src, dest = str(root / "frag"), str(root / "out")
    df = spark.range(10_000).select(
        "id", (F.col("id") % 7).alias("k"), (F.col("id") * 1.5).alias("v")
    )
    df.repartition(24).write.parquet(src)
    stats = compact_to(spark, src, dest, target_bytes=64 * 1024 * 1024)
    assert stats["files_before"] == 24
    assert stats["files_after"] < stats["files_before"]
    assert stats["n_target"] == 1  # everything fits one target file
    back = spark.read.parquet(dest)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_compact_to_partitioned_compacts_within_partitions(
    spark, tmp_path_factory
):
    import os

    from kfai_pipeline_spark.operators.partitioning import compact_to

    root = tmp_path_factory.mktemp("compactp")
    src, dest = str(root / "frag"), str(root / "out")
    df = spark.range(6_000).select(
        "id", (F.col("id") % 3).alias("part"), (F.col("id") % 11).alias("v")
    )
    # the T x k disease: 16 tasks each write into all 3 partitions
    df.repartition(16).write.partitionBy("part").parquet(src)
    n_frag = sum(
        1 for dp, _, fs in os.walk(src) for f in fs if f.endswith(".parquet")
    )
    assert n_frag >= 3 * 8  # genuinely fragmented fixture
    stats = compact_to(
        spark, src, dest, target_bytes=64 * 1024 * 1024,
        partition_cols=["part"],
    )
    assert stats["files_after"] <= 3  # one-ish file per partition
    assert {d for d in os.listdir(dest) if d.startswith("part=")} == {
        "part=0", "part=1", "part=2"
    }
    back = spark.read.parquet(dest).select("id", "part", "v")
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_list_data_files_skips_markers(spark, tmp_path_factory):
    from kfai_pipeline_spark.operators.partitioning import _list_data_files

    root = tmp_path_factory.mktemp("listing")
    p = str(root / "t")
    spark.range(10).write.parquet(p)
    files = _list_data_files(spark, p)
    assert files and all(f.endswith(".parquet") for f, _ in files)
    assert all(b > 0 for _, b in files)


def test_optimize_table_compacts_clusters_and_reports_stats(
    spark, tmp_path_factory
):
    """X50b: one call = compaction sizing + z-order + catalog stats,
    content-preserving, committed behind _SUCCESS."""
    import os

    from kfai_pipeline_spark.operators.partitioning import optimize_table

    root = str(tmp_path_factory.mktemp("optimize"))
    src, dest = os.path.join(root, "src"), os.path.join(root, "dest")
    df = spark.range(5000).select(
        F.col("id"),
        (F.col("id") % 37).alias("a"),
        (F.col("id") % 11).cast("double").alias("b"),
    )
    df.repartition(32).write.parquet(src)
    stats = optimize_table(
        spark, src, dest, zorder_cols=["a", "b"], target_bytes=64 * 1024 * 1024,
        bits=8,
    )
    assert stats["files_before"] == 32
    assert stats["files_after"] <= stats["n_target"] <= stats["files_before"]
    assert stats["n_rows"] == 5000
    assert stats["col_stats"]["a"] == {"min": 0, "max": 36, "n_nulls": 0}
    assert stats["col_stats"]["b"]["min"] == 0.0
    assert os.path.exists(os.path.join(dest, "_SUCCESS"))
    # content equality: same multiset of rows
    back = spark.read.parquet(dest)
    assert back.count() == 5000
    assert (
        back.agg(F.sum("id"), F.sum("a"), F.sum("b")).collect()
        == df.agg(F.sum("id"), F.sum("a"), F.sum("b")).collect()
    )


def test_optimize_table_plain_compaction_arm(spark, tmp_path_factory):
    """zorder_cols=None degrades to pure X48 compaction (no sort, no
    stats beyond the row count)."""
    import os

    from kfai_pipeline_spark.operators.partitioning import optimize_table

    root = str(tmp_path_factory.mktemp("optimize_plain"))
    src, dest = os.path.join(root, "src"), os.path.join(root, "dest")
    spark.range(100).repartition(16).write.parquet(src)
    stats = optimize_table(spark, src, dest, target_bytes=1 << 30)
    assert stats["files_after"] == 1
    assert stats["n_rows"] == 100
    assert stats["col_stats"] == {}
    assert spark.read.parquet(dest).count() == 100


def test_optimize_table_reads_evolving_table_through_catalog_pin(
    spark, tmp_path_factory
):
    """Round-9 verdict item #2: OPTIMIZE runs on exactly the
    multi-vintage tables schema inference is unsafe for (§5v) — with a
    catalog pin registered for the src path, optimize_table resolves
    it by default and the rewritten copy keeps every vintage's rows
    AND the added column (plain inference crashes on the widened
    column or silently drops the added one)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from kfai_pipeline_spark.catalog import pin_table_schema
    from kfai_pipeline_spark.operators.partitioning import optimize_table

    root = str(tmp_path_factory.mktemp("opt_evolve"))
    src = os.path.join(root, "store.parquet")
    dest = os.path.join(root, "store_opt.parquet")
    os.makedirs(src)
    # vintage A: label int32, no model_rev; vintage B: widened + added
    pq.write_table(
        pa.table({
            "vec_id": pa.array([1, 2], pa.int64()),
            "label": pa.array([10, 20], pa.int32()),
        }),
        f"{src}/part-a.parquet",
    )
    pq.write_table(
        pa.table({
            "vec_id": pa.array([3, 4], pa.int64()),
            "label": pa.array([30, 40], pa.int64()),
            "model_rev": pa.array(["v2", "v2"], pa.string()),
        }),
        f"{src}/part-b.parquet",
    )
    pin_table_schema(root, "store", "vec_id bigint, label bigint, model_rev string")
    try:
        stats = optimize_table(spark, src, dest, zorder_cols=["vec_id"])
        assert stats["n_rows"] == 4
        # stats read-back also rides the pin: widened bigint domain
        assert stats["col_stats"]["vec_id"] == {"min": 1, "max": 4, "n_nulls": 0}
        back = spark.read.parquet(dest)
        assert sorted(back.columns) == ["label", "model_rev", "vec_id"]
        rows = sorted(
            (r["vec_id"], r["label"], r["model_rev"]) for r in back.collect()
        )
        assert rows == [(1, 10, None), (2, 20, None), (3, 30, "v2"), (4, 40, "v2")]
    finally:
        pin_table_schema(root, "store", None)


def test_pinned_schema_for_path_matches_both_layouts():
    """Path->pin resolution covers the fixture layout (name.parquet)
    and bare app-workdir dirs (workdir/table)."""
    from kfai_pipeline_spark.catalog import (
        pin_table_schema,
        pinned_schema_for_path,
    )

    pin_table_schema("/tmp/x", "t", "a int")
    try:
        assert pinned_schema_for_path("/tmp/x/t.parquet") == "a int"
        assert pinned_schema_for_path("/tmp/x/t") == "a int"
        assert pinned_schema_for_path("/tmp/x/t/") == "a int"
        assert pinned_schema_for_path("/tmp/x/other") is None
    finally:
        pin_table_schema("/tmp/x", "t", None)
