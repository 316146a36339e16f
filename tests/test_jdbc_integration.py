"""LIVE JDBC round-trip integration tests (S1/S2/S10) against embedded
Derby — the in-JVM database Spark already ships for its Hive metastore
(pyspark/jars/derby-*.jar), so the stock ``format("jdbc")`` read/write
paths get exercised against a REAL database with zero extra
dependencies. In local mode executors share the driver JVM, so every
task's connection sees the same ``jdbc:derby:memory:`` store — the
same visibility a cluster gets from a networked database.

Covers what construction tests could not: actual DDL/insert round
trips, database-side query pushdown, parallel range-partitioned scans,
and batched writes. Postgres-specific surface (pgvector JSONB resume
scan, S11) stays construction-tested — Derby has no JSONB.

Derby quirk worth documenting: Spark writes case-preserving quoted
identifiers, so database-side SQL must quote them ("id", not ID).
"""

from __future__ import annotations

import glob
import os

import pytest

import pyspark

from kfai_pipeline_spark.sources import jdbc as J

_DERBY_PRESENT = bool(
    glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "derby-*.jar"))
)
pytestmark = pytest.mark.skipif(
    not _DERBY_PRESENT, reason="embedded Derby jars not shipped with this Spark"
)

PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _url(name: str) -> str:
    return f"jdbc:derby:memory:{name};create=true"


def test_write_read_roundtrip_and_append(spark):
    url = _url("rt")
    df = spark.range(100).selectExpr("id", "id * 2 as v")
    J.write_table(df, url, "t_rt", mode="overwrite", properties=PROPS)
    back = J.read_table(spark, url, "t_rt", properties=PROPS)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))

    J.write_table(df.where("id < 10"), url, "t_rt", mode="append", properties=PROPS)
    assert J.read_table(spark, url, "t_rt", properties=PROPS).count() == 110


def test_query_pushdown_executes_database_side(spark):
    url = _url("push")
    df = spark.range(1000).selectExpr("id", "CAST(id % 7 AS LONG) as grp")
    J.write_table(df, url, "t_push", mode="overwrite", properties=PROPS)
    # the WHERE and the aggregate both run inside Derby (query option);
    # identifiers must be quoted — Spark writes case-preserving names
    q = J.read_query(
        spark,
        url,
        'SELECT "grp", COUNT(*) AS "n" FROM t_push WHERE "id" < 700 GROUP BY "grp"',
        properties=PROPS,
    )
    got = {r["grp"]: r["n"] for r in q.collect()}
    assert sum(got.values()) == 700
    assert set(got) == set(range(7))


def test_parallel_range_partitioned_scan(spark):
    url = _url("par")
    df = spark.range(1000).selectExpr("id", "id * 3 as v")
    J.write_table(df, url, "t_par", mode="overwrite", properties=PROPS)
    par = J.read_table(
        spark,
        url,
        "t_par",
        partition_column='"id"',
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
        properties=PROPS,
    )
    assert par.rdd.getNumPartitions() == 4, "range scan must split into 4 queries"
    assert par.count() == 1000  # no row lost/duplicated at stride boundaries


def test_batched_write_batch_size_plumbs(spark):
    url = _url("batch")
    df = spark.range(100).selectExpr("id", "id as v")
    # the reference's pgvector batch size (256); odd size exercises the
    # final partial batch
    J.write_table(df, url, "t_b", mode="overwrite", batch_size=7, properties=PROPS)
    assert J.read_table(spark, url, "t_b", properties=PROPS).count() == 100


def test_snapshot_tables_mirrors_reference_export(spark, tmp_path):
    """The MySQL->SQLite export twin (ref database.py:20-131): multiple
    tables, one with a pushed-down predicate, land as parquet and read
    back row-identical."""
    url = _url("snap")
    videos = spark.createDataFrame(
        [(i, f"v{i}", i % 3, i % 5, i % 4) for i in range(100)],
        "id long, video_id string, show_id long, producer_id long, channel_id long",
    )
    shows = spark.createDataFrame([(i, f"show {i}") for i in range(3)], "id long, name string")
    J.write_table(videos, url, "videos_video", mode="overwrite", properties=PROPS)
    J.write_table(shows, url, "shows_show", mode="overwrite", properties=PROPS)

    counts = J.snapshot_tables(
        spark,
        url,
        {
            # the reference's channel_id < 3 predicate, pushed into the DB
            "videos_video": 'SELECT "id", "video_id", "show_id", "producer_id" '
            'FROM videos_video WHERE "channel_id" < 3',
            "shows_show": 'SELECT "id", "name" FROM shows_show',
        },
        str(tmp_path / "snap"),
        properties=PROPS,
    )
    assert counts == {"videos_video": 75, "shows_show": 3}
    snap = spark.read.parquet(str(tmp_path / "snap" / "videos_video.parquet"))
    assert snap.columns == ["id", "video_id", "show_id", "producer_id"]
    assert snap.where("id % 4 = 3").count() == 0, "predicate rows must be absent"


def test_json_metadata_resume_scan_end_to_end(spark):
    """S11's one previously construction-only path, live: the embedding
    store's JSON metadata column round-trips through a REAL database
    (VARCHAR JSON in Derby), the resume keys come back via
    scan -> get_json_object, and the composite-key anti join yields
    exactly the not-yet-embedded work items (q87's resume shape)."""
    import json

    from pyspark.sql import functions as F

    url = _url("jsonresume")
    # store: collection u1 holds 3 embedded chunks; u2 holds a decoy
    emb_rows = [
        ("u1", json.dumps({"video_id": "vidA", "start_time": 0.0})),
        ("u1", json.dumps({"video_id": "vidA", "start_time": 30.5})),
        ("u1", json.dumps({"video_id": "vidB", "start_time": 0.0})),
        ("u2", json.dumps({"video_id": "vidZ", "start_time": 99.0})),
    ]
    # Spark's default Derby mapping turns StringType into CLOB, which
    # Derby cannot compare/join on; the real store's columns are
    # VARCHAR/uuid, so type them explicitly (createTableColumnTypes)
    # to model that schema faithfully.
    J.write_table(
        spark.createDataFrame(emb_rows, "collection_id string, cmetadata string"),
        url, "langchain_pg_embedding", mode="overwrite",
        properties={
            **PROPS,
            "createTableColumnTypes":
                "collection_id VARCHAR(64), cmetadata VARCHAR(1024)",
        },
    )
    J.write_table(
        spark.createDataFrame(
            [("u1", "kfai"), ("u2", "other")], "uuid string, name string"
        ),
        url, "langchain_pg_collection", mode="overwrite",
        properties={
            **PROPS,
            "createTableColumnTypes": "uuid VARCHAR(64), name VARCHAR(256)",
        },
    )

    done = J.resume_keys_from_json(spark, url, "kfai", properties=PROPS)
    got = sorted(map(tuple, done.collect()))
    assert got == [("vidA", 0.0), ("vidA", 30.5), ("vidB", 0.0)]
    assert dict(done.dtypes) == {"video_id": "string", "start_time": "double"}

    # composite-key resume: all work minus the store contents
    work = spark.createDataFrame(
        [("vidA", 0.0), ("vidA", 30.5), ("vidA", 61.0),
         ("vidB", 0.0), ("vidC", 0.0), ("vidZ", 99.0)],
        "video_id string, start_time double",
    )
    from kfai_pipeline_spark.operators.pipeline import new_work

    todo = new_work(work, done, keys=["video_id", "start_time"])
    assert sorted(map(tuple, todo.collect())) == [
        ("vidA", 61.0), ("vidC", 0.0), ("vidZ", 99.0)
    ]


def test_identifier_validation_rejects_degenerate_and_dotted(spark):
    """The interpolated identifiers must be plain (per-segment) names:
    degenerate dotted forms ('a.', 'a..b') fail loudly here, not as an
    opaque JDBC error; metadata_col lives inside double quotes where a
    dot would be part of a literal column name, so dots are rejected."""
    url = "jdbc:derby:memory:never;create=true"
    for bad in ("a.", ".a", "a..b", 'x"; DROP TABLE t; --', "a-b", ""):
        with pytest.raises(ValueError):
            J.resume_keys_from_json(
                spark, url, "kfai", embedding_table=bad, properties=PROPS
            )
    with pytest.raises(ValueError):
        J.resume_keys_from_json(
            spark, url, "kfai", metadata_col="schema.col", properties=PROPS
        )
    # schema-qualified TABLE names remain legal (validation passes; the
    # missing table then fails database-side, which is fine to skip)
    import re as _re
    seg = r"[A-Za-z_][A-Za-z0-9_]*"
    assert _re.fullmatch(rf"{seg}(\.{seg})*", "app.langchain_pg_embedding")
