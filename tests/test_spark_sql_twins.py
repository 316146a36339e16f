"""Parity: each Spark-SQL bench twin (queries/spark_sql.py) must return
exactly the canonical DataFrame builder's result. The bench times the
twins (fresh JVM-side plan per run); this is the proof they measure
the same query."""

from __future__ import annotations

import pytest

from kfai_pipeline_spark.catalog import register_views
from kfai_pipeline_spark.queries import REGISTRY
from kfai_pipeline_spark.queries.spark_sql import BENCH_SQL

from conftest import SF_ORACLE
from oracle_utils import canonical_rows


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    register_views(spark, SF_ORACLE)


@pytest.mark.parametrize("qname", sorted(BENCH_SQL))
def test_twin_matches_builder(spark, qname):
    twin = canonical_rows(spark.sql(BENCH_SQL[qname]).toPandas())
    built = canonical_rows(REGISTRY[qname].build(spark, SF_ORACLE).toPandas())
    assert twin == built, f"{qname}: SQL twin diverges from DataFrame builder"
