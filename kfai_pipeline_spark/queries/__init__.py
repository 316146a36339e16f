"""Declared-query registry (SURVEY.md §2.12).

Every query is registered with a Spark builder ``(spark, sf_dir) ->
DataFrame`` and, when SQL-expressible, a DuckDB oracle SQL string over
the same parquet tables. The driver hash-compares both at sf0.01.

Import side effects populate ``REGISTRY``.
"""

from __future__ import annotations

from kfai_pipeline_spark.queries.base import REGISTRY, Query, register

# populate the registry
from kfai_pipeline_spark.queries import relational as _relational  # noqa: E402,F401
from kfai_pipeline_spark.queries import extensions as _extensions  # noqa: E402,F401
from kfai_pipeline_spark.queries import llm_data as _llm_data  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "register"]


def spark_queries():
    """name -> (spark, sf_dir) -> DataFrame, for __spark_entry__.queries()."""
    return {name: q.build for name, q in REGISTRY.items()}


def oracle_queries():
    """name -> DuckDB SQL, for __spark_entry__.oracle_sql()."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
