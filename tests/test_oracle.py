"""t2 contract: every declared query with an oracle hash-matches DuckDB
at sf0.01 (SURVEY.md §5.2 item 2). This mirrors what the driver runs."""

from __future__ import annotations

import pytest

from kfai_pipeline_spark.queries import REGISTRY

from tests.conftest import SF_ORACLE
from tests.oracle_utils import compare

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, duck, name):
    q = REGISTRY[name]
    compare(q.build(spark, SF_ORACLE), duck.sql(q.oracle), name)


ROWS_ONLY = sorted(name for name, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = REGISTRY[name]
    df = q.build(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
