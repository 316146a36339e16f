"""Filter-compiler tests: the reference's build_filter expectation table
(ported from /root/reference/tests/loaders/utils/test_filtering.py:10-78)
plus compile_filter semantics applied to a real DataFrame."""

from __future__ import annotations

import pytest

from kfai_pipeline_spark.functions.datetime_fns import iso_to_epoch  # noqa: F401 (surface)
from kfai_pipeline_spark.plans.filter_compiler import (
    FilterCompileError,
    build_filter,
    compile_filter,
)

from tests.conftest import SF_SMOKE


def _epoch(iso: str) -> int:
    from datetime import datetime, timezone

    return int(datetime.fromisoformat(iso).replace(tzinfo=timezone.utc).timestamp())


# ---- build_filter expectation table (reference test cases 1-6) ----
@pytest.mark.parametrize(
    "kwargs, expected_part",
    [
        ({"shows": ["Show A"]}, {"show_name": {"$in": ["Show A"]}}),
        ({"hosts": ["Host_B"]}, {"hosts": {"$like": "%Host\\_B%"}}),
        ({"exact_year": 2023}, {"published_at": {"$gte": _epoch("2023-01-01T00:00:00")}}),
        ({"year_range": "2020-2022"}, {"published_at": {"$lte": _epoch("2022-12-31T23:59:59")}}),
        ({"before_year": 2019}, {"published_at": {"$lte": _epoch("2018-12-31T23:59:59")}}),
        (
            {"after_year": 2022, "current_year": 2024},
            {"published_at": {"$gte": _epoch("2023-01-01T00:00:00")}},
        ),
    ],
)
def test_build_filter_individual_conditions(kwargs, expected_part):
    result = build_filter(**kwargs)
    assert result is not None and "$and" in result
    assert any(
        all(item in condition.items() for item in expected_part.items())
        for condition in result["$and"]
    )


def test_build_filter_before_year_floor():
    result = build_filter(before_year=2019)
    assert {"published_at": {"$gte": 1325376000}} in result["$and"]


def test_build_filter_empty_is_none():
    assert build_filter() is None
    assert build_filter(shows=[], hosts=[]) is None


def test_build_filter_combined():
    result = build_filter(shows=["A"], hosts=["h"], exact_year=2020)
    assert len(result["$and"]) == 4  # gte, lte, shows, hosts


# ---- compile_filter -> Column semantics on a real table ----
def test_compile_filter_on_events(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    total = ev.count()

    assert ev.where(compile_filter(None)).count() == total

    f = {"$and": [{"user_id": {"$gte": 10}}, {"user_id": {"$lte": 20}}]}
    expected = ev.where("user_id >= 10 AND user_id <= 20").count()
    assert ev.where(compile_filter(f)).count() == expected

    f = {"$or": [{"event_type": "click"}, {"event_type": {"$in": ["view", "purchase"]}}]}
    expected = ev.where("event_type IN ('click','view','purchase')").count()
    assert ev.where(compile_filter(f)).count() == expected

    f = {"$not": {"event_type": {"$like": "c%"}}}
    expected = ev.where("event_type NOT LIKE 'c%'").count()
    assert ev.where(compile_filter(f)).count() == expected

    f = {"event_type": {"$ilike": "%CLICK%"}}
    expected = ev.where("event_type ILIKE '%CLICK%'").count()
    assert ev.where(compile_filter(f)).count() == expected

    # op-map with multiple ops ANDs together; $between equivalent
    a = ev.where(compile_filter({"user_id": {"$gt": 5, "$lt": 9}})).count()
    b = ev.where("user_id > 5 AND user_id < 9").count()
    assert a == b
    c = ev.where(compile_filter({"user_id": {"$between": [6, 8]}})).count()
    assert c == b

    f = {"event_type": {"$ne": "click"}, "user_id": {"$nin": [1, 2, 3]}}
    expected = ev.where(
        "event_type <> 'click' AND user_id NOT IN (1,2,3)"
    ).count()
    assert ev.where(compile_filter(f)).count() == expected

    assert ev.where(compile_filter({"props": {"$exists": True}})).count() == ev.where(
        "props IS NOT NULL"
    ).count()


def test_compile_filter_rejects_unknown_ops():
    with pytest.raises(FilterCompileError):
        compile_filter({"f": {"$regex": "x"}})
    with pytest.raises(FilterCompileError):
        compile_filter({"$xor": []})
    with pytest.raises(FilterCompileError):
        compile_filter({"f": {"$in": "not-a-list"}})
