"""Canonical result comparison, mirroring the driver contract:
row count + column-name schema + order-insensitive value hash over
name-sorted columns (FIXTURES.md §3 canonicalization)."""

from __future__ import annotations

import datetime
import math

NULL = "∅"


def _cell(v) -> str:
    if v is None:
        return NULL
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # canonical float rendering: collapse 12-sig-digit representation
        return repr(round(v, 12))
    if isinstance(v, datetime.datetime):
        if v != v:  # pandas NaT (NULL timestamp from an outer join)
            return NULL
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    return str(v)


def canonical_rows(pdf) -> list[str]:
    """Name-sorted columns, canonical cells, sorted rows (order-insensitive)."""
    cols = sorted(pdf.columns)
    rows = [
        "|".join(_cell(v) for v in rec)
        for rec in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare(spark_df, duck_rel, name: str = "") -> None:
    """Assert spark result == duckdb result under driver canonicalization."""
    spk = spark_df.toPandas()
    dck = duck_rel.fetchdf()
    assert sorted(spk.columns) == sorted(dck.columns), (
        f"{name}: column mismatch spark={sorted(spk.columns)} duck={sorted(dck.columns)}"
    )
    assert len(spk) == len(dck), f"{name}: row count spark={len(spk)} duck={len(dck)}"
    srows, drows = canonical_rows(spk), canonical_rows(dck)
    mismatches = [(a, b) for a, b in zip(srows, drows) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(srows)} row mismatches; first: "
        f"spark={mismatches[0][0]!r} duck={mismatches[0][1]!r}"
    )
