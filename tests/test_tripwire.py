"""Synthetic tests for bench.py's drift tripwire (round-13 semantics).

The r13 verdict item: four consecutive rounds of bench flags all
attributed to machine noise at 3-4 fresh quiet sessions each. The
tripwire now compares floor-subtracted per-query times and annotates
DuckDB-control co-movement inline, so the actionable ``flagged`` list
only carries drift the run's own evidence cannot explain, while
``flagged_raw`` keeps the historical >1.3x-of-trail contract.

Pure-function tests — no SparkSession.
"""
from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench_module", mod)
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()


def _history(floor=0.05, q=0.45, dq=0.08, rounds=4):
    """N identical prior rounds: query q at ``q`` sec, control at
    ``dq``, session floor at ``floor``."""
    return [
        {
            "queries": {"b1": q, "b9": 0.15},
            "duckdb": {"b1": dq, "b9": 0.005},
            "floor_sec": floor,
        }
        for _ in range(rounds)
    ]


def test_inflated_floor_suppresses_flag():
    """The b1/b9 signature: the raw time crosses 1.3x of trail but the
    whole delta is the session floor swing — raw-flagged, annotated
    floor-noise, NOT in the actionable list."""
    hist = _history(floor=0.05, q=0.45)
    # floor ballooned 0.05 -> 0.25; query rose by exactly that delta
    timings = {"b1": 0.45 + 0.20, "b9": 0.15}
    med, raw, flagged, attr = bench.drift_flags(
        timings, floor_sec=0.25, duck={"b1": 0.08, "b9": 0.005},
        history=hist,
    )
    assert med["b1"] == 0.45
    assert raw == ["b1"]          # historical contract still fires
    assert flagged == []          # new semantics: explained by floor
    assert attr["b1"]["classification"] == "floor-noise"
    assert attr["b1"]["raw_ratio"] > 1.3
    assert attr["b1"]["floor_adjusted_ratio"] <= 1.3


def test_genuine_regression_flat_floor_still_flags():
    """Query up 1.5x, floor flat, control flat: flags exactly as the
    old tripwire did, classification genuine."""
    hist = _history(floor=0.05, q=0.45)
    timings = {"b1": 0.70, "b9": 0.15}
    _, raw, flagged, attr = bench.drift_flags(
        timings, floor_sec=0.05, duck={"b1": 0.08, "b9": 0.005},
        history=hist,
    )
    assert raw == ["b1"]
    assert flagged == ["b1"]
    assert attr["b1"]["classification"] == "genuine"


def test_comoving_control_suppresses_flag():
    """Spark up AND the same-run DuckDB control up >10% the same
    direction: the machine moved, not the plan."""
    hist = _history(floor=0.05, q=0.45, dq=0.08)
    timings = {"b1": 0.65, "b9": 0.15}
    _, raw, flagged, attr = bench.drift_flags(
        timings, floor_sec=0.06, duck={"b1": 0.11, "b9": 0.005},
        history=hist,
    )
    assert raw == ["b1"]
    assert flagged == []
    assert "co-moving" in attr["b1"]["classification"]
    assert attr["b1"]["duckdb_ratio"] > 1.1


def test_session_comoving_control_suppresses_flag():
    """The loaded-session signature measured at r13 open: every query
    inflated 1.3-3.1x, floor up, whole-suite DuckDB total up 1.55x —
    but an individual query's own 5-80 ms control happening to sit
    flat. The SESSION control ratio suppresses what the per-query one
    cannot."""
    hist = _history(floor=0.05, q=0.45, dq=0.08)  # duck total 0.085
    timings = {"b1": 1.0, "b9": 0.15}
    _, raw, flagged, attr = bench.drift_flags(
        # b1's own control flat (0.08) but b9's control ballooned ->
        # session total 0.08 + 0.02 = 0.10 -> ratio 1.18? need >1.25:
        timings, floor_sec=0.15, duck={"b1": 0.08, "b9": 0.035},
        history=hist,
    )
    assert raw == ["b1"]
    assert flagged == []
    assert attr["b1"]["duckdb_ratio"] <= 1.1  # per-query control flat
    assert attr["b1"]["session_duckdb_ratio"] > 1.25
    assert "session-co-moving" in attr["b1"]["classification"]


def test_missing_control_does_not_suppress():
    """No DuckDB arm (package missing / oracle drift): co-movement is
    unknowable — a raw flag with flat floor stays actionable."""
    hist = _history(floor=0.05, q=0.45)
    timings = {"b1": 0.70, "b9": 0.15}
    _, raw, flagged, attr = bench.drift_flags(
        timings, floor_sec=0.05, duck={}, history=hist,
    )
    assert flagged == ["b1"]
    assert attr["b1"]["duckdb_ratio"] is None


def test_no_history_no_flags():
    med, raw, flagged, attr = bench.drift_flags(
        {"b1": 0.5}, floor_sec=0.05, duck={}, history=[],
    )
    assert med == {} and raw == [] and flagged == [] and attr == {}


def test_tiny_query_denominator_guard():
    """Trailing median at/below the trailing floor (pure fixed-cost
    query): fall back to the raw ratio instead of dividing by ~0."""
    hist = [
        {"queries": {"bx": 0.05}, "duckdb": {}, "floor_sec": 0.05}
        for _ in range(3)
    ]
    _, raw, flagged, attr = bench.drift_flags(
        {"bx": 0.08}, floor_sec=0.05, duck={}, history=hist,
    )
    assert raw == ["bx"]
    # raw-ratio fallback (0.08/0.05 = 1.6 > 1.3) -> stays actionable
    assert flagged == ["bx"]
    assert attr["bx"]["floor_adjusted_ratio"] == attr["bx"]["raw_ratio"]


def test_history_loader_excludes_latest_round(tmp_path):
    """load_bench_history drops the highest-numbered file (the
    in-flight round's own measurement) and filters by SF."""
    import json

    for n, b1 in [(1, 0.4), (2, 0.5), (3, 9.9)]:
        (tmp_path / f"BENCH_r{n:02d}.json").write_text(
            json.dumps(
                {"parsed": {"sf": 0.1, "queries": {"b1": b1},
                            "floor_sec": 0.05}}
            )
        )
    (tmp_path / "BENCH_r04.json").write_text(
        json.dumps({"sf": 1.0, "queries": {"b1": 0.1}})
    )
    hist = bench.load_bench_history(str(tmp_path), 0.1)
    # r04 is the highest -> excluded; r03 is sf-mismatched? no — r03 IS
    # 0.1 and r04 (sf1) is the excluded-highest, so r01-r03 remain.
    vals = sorted(d["queries"]["b1"] for d in hist)
    assert vals == [0.4, 0.5, 9.9]
    hist_sf1 = bench.load_bench_history(str(tmp_path), 1.0)
    assert hist_sf1 == []


# ---------------------------------------------------------------- r14:
# arm-level self-attribution (r13 verdict item #2). growth_arm() feeds
# the SAME drift_flags with per-arm history sections (each inheriting
# its round's headline floor); these tests pin the arm-history shape
# end to end through a synthetic BENCH file set.

def _arm_hist(rounds=4, q=4.5, dq=2.2, floor=0.05):
    return [
        {
            "sf10": {
                "queries": {"b2": q, "b7": 3.0},
                "duckdb": {"b2": dq, "b7": 1.6},
                "duckdb_total": dq + 1.6,
            },
            "floor_sec": floor,
        }
        for _ in range(rounds)
    ]


def _arm_sections(history, arm_key="sf10"):
    """Mirror growth_arm's arm-history construction."""
    return [
        {**d[arm_key], "floor_sec": d.get("floor_sec")}
        for d in history
        if isinstance(d.get(arm_key), dict)
    ]


def test_arm_comoving_control_annotated_not_actionable():
    """A degraded-host sf10 sample (the r13 17.55 s chase class): the
    arm query is 1.6x its trail but the arm's own DuckDB control moved
    2.4x — raw-flagged, annotated co-moving, suppressed."""
    hist = _arm_sections(_arm_hist())
    med, raw, flagged, attr = bench.drift_flags(
        {"b2": 7.2, "b7": 3.0}, floor_sec=0.05,
        duck={"b2": 5.3, "b7": 1.6}, history=hist,
    )
    assert raw == ["b2"]
    assert flagged == []
    assert "co-moving" in attr["b2"]["classification"]


def test_arm_genuine_regression_flat_control_flags():
    """An arm query regresses with BOTH controls flat: stays
    actionable — arm attribution must not blanket-suppress."""
    hist = _arm_sections(_arm_hist())
    med, raw, flagged, attr = bench.drift_flags(
        {"b2": 7.2, "b7": 3.0}, floor_sec=0.05,
        duck={"b2": 2.2, "b7": 1.6}, history=hist,
    )
    assert raw == ["b2"]
    assert flagged == ["b2"]
    assert attr["b2"]["classification"] == "genuine"
