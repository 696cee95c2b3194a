"""Smoke coverage for scripts/lane_physics.py — the gate-physics harness of
record (BENCH_NOTES full-rate lane tables). A short row must drive the real
ContinuousBatcher over a synthetic ladder and return coherent stats; rot
here would silently invalidate the p99-gate methodology."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from lane_physics import run_row  # noqa: E402


def test_lane_physics_row_smoke():
    ladder = {"2": 0.5, "4": 0.6, "8": 0.8, "16": 1.0, "32": 1.5, "64": 2.0}
    duration = 1.5
    row = run_row(ladder, "smoke", window_ms=1.0, rate=240.0, streams=4,
                  duration=duration)
    assert row["ladder"] == "smoke"
    assert row["streams"] == 4
    # ~360 frames offered; the tail-trimmed sample must be non-trivial and
    # latencies must be positive and bounded by gross overload values.
    assert row["served_fps"] > 120
    assert 0.0 < row["detect_p50_ms"] <= row["detect_p99_ms"] < 500.0
    # A loaded 1-core CI host can starve the submit pacer enough for the
    # (correct) drop-oldest admission to shed frames — the shed scales with
    # host contention (flaked at 3-4, then 26, under full-suite load), so
    # bound the drop FRACTION, not a lucky absolute: a real admission
    # regression sheds most of the offered rate, not a few percent.
    served = row["served_fps"] * duration
    assert row["dropped"] < 0.25 * (served + row["dropped"]), row
