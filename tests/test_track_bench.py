"""Tracker quality gates: the wired KalmanTracker bank must hold measured
MOT quality on synthetic motion, including under the wire-degradation axes
the fault injector exercises (VERDICT r3 #7 — the 'wired the reference's
orphan' claim needs a number). Full battery + method: scripts/track_bench.py
and docs/BENCH_NOTES.md tracker section."""

import os
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.join(REPO, "scripts"))

from track_bench import SCENARIOS, simulate  # noqa: E402

FRAMES, TARGETS = 300, 4


def _run(name, seed=100):
    return simulate(FRAMES, TARGETS, seed=seed, **SCENARIOS[name])


def test_clean_scene_id_stability():
    r = _run("clean")
    # A clean detector on 4 crossing targets: with the calibrated KF
    # noise + motion-gated association (round 5) the clean scene is
    # PERFECT — 3/3 seeds measure MOTA 1.0, 0 id switches; gate with a
    # hair of slack.
    assert r["mota"] >= 0.99, r
    assert r["misses"] == 0, r
    assert r["id_switches"] <= 1, r
    assert r["mostly_tracked"] == 1.0, r


def test_noisy_detector_holds():
    r = _run("noisy")
    # Measured 0.90-0.92 over 3 seeds at the round-5 defaults (was 0.75).
    assert r["mota"] >= 0.85, r
    assert r["mostly_tracked"] >= 0.75, r


def test_lossy_wire_degrades_gracefully():
    # 10% whole-frame loss + timestamp jitter on top of detector noise:
    # quality degrades but does not collapse, and every target stays
    # mostly-tracked (coasting + silence-based expiry carry the gaps).
    r = _run("lossy_wire")
    # Measured 0.83-0.86 over 3 seeds at the round-5 defaults (was 0.60).
    assert r["mota"] >= 0.78, r
    assert r["mostly_tracked"] >= 0.75, r


def test_coasting_recovers_heavy_misses():
    # With p_miss=0.3 and NO coasting, coverage alone caps MOTA near 0.7
    # before FP/idsw costs; the measured ~0.8 proves coasted predictions
    # actually serve through detector gaps.
    r = _run("heavy_miss")
    # Measured 0.86-0.91 over 3 seeds at the round-5 defaults (was 0.72).
    assert r["mota"] > 0.82, r


def test_update_cost_bounded():
    # update() runs on the event-loop result path: its cost at wire-cap
    # scale (32 det/frame vs a full bank) must stay well under a frame
    # interval even on this 1-core box.
    r = simulate(120, 16, seed=7, jitter=0.006, p_miss=0.1, fp_rate=2.0,
                 p_drop=0.0, dt_jitter=0.0)
    assert r["update_ms_avg"] < 8.0, r


def test_crossing_density_at_wire_cap():
    # 32 targets (the wire's detection cap) crossing in the unit square:
    # pure association pressure. Measured 0.991-0.993 MOTA, 2-6 idsw over
    # 3 seeds at the round-5 defaults.
    r = _run("crossing_32")
    assert r["mota"] >= 0.98, r
    assert r["id_switches"] <= 12, r
    assert r["mostly_tracked"] == 1.0, r
    assert r["update_ms_avg"] < 8.0, r
