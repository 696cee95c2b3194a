"""Server->client AIMD rate control: decision unit tests + loopback e2e.

The wire vehicle is CONFIG_UPDATE (type 7) — declared by the reference
(types.h:81) with no body or handler; here it carries {"target_fps": N}
server->client, the escalation rung below resolution downshift.
"""

import asyncio
import threading
import time

import pytest

from zero_latency_yolo_tpu.config import ServerConfig
from zero_latency_yolo_tpu.runtime.ratecontrol import RateController

PORT = 27988


# ------------------------------------------------------------------- unit

def test_decrease_seeds_from_measured_rate_and_floors():
    rc = RateController(slo_ms=8.0, min_fps=15, target_fps=60)
    # Over SLO: first cut comes off the MEASURED per-client rate (not the
    # configured target) — 0.8 x 50 = 40.
    assert rc.tick(20.0, 50.0) == 40
    # Cooldown: the rolling p99 lags; the next tick re-broadcasts, no cut.
    assert rc.tick(20.0, 40.0) == 40
    # Cooldown elapsed: multiplicative decrease continues, 0.8 x 40 = 32.
    assert rc.tick(20.0, 40.0) == 32
    rc2 = RateController(slo_ms=8.0, min_fps=15, target_fps=60,
                         decrease_cooldown=1)
    for _ in range(20):
        last = rc2.tick(100.0, 60.0)
    assert last == 15  # floored at min_fps, never below


def test_hold_band_keeps_rebroadcasting_without_change():
    rc = RateController(slo_ms=8.0, min_fps=15, target_fps=60)
    assert rc.tick(20.0, 60.0) == 48
    # p99 back under SLO but above the 70% recovery band: hold.
    assert rc.tick(7.0, 48.0) == 48
    assert rc.hint == 48


def test_additive_recovery_and_restore():
    rc = RateController(slo_ms=8.0, min_fps=15, target_fps=20,
                        decrease_cooldown=1, restore_ticks=2)
    assert rc.tick(20.0, 20.0) == 16
    # Recovered: +10% (>= 1 fps) per tick...
    assert rc.tick(2.0, 16.0) == 17
    assert rc.tick(2.0, 17.0) == 18
    assert rc.tick(2.0, 18.0) == 19
    # ...reaching the target broadcasts the full rate and stands down.
    assert rc.tick(2.0, 19.0) == 20
    assert rc.hint is None
    # The restore is RE-broadcast for restore_ticks healthy ticks — a
    # single lost CONFIG_UPDATE must not strand a client throttled.
    assert rc.tick(2.0, 20.0) == 20
    assert rc.tick(2.0, 20.0) == 20
    assert rc.tick(2.0, 20.0) is None  # uncontrolled: nothing to send


def test_overload_during_restore_window_cuts_again():
    rc = RateController(slo_ms=8.0, min_fps=5, target_fps=20,
                        decrease_cooldown=1, restore_ticks=3)
    assert rc.tick(20.0, 20.0) == 16
    for _ in range(6):
        fps = rc.tick(2.0, 16.0)
    assert fps == 20 and rc.hint is None  # restored, window active
    # Load returns mid-window: cut immediately, cancel the restore.
    assert rc.tick(20.0, 20.0) == 16
    assert rc.hint == 16


def test_drop_fraction_triggers_decrease_without_latency_signal():
    # Steady shedding: dropped frames produce no latency sample, so p99
    # looks healthy — the drop fraction must drive the cut on its own.
    rc = RateController(slo_ms=8.0, min_fps=15, target_fps=60,
                        decrease_cooldown=1)
    assert rc.tick(3.0, 50.0, drop_frac=0.5) == 40
    assert rc.tick(3.0, 40.0, drop_frac=0.3) == 32
    # Drops above the recovery band but under the SLO: hold, no increase.
    assert rc.tick(3.0, 32.0, drop_frac=0.04) == 32
    # Drops cleared: additive recovery resumes.
    assert rc.tick(3.0, 32.0, drop_frac=0.0) == 35


def test_disabled_and_empty_inputs():
    rc = RateController(slo_ms=0.0, min_fps=15, target_fps=60)
    assert rc.tick(500.0, 60.0) is None
    rc = RateController(slo_ms=8.0, min_fps=15, target_fps=60)
    assert rc.tick(None, None) is None          # no latency samples yet
    # No measured rate: the first cut seeds from the configured target.
    assert rc.tick(20.0, None) == 48


def test_config_gates_rate_control_fields():
    with pytest.raises(ValueError, match="rate_control_slo_ms"):
        ServerConfig.from_dict({"tpu": {"rate_control_slo_ms": float("nan")}})
    with pytest.raises(ValueError, match="rate_control_min_fps"):
        ServerConfig.from_dict({"tpu": {"rate_control_min_fps": 0}})
    cfg = ServerConfig.from_dict(
        {"tpu": {"rate_control_slo_ms": 8.0, "rate_control_min_fps": 10}})
    assert cfg.tpu.rate_control_slo_ms == 8.0


# -------------------------------------------------------------------- e2e

def test_rate_control_e2e_loopback():
    """Overloaded server (SLO set far below the sim-mode detect p99)
    broadcasts CONFIG_UPDATE fps hints; the client's receiver parses them;
    /status reports the controller state."""
    from zero_latency_yolo_tpu.runtime.server import DetectionServer
    from zero_latency_yolo_tpu.runtime.simulator import (
        SimClient, synthetic_frame)

    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent/model.npz",  # simulation mode
        "port": PORT, "web_port": 0, "max_clients": 2, "target_fps": 60,
        "network": {"timeout_ms": 20000},
        "tpu": {"batch_window_ms": 1.0, "frame_buckets": [[64, 96]],
                "batch_buckets": [1, 2],
                # detect p99 in sim mode is >= the 1 ms batch window, so
                # this SLO is always exceeded while frames flow.
                "rate_control_slo_ms": 0.2, "rate_control_min_fps": 5},
    })
    server = DetectionServer(cfg)
    loop = asyncio.new_event_loop()
    t = threading.Thread(target=loop.run_forever, daemon=True)
    t.start()
    asyncio.run_coroutine_threadsafe(server.start(), loop).result(30)
    c = SimClient(("127.0.0.1", PORT), screen_width=96, screen_height=64)
    try:
        c.connect()
        c.start_receiver()
        frame = synthetic_frame(96, 64)
        stop = time.monotonic() + 14.0
        hint = None
        while time.monotonic() < stop:
            c.send_raw_frame(frame)
            hint = c.server_settings.get("target_fps")
            if hint is not None:
                break
            time.sleep(1.0 / 40.0)  # ~40 fps offered
        assert hint is not None, "no CONFIG_UPDATE rate hint within 14s"
        assert 5 <= hint < 60, hint
        assert c.config_updates_seen >= 1
        st = server.status()
        assert st["rate_control"]["hint_fps"] == hint
        assert st["rate_control"]["updates_sent"] >= 1
    finally:
        c.stop()
        asyncio.run_coroutine_threadsafe(server.stop(), loop).result(30)
        loop.call_soon_threadsafe(loop.stop)
        t.join(timeout=5)


def test_floor_probe_latch_unpins_load_invariant_drops():
    """A drop fraction that does NOT respond to cuts (hint-ignoring or
    misbehaving sender) must not pin well-behaved clients at min_fps
    forever: at the floor with a healthy p99, the drop signal disarms
    after floor_probe_ticks and recovery proceeds on p99 alone; the
    signal re-arms only after the fraction clears the recovery band once."""
    rc = RateController(slo_ms=8.0, min_fps=15, target_fps=20,
                        decrease_cooldown=1, floor_probe_ticks=3,
                        restore_ticks=0)
    # Invariant 50% drop fraction, p99 always healthy: cut to the floor.
    assert rc.tick(2.0, 20.0, drop_frac=0.5) == 16
    assert rc.tick(2.0, 16.0, drop_frac=0.5) == 15  # floor
    # Held at the floor for floor_probe_ticks (latch counting)...
    assert rc.tick(2.0, 15.0, drop_frac=0.5) == 15
    assert rc.tick(2.0, 15.0, drop_frac=0.5) == 15
    # ...then the latch opens: recovery resumes DESPITE the drops.
    assert rc.tick(2.0, 15.0, drop_frac=0.5) == 16
    assert rc.tick(2.0, 16.0, drop_frac=0.5) == 17
    assert rc.tick(2.0, 17.0, drop_frac=0.5) == 18
    assert rc.tick(2.0, 18.0, drop_frac=0.5) == 19
    assert rc.tick(2.0, 19.0, drop_frac=0.5) == 20  # restored
    assert rc.hint is None
    # Disarmed: the still-high fraction cannot cut again...
    assert rc.tick(2.0, 20.0, drop_frac=0.5) is None
    # ...but a latency breach still can (p99 governs while disarmed).
    assert rc.tick(20.0, 20.0, drop_frac=0.5) == 16
    # Recover via p99; drops still high -> climb allowed while disarmed.
    for _ in range(10):
        fps = rc.tick(2.0, 16.0, drop_frac=0.5)
    assert rc.hint is None and fps in (None, 20)
    # The fraction clears the recovery band once -> signal re-armed:
    assert rc.tick(2.0, 20.0, drop_frac=0.0) is None
    # ...a fresh drop surge is fresh information and cuts again.
    assert rc.tick(2.0, 20.0, drop_frac=0.5) == 16


def test_controller_invariants_under_random_inputs():
    """Property sweep: whatever the input sequence (NaN-free floats, Nones,
    spikes), the controller never emits a hint outside [min_fps,
    target_fps], never holds internal state outside that range, and never
    cuts twice within the cooldown."""
    import numpy as np

    rng = np.random.RandomState(7)
    rc = RateController(slo_ms=8.0, min_fps=12, target_fps=60,
                        decrease_cooldown=2)
    last_cut_tick = None
    prev_hint = None
    for tick in range(3000):
        p99 = (None if rng.rand() < 0.1
               else float(rng.choice([0.5, 3.0, 7.5, 9.0, 40.0, 400.0])))
        rate = None if rng.rand() < 0.1 else float(rng.uniform(0.0, 120.0))
        drops = float(rng.choice([0.0, 0.01, 0.04, 0.08, 0.5, 0.9]))
        fps = rc.tick(p99, rate, drop_frac=drops)
        if fps is not None:
            assert 12 <= fps <= 60, (tick, fps)
        if rc.hint is not None:
            assert 12 <= rc.hint < 60, (tick, rc.hint)
        cut = (prev_hint is not None and rc.hint is not None
               and rc.hint < prev_hint) or (prev_hint is None
                                            and rc.hint is not None)
        if cut:
            if last_cut_tick is not None:
                assert tick - last_cut_tick >= 2, (tick, last_cut_tick)
            last_cut_tick = tick
        prev_hint = rc.hint


def test_first_cut_clamped_under_target():
    """A bursting client's measured rx above target_fps must not seed a
    'throttle' hint that RAISES everyone's rate during overload."""
    rc = RateController(slo_ms=8.0, min_fps=12, target_fps=60)
    hint = rc.tick(400.0, 110.0)  # p99 over SLO, rx 110 > target 60
    assert hint is not None and 12 <= hint < 60
