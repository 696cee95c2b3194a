"""Adaptive-resolution serving (tpu.serve_sizes / tpu.adaptive_slo_ms):
size-keyed programs, SLO-driven ladder policy with hysteresis, warmup over
every rung."""

import jax
import numpy as np
import pytest

from zero_latency_yolo_tpu.config import ServerConfig
from zero_latency_yolo_tpu.models import get_spec, init_params
from zero_latency_yolo_tpu.runtime.engine import InferenceEngine, InferenceRequest


def _cfg(**tpu_over):
    tpu = {"variant": "yolov8p", "num_classes": 4, "dtype": "float32",
           "batch_buckets": [1, 2], "frame_buckets": [[96, 96]],
           "pre_nms_topk": 64, "serve_sizes": [64, 32]}
    tpu.update(tpu_over)
    return ServerConfig.from_dict({
        "model_path": "/nonexistent.npz",
        "confidence_threshold": 0.25,
        "detection": {"model_width": 64, "model_height": 64},
        "tpu": tpu,
    })


@pytest.fixture(scope="module")
def engine():
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    return InferenceEngine(_cfg(), params=params)


def _req(cid, fid, seed=0):
    rng = np.random.default_rng(seed)
    return InferenceRequest(
        client_id=cid, frame_id=fid, timestamp=1000 + fid, width=96,
        height=72, data=rng.integers(0, 256, (72, 96, 3), dtype=np.uint8))


def test_config_rejects_bad_sizes():
    with pytest.raises(ValueError, match="multiple of 32"):
        _cfg(serve_sizes=[64, 48])
    with pytest.raises(ValueError, match="ladder"):
        ServerConfig.from_dict({
            "detection": {"model_width": 64},
            "tpu": {"adaptive_slo_ms": 8.0}})


def test_ladder_includes_model_size(engine):
    assert engine.serve_sizes == (64, 32)
    assert engine._serve_size == 64


def test_serves_every_rung_with_consistent_boxes(engine):
    """The same frame through both rungs: programs differ, boxes stay
    normalized-to-source and roughly agree (resolution changes detail, not
    geometry)."""
    r64 = engine.infer_batch([_req(1, 1, seed=3)])[0]
    engine._serve_size = 32
    try:
        r32 = engine.infer_batch([_req(1, 2, seed=3)])[0]
    finally:
        engine._serve_size = 64
    for r in (r64, r32):
        for d in r.detections:
            assert 0 <= d.x <= 1 and 0 <= d.y <= 1
    keys = {k for k in engine._step_cache if isinstance(k, tuple)}
    sizes = {k[-1] for k in keys if not isinstance(k[0], str)}
    assert {32, 64} <= sizes


def test_warmup_compiles_all_rungs_when_policy_enabled():
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(1), spec, folded=True)
    eng = InferenceEngine(_cfg(batch_buckets=[1], adaptive_slo_ms=8.0),
                          params=params)
    eng.warmup(batches=[1], buckets=[(96, 96)])
    sizes = {k[-1] for k in eng._step_cache if not isinstance(k[0], str)}
    assert sizes == {32, 64}


def test_warmup_skips_unreachable_rungs_without_slo():
    """serve_sizes without adaptive_slo_ms: nothing can ever switch sizes,
    so warmup must not spend (relayed) compile time on dead rungs."""
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(2), spec, folded=True)
    eng = InferenceEngine(_cfg(batch_buckets=[1]), params=params)
    eng.warmup(batches=[1], buckets=[(96, 96)])
    sizes = {k[-1] for k in eng._step_cache if not isinstance(k[0], str)}
    assert sizes == {64}


def _prime(engine, ms, n=32):
    for _ in range(n):
        engine._adapt_stats.record(ms)


def test_policy_downshifts_then_recovers(engine):
    engine.adaptive_slo_ms = 8.0
    try:
        # Sustained SLO violation: two consecutive hot checks step down.
        _prime(engine, 20.0)
        engine._adapt_next_check = 0.0
        engine._maybe_adapt()
        assert engine._serve_size == 64  # hysteresis: first hot check holds
        engine._adapt_next_check = 0.0
        engine._maybe_adapt()
        assert engine._serve_size == 32
        assert engine.size_downshifts >= 1
        # Stats window reset on switch: old slow samples can't block recovery.
        assert engine._adapt_stats.snapshot()["count"] == 0
        # Sustained wide margin: 8 cool checks step back up.
        for _ in range(8):
            _prime(engine, 2.0)
            engine._adapt_next_check = 0.0
            engine._maybe_adapt()
        assert engine._serve_size == 64
        assert engine.size_upshifts >= 1
    finally:
        engine.adaptive_slo_ms = 0.0
        engine._serve_size = 64


def test_policy_neutral_band_resets_counters(engine):
    engine.adaptive_slo_ms = 8.0
    try:
        _prime(engine, 20.0)
        engine._adapt_next_check = 0.0
        engine._maybe_adapt()
        assert engine._adapt_hot == 1
        # p99 back inside the band (between 0.6*SLO and SLO): counters clear.
        engine._adapt_stats = type(engine._adapt_stats)(window=256)
        _prime(engine, 6.0)
        engine._adapt_next_check = 0.0
        engine._maybe_adapt()
        assert engine._adapt_hot == 0 and engine._serve_size == 64
    finally:
        engine.adaptive_slo_ms = 0.0
        engine._serve_size = 64


def test_simulation_never_adapts():
    cfg = _cfg(adaptive_slo_ms=8.0)
    eng = InferenceEngine(cfg)  # no params, no file => simulation
    assert eng.simulation
    _prime(eng, 50.0)
    for _ in range(4):
        eng._adapt_next_check = 0.0
        eng._maybe_adapt()
    assert eng._serve_size == 64


def test_downshift_through_real_completion_path():
    """End-to-end through infer_batch -> dispatch -> complete -> _convert:
    with an impossible SLO every real completion feeds the policy, and the
    engine steps down WITHOUT anyone calling _maybe_adapt directly."""
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(3), spec, folded=True)
    eng = InferenceEngine(_cfg(adaptive_slo_ms=0.001, batch_buckets=[1, 8]),
                          params=params)
    assert eng._serve_size == 64
    i = 0
    while eng._serve_size == 64 and i < 30:
        # 8 requests per call: 32 fresh samples arrive within 4 calls.
        eng.infer_batch([_req(c + 1, i * 8 + c, seed=i) for c in range(8)])
        eng._adapt_next_check = 0.0  # collapse the 0.5 s rate limit
        i += 1
    assert eng._serve_size == 32
    assert eng.size_downshifts == 1
    assert eng.status()["serve_size"] == "32"
    # And the 32-rung really serves: detections come back normalized.
    out = eng.infer_batch([_req(99, 1, seed=1)])[0]
    for d in out.detections:
        assert 0 <= d.x <= 1 and 0 <= d.y <= 1


def test_status_reports_serve_size(engine):
    st = engine.status()
    assert st["serve_size"] == "64"
    assert "size_downshifts" in st and "size_upshifts" in st


def test_synthetic_per_size_profiles_drive_policy():
    """Per-size synthetic ladders (the host-path harness form): the fake
    lane reads the CURRENT serve size and the policy runs in synthetic
    mode — the full adaptive loop without a device."""
    cfg = _cfg(adaptive_slo_ms=8.0,
               synthetic_step_profiles={"64": {"1": 20.0, "8": 20.0},
                                        "32": {"1": 2.0, "8": 2.0}},
               batch_buckets=[1, 8])
    eng = InferenceEngine(cfg)
    assert eng.simulation
    assert eng._synthetic_step(1) == 20.0  # primary rung's ladder
    i = 0
    while eng._serve_size == 64 and i < 40:
        eng.infer_batch([_req(c + 1, i * 8 + c) for c in range(8)])
        eng._adapt_next_check = 0.0
        i += 1
    assert eng._serve_size == 32 and eng.size_downshifts == 1
    assert eng._synthetic_step(1) == 2.0  # fake lane follows the downshift


def test_synthetic_profiles_must_cover_ladder():
    with pytest.raises(ValueError, match="missing ladders"):
        InferenceEngine(_cfg(
            adaptive_slo_ms=8.0,
            synthetic_step_profiles={"64": {"1": 5.0}},  # no 32 rung
            batch_buckets=[1]))


def test_runtime_slo_guarded_by_warmed_rungs():
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(4), spec, folded=True)
    # Booted with the policy OFF: rungs are cold, runtime enable must refuse
    # (the first downshift would be a cold XLA compile under pressure).
    eng = InferenceEngine(_cfg(batch_buckets=[1]), params=params)
    eng.warmup(batches=[1], buckets=[(96, 96)])
    assert not eng.update_adaptive_slo(8.0)
    assert eng.adaptive_slo_ms == 0.0
    # Booted with the policy ON: rungs warm; runtime retune and disable work.
    eng2 = InferenceEngine(_cfg(batch_buckets=[1], adaptive_slo_ms=8.0),
                           params=params)
    eng2.warmup(batches=[1], buckets=[(96, 96)])
    assert eng2.update_adaptive_slo(12.0)  # stages for the dispatch lane
    eng2._apply_staged_slo()  # (the dispatch lane applies it)
    assert eng2.adaptive_slo_ms == 12.0
    eng2._serve_size = 32  # pretend a downshift happened
    assert eng2.update_adaptive_slo(0.0)  # disable (staged)
    eng2._apply_staged_slo()
    assert eng2._serve_size == 64  # serving returns to the BOOT size


def test_runtime_slo_refused_without_ladder():
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(5), spec, folded=True)
    cfg = _cfg(batch_buckets=[1])
    cfg.tpu.serve_sizes = ()
    eng = InferenceEngine(cfg, params=params)
    assert not eng.update_adaptive_slo(8.0)


def test_adaptive_rungs_on_the_serving_mesh(tmp_path):
    """Serve-size rungs compose with SPMD serving: a mesh_data=2 engine
    serves BOTH ladder rungs and each matches the single-device engine at
    the same rung (size only changes the traced program, not the sharded
    input shapes)."""
    import copy

    from zero_latency_yolo_tpu.models import save_params

    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(7), spec, folded=True)
    path = str(tmp_path / "m.npz")
    save_params(params, path)

    def mk(md):
        cfg = _cfg(adaptive_slo_ms=8.0, batch_buckets=[4])
        cfg.model_path = path
        cfg.tpu.mesh_data = md
        return InferenceEngine(cfg, params=params)

    single, meshed = mk(1), mk(2)
    assert meshed.mesh is not None
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (4, 72, 96, 3), np.uint8)
    reqs = [InferenceRequest(client_id=i + 1, frame_id=i, timestamp=0,
                             width=96, height=72, data=frames[i])
            for i in range(4)]
    for rung in (64, 32):
        single._serve_size = rung
        meshed._serve_size = rung
        r1 = single.infer_batch(copy.deepcopy(reqs))
        r2 = meshed.infer_batch(copy.deepcopy(reqs))
        for a, b in zip(r1, r2):
            assert len(a.detections) == len(b.detections), rung
            for da, db in zip(a.detections, b.detections):
                assert da.x == pytest.approx(db.x, abs=1e-5)
                assert da.class_id == db.class_id


def test_track_ids_survive_a_size_switch(tmp_path):
    """A serve-size downshift must be invisible to clients: boxes stay
    normalized to the source frame, so the Kalman tracker keeps matching
    and track ids persist across the switch."""
    import asyncio
    import threading
    import time as _t

    from zero_latency_yolo_tpu.models import save_params
    from zero_latency_yolo_tpu.runtime.server import DetectionServer
    from zero_latency_yolo_tpu.runtime.simulator import SimClient, synthetic_frame

    model_path = str(tmp_path / "pico.npz")
    spec = get_spec("yolov8p", 4)
    save_params(init_params(jax.random.PRNGKey(0), spec, folded=True),
                model_path)
    cfg = _cfg(adaptive_slo_ms=8.0)
    cfg.model_path = model_path
    cfg.network.port = 27471
    cfg.network.web_port = 0
    cfg.use_cpu_affinity = False
    cfg.use_high_priority = False
    cfg.detection.enable_tracking = True
    server = DetectionServer(cfg)
    assert not server.engine.simulation
    server.engine.warmup(cache=server.device_cache)
    loop = asyncio.new_event_loop()
    t = threading.Thread(target=loop.run_forever, daemon=True)
    t.start()
    asyncio.run_coroutine_threadsafe(server.start(), loop).result(10)
    c = SimClient(("127.0.0.1", server.port), screen_width=96,
                  screen_height=64)
    try:
        c.connect()
        c.start_receiver()
        frame = synthetic_frame(96, 64, seed=5)

        def ids_of(fid, results):
            r = [x for x in results if x.frame_id == fid]
            assert r, f"no result for frame {fid}"
            return sorted(d.track_id for d in r[0].detections)

        f1 = c.send_raw_frame(frame)
        res = c.wait_results(1, timeout=30.0)
        before = ids_of(f1, res)
        # Force the downshift (dispatch-lane write is GIL-atomic; the next
        # get_step call picks the 32-rung program).
        server.engine._serve_size = 32
        _t.sleep(0.1)
        f2 = c.send_raw_frame(frame)
        res = c.wait_results(2, timeout=30.0)
        after = ids_of(f2, res)
        assert before, "expected detections from the random-weights model"
        # Same scene, same tracker: ids persist across the rung switch.
        assert set(before) & set(after), (before, after)
    finally:
        c.stop()
        fut = asyncio.run_coroutine_threadsafe(server.stop(), loop)
        fut.result(10)
        loop.call_soon_threadsafe(loop.stop)
        t.join(timeout=5)


def test_set_config_adaptive_slo_over_the_wire(tmp_path):
    """SET_CONFIG carrying adaptive_slo_ms is accepted (no crash) and
    GET_CONFIG echoes the adaptive state; in simulation mode (no ladder)
    the setting is refused but thresholds still apply atomically."""
    import json as _json
    import sys
    sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tests")
    from test_server_e2e import ServerHarness
    from zero_latency_yolo_tpu.protocol import CommandPacket, CommandType
    from zero_latency_yolo_tpu.runtime.simulator import SimClient

    cfg = _cfg()
    cfg.model_path = "/nonexistent.npz"
    cfg.network.port = 27461
    cfg.network.web_port = 0
    cfg.use_cpu_affinity = False
    cfg.use_high_priority = False
    h = ServerHarness(cfg)
    server = h.start()
    c = SimClient(("127.0.0.1", server.port), screen_width=96,
                  screen_height=64)
    try:
        c.connect()
        c.start_receiver()
        import time as _t
        # Combined update with a refusable SLO (simulation boot = cold
        # rungs): ATOMIC refusal — the threshold must NOT partially apply.
        c._send(CommandPacket(
            command_type=CommandType.SET_CONFIG,
            command_data=_json.dumps({
                "confidence_threshold": 0.9,
                "adaptive_slo_ms": 8.0}).encode()).serialize())
        _t.sleep(0.5)
        assert server.engine.config.confidence_threshold != 0.9
        assert server.engine.adaptive_slo_ms == 0.0
        # Threshold-only update still applies.
        c._send(CommandPacket(
            command_type=CommandType.SET_CONFIG,
            command_data=_json.dumps(
                {"confidence_threshold": 0.9}).encode()).serialize())
        deadline = _t.monotonic() + 5
        while (_t.monotonic() < deadline and
               server.engine.config.confidence_threshold != 0.9):
            _t.sleep(0.05)
        assert server.engine.config.confidence_threshold == 0.9
        c._send(CommandPacket(
            command_type=CommandType.GET_CONFIG).serialize())
        deadline = _t.monotonic() + 5
        echo = None
        while _t.monotonic() < deadline and echo is None:
            with c._lock:
                for pkt in c.commands:
                    if pkt.command_type == CommandType.GET_CONFIG:
                        echo = _json.loads(pkt.command_data.decode())
            _t.sleep(0.05)
        assert echo is not None
        assert "adaptive_slo_ms" in echo and "serve_size" in echo
    finally:
        c.stop()
        h.stop()


def test_serve_sizes_above_model_size_dropped():
    """Rungs larger than the configured model size are dropped at
    construction: the policy only trades resolution DOWN — a healthy server
    must never upshift ABOVE the operator's baseline (and warmup must not
    compile programs nothing should run)."""
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(6), spec, folded=True)
    eng = InferenceEngine(_cfg(serve_sizes=[32, 64, 96], batch_buckets=[1],
                               adaptive_slo_ms=8.0), params=params)
    assert eng.serve_sizes == (64, 32)
    # Upshift from the top rung has nowhere to go.
    eng.adaptive_slo_ms = 100.0
    _prime(eng, 1.0)
    eng._adapt_cool = 7
    eng._adapt_next_check = 0.0
    eng._maybe_adapt()
    assert eng._serve_size == 64


def test_runtime_slo_enable_allowed_in_synthetic_harness():
    """The warm-rung guard is a device concern: the synthetic-step harness
    (exists precisely to exercise this policy over per-size ladders) never
    acquires a device lane and must accept a runtime enable. Plain
    model-less simulation keeps the guard (a hot-swap to real compute would
    leave rungs cold) — pinned by test_set_config_adaptive_slo_over_the_wire."""
    from zero_latency_yolo_tpu.runtime.engine import SimulationEngine
    eng = SimulationEngine(_cfg(synthetic_step_profiles={
        "64": {"1": 5.0}, "32": {"1": 3.0}}))
    assert eng.synthetic_step_ms > 0
    assert eng.update_adaptive_slo(8.0)
    eng._apply_staged_slo()
    assert eng.adaptive_slo_ms == 8.0
    # Plain simulation (no synthetic profile): refused.
    eng2 = SimulationEngine(_cfg())
    assert not eng2.update_adaptive_slo(8.0)


def test_runtime_slo_enable_resets_stats_window():
    """_adapt_stats gathers samples even while the policy is off; a runtime
    enable judged on pre-enable samples (a spike that already ended) would
    trigger a spurious downshift."""
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(7), spec, folded=True)
    eng = InferenceEngine(_cfg(batch_buckets=[1], adaptive_slo_ms=8.0),
                          params=params)
    eng.warmup(batches=[1], buckets=[(96, 96)])
    _prime(eng, 500.0, n=64)  # stale pre-enable spike
    assert eng.update_adaptive_slo(12.0)
    eng._apply_staged_slo()
    assert eng._adapt_stats.snapshot()["count"] == 0


def test_simulation_engine_ignores_mesh_config():
    """SimulationEngine must never touch the accelerator backend, even when
    the config (copied from a real deployment) asks for a serving mesh."""
    from zero_latency_yolo_tpu.runtime.engine import SimulationEngine
    eng = SimulationEngine(_cfg(mesh_data=2, mesh_model=1))
    assert eng.mesh is None and eng.simulation
    # Batch buckets keep the configured values (no mesh-divisibility filter).
    assert eng.batch_buckets == (1, 2)


def test_failed_upshift_probe_arms_exponential_holddown(engine):
    """Route-flap damping: an upshift that immediately fails (downshift
    within the probe window) blocks the NEXT upshift exponentially — a
    decisively-unsustainable upper rung must not oscillate the lane
    (measured flap: BENCH_NOTES config-4 r4 section)."""

    def _check(ms):
        _prime(engine, ms)
        engine._adapt_next_check = 0.0
        engine._maybe_adapt()

    engine.adaptive_slo_ms = 8.0
    # The module-scoped engine carries policy state from earlier tests
    # (an upshift there would make this test's first downshift read as a
    # failed probe): start from a clean slate.
    engine._upshift_fail_streak = 0
    engine._upshift_block_until = 0.0
    engine._last_upshift_t = -1e9
    try:
        # Down (2 hot checks), then a first upshift probe (8 cool checks).
        _check(20.0)
        _check(20.0)
        assert engine._serve_size == 32
        for _ in range(8):
            _check(2.0)
        assert engine._serve_size == 64
        assert engine._upshift_fail_streak == 0
        # The probed rung fails at once: downshift counts as a failed probe
        # and arms the holddown.
        _check(20.0)
        _check(20.0)
        assert engine._serve_size == 32
        assert engine._upshift_fail_streak == 1
        assert engine._upshift_block_until > 0
        # Margin is wide again, but the holddown blocks the re-probe.
        for _ in range(10):
            _check(2.0)
        assert engine._serve_size == 32, "holddown must block the re-probe"
        # Once the holddown lapses, probing resumes (load may have fallen).
        engine._upshift_block_until = 0.0
        for _ in range(8):
            _check(2.0)
        assert engine._serve_size == 64
        # A second immediate failure doubles the holddown.
        first_block = 30.0
        _check(20.0)
        _check(20.0)
        assert engine._upshift_fail_streak == 2
        import time as _t
        assert (engine._upshift_block_until - _t.perf_counter()
                > first_block * 1.5)
    finally:
        engine.adaptive_slo_ms = 0.0
        engine._serve_size = 64
        engine._upshift_fail_streak = 0
        engine._upshift_block_until = 0.0
        engine._last_upshift_t = -1e9


def test_slo_change_clears_upshift_holddown(engine):
    engine.adaptive_slo_ms = 8.0
    engine._upshift_fail_streak = 3
    engine._upshift_block_until = 1e12
    try:
        # Stage directly (update_adaptive_slo also gates on warmed rungs,
        # which this fixture never compiles); the reset under test lives in
        # _apply_staged_slo on the policy lane.
        with engine._slo_lock:
            engine._staged_slo = 9.0
        engine._apply_staged_slo()
        assert engine.adaptive_slo_ms == 9.0
        assert engine._upshift_fail_streak == 0
        assert engine._upshift_block_until == 0.0
    finally:
        engine.adaptive_slo_ms = 0.0
        engine._serve_size = 64


def test_cascade_downshift_counts_one_probe_failure():
    """3+-rung ladders: after a failed upshift probe, the load-driven
    CASCADE downshifts that follow must not multiply the holddown — one
    probe, one streak increment."""
    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent.npz",
        "detection": {"model_width": 96, "model_height": 96},
        "tpu": {"variant": "yolov8p", "num_classes": 4,
                "batch_buckets": [1], "frame_buckets": [[96, 96]],
                "serve_sizes": [96, 64, 32],
                "synthetic_step_profiles": {"96": {"1": 5.0},
                                            "64": {"1": 3.0},
                                            "32": {"1": 1.0}}},
    })
    eng = InferenceEngine(cfg)
    eng.adaptive_slo_ms = 8.0

    def _check(ms):
        for _ in range(32):
            eng._adapt_stats.record(ms)
        eng._adapt_next_check = 0.0
        eng._maybe_adapt()

    _check(20.0)
    _check(20.0)
    assert eng._serve_size == 64 and eng._upshift_fail_streak == 0
    for _ in range(8):
        _check(2.0)
    assert eng._serve_size == 96  # probe up
    _check(20.0)
    _check(20.0)
    assert eng._serve_size == 64
    assert eng._upshift_fail_streak == 1  # the probe failure
    _check(20.0)
    _check(20.0)
    assert eng._serve_size == 32
    assert eng._upshift_fail_streak == 1, "cascade must not double the streak"


# ---------------------------------------------------------- accuracy floors

def test_effective_serve_size_snaps_up(engine):
    """Per-client min_serve_size floors snap UP the warmed ladder — never a
    cold rung, never below the floor (VERDICT r4 #4: the 320-rung closure
    measurably costs OOD accuracy; the floor is the operator's knob)."""
    engine._serve_size = 32
    try:
        assert engine.effective_serve_size(0) == 32       # follow the fleet
        assert engine.effective_serve_size(32) == 32      # floor met
        assert engine.effective_serve_size(33) == 64      # snap up
        assert engine.effective_serve_size(64) == 64
    finally:
        engine._serve_size = 64
    # At the top rung the floor is a no-op.
    assert engine.effective_serve_size(64) == 64
    assert engine.effective_serve_size(0) == 64


def test_floored_request_served_at_higher_rung(engine):
    """Real compute: with the fleet downshifted to 32, a floor-64 request
    is served at 64 (its results stamp serve_size=64) while an unfloored
    one serves at 32 — two programs, one infer_batch call."""
    engine._serve_size = 32
    try:
        ra = _req(1, 1, seed=5)
        ra.min_size = 64
        rb = _req(2, 2, seed=6)
        out = engine.infer_batch([ra, rb])
        assert len(out) == 2
        by_cid = {r.client_id: r for r in out}
        assert by_cid[1].serve_size == 64
        assert by_cid[2].serve_size == 32
    finally:
        engine._serve_size = 64


def test_scheduler_splits_batch_by_floor():
    """Through the REAL batcher: client 1 holds a floor-64 SLA while the
    fleet rung sits at 32 — every result for client 1 serves at 64, every
    other client's at 32 (the per-rung synthetic ladders replay each
    group's own measured step)."""
    import threading
    import time as _t

    from zero_latency_yolo_tpu.runtime.scheduler import ContinuousBatcher

    cfg = _cfg(adaptive_slo_ms=8.0,
               synthetic_step_profiles={"64": {"1": 2.0, "8": 2.0},
                                        "32": {"1": 1.0, "8": 1.0}},
               batch_buckets=[1, 8])
    eng = InferenceEngine(cfg)
    assert eng.simulation
    eng._serve_size = 32  # fleet downshifted
    got = []
    cv = threading.Condition()

    def on_result(results):
        with cv:
            got.extend(results)
            cv.notify()

    b = ContinuousBatcher(eng, on_result, max_batch=8, batch_window_ms=1.0)
    b.start()
    try:
        for fid in range(6):
            ra = _req(1, fid)
            ra.min_size = 64
            rb = _req(2, fid)
            b.submit(ra)
            b.submit(rb)
            with cv:
                cv.wait_for(lambda: len(got) >= (fid + 1) * 2, timeout=5)
        assert len(got) >= 12
        for r in got:
            assert r.serve_size == (64 if r.client_id == 1 else 32), \
                f"client {r.client_id} served at {r.serve_size}"
    finally:
        b.stop()


def test_min_serve_size_over_the_wire(tmp_path):
    """SET_CONFIG carrying min_serve_size applies PER-SESSION (not
    globally), out-of-range floors are refused atomically, and GET_CONFIG
    echoes the session's floor. The config default seeds new sessions."""
    import json as _json
    import sys
    import time as _t
    sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tests")
    from test_server_e2e import ServerHarness
    from zero_latency_yolo_tpu.protocol import CommandPacket, CommandType
    from zero_latency_yolo_tpu.runtime.simulator import SimClient

    cfg = _cfg()
    cfg.model_path = "/nonexistent.npz"
    cfg.detection.min_serve_size = 32   # config default for every session
    cfg.network.port = 27469
    cfg.network.web_port = 0
    cfg.use_cpu_affinity = False
    cfg.use_high_priority = False
    h = ServerHarness(cfg)
    server = h.start()
    c = SimClient(("127.0.0.1", server.port), screen_width=96,
                  screen_height=64)
    try:
        c.connect()
        c.start_receiver()
        sess = next(iter(server._sessions.values()))
        assert sess.min_serve_size == 32  # seeded from the config default

        # Raise this client's floor to the full model size.
        c._send(CommandPacket(
            command_type=CommandType.SET_CONFIG,
            command_data=_json.dumps(
                {"min_serve_size": 64}).encode()).serialize())
        deadline = _t.monotonic() + 5
        while _t.monotonic() < deadline and sess.min_serve_size != 64:
            _t.sleep(0.05)
        assert sess.min_serve_size == 64

        # Out-of-range floor (above model size): refused, nothing applied.
        c._send(CommandPacket(
            command_type=CommandType.SET_CONFIG,
            command_data=_json.dumps(
                {"min_serve_size": 128,
                 "confidence_threshold": 0.31}).encode()).serialize())
        _t.sleep(0.5)
        assert sess.min_serve_size == 64
        assert server.engine.config.confidence_threshold != 0.31

        # Below the OPERATOR's configured default (32): refused — clients
        # may only RAISE their floor; lowering would silently void the
        # documented accuracy SLA (review r5).
        c._send(CommandPacket(
            command_type=CommandType.SET_CONFIG,
            command_data=_json.dumps(
                {"min_serve_size": 0}).encode()).serialize())
        _t.sleep(0.5)
        assert sess.min_serve_size == 64
        # Lowering back TO the operator default is allowed.
        c._send(CommandPacket(
            command_type=CommandType.SET_CONFIG,
            command_data=_json.dumps(
                {"min_serve_size": 32}).encode()).serialize())
        deadline = _t.monotonic() + 5
        while _t.monotonic() < deadline and sess.min_serve_size != 32:
            _t.sleep(0.05)
        assert sess.min_serve_size == 32
        # (restore for the assertions below)
        c._send(CommandPacket(
            command_type=CommandType.SET_CONFIG,
            command_data=_json.dumps(
                {"min_serve_size": 64}).encode()).serialize())
        deadline = _t.monotonic() + 5
        while _t.monotonic() < deadline and sess.min_serve_size != 64:
            _t.sleep(0.05)
        assert sess.min_serve_size == 64

        # GET_CONFIG echoes the per-session floor; statusz counts it.
        c._send(CommandPacket(
            command_type=CommandType.GET_CONFIG).serialize())
        deadline = _t.monotonic() + 5
        echo = None
        while _t.monotonic() < deadline and echo is None:
            with c._lock:
                for pkt in c.commands:
                    if pkt.command_type == CommandType.GET_CONFIG:
                        echo = _json.loads(pkt.command_data.decode())
            _t.sleep(0.05)
        assert echo is not None and echo.get("min_serve_size") == 64
        st = server.status()
        assert st["clients_floored"] == 1
        assert st["max_client_floor"] == 64
    finally:
        c.stop()
        h.stop()


def test_floored_samples_do_not_steer_fleet_policy(engine):
    """A floored group serves ABOVE the fleet rung by operator contract:
    its (higher) latency must not feed the adaptive window — otherwise the
    policy ratchets every unfloored client to the bottom rung and blocks
    upshift forever (review r5)."""
    engine._serve_size = 32
    try:
        engine._adapt_stats = type(engine._adapt_stats)(window=256)
        ra = _req(1, 1, seed=7)
        ra.min_size = 64                      # floored above the fleet rung
        engine.infer_batch([ra])
        assert engine._adapt_stats.snapshot()["count"] == 0
        rb = _req(2, 2, seed=8)               # unfloored: fleet-rung sample
        engine.infer_batch([rb])
        assert engine._adapt_stats.snapshot()["count"] == 1
    finally:
        engine._serve_size = 64
        engine._adapt_stats = type(engine._adapt_stats)(window=256)


def test_stale_rung_completions_stay_out_of_policy_window():
    """In-flight batches dispatched at the PREVIOUS rung must not fill the
    freshly-reset post-switch stats window (strict-equality gate): after
    an upshift, a pipeline of old-rung completions would otherwise
    pre-judge the probe with samples the new rung never produced
    (review r5)."""
    cfg = _cfg(adaptive_slo_ms=8.0,
               synthetic_step_profiles={"64": {"1": 5.0},
                                        "32": {"1": 1.0}},
               batch_buckets=[1])
    eng = InferenceEngine(cfg)
    eng._serve_size = 32
    pb = eng.dispatch([_req(1, 1)])          # dispatched at the 32 rung
    eng._serve_size = 64                     # upshift lands mid-flight
    eng._adapt_stats = type(eng._adapt_stats)(window=256)
    eng.complete(pb)
    assert eng._adapt_stats.snapshot()["count"] == 0  # stale sample gated
    pb2 = eng.dispatch([_req(1, 2)])         # post-switch dispatch
    eng.complete(pb2)
    assert eng._adapt_stats.snapshot()["count"] == 1


def test_dispatch_from_cache_rejects_non_bucket_count():
    """The fused cached path (the one the live server runs) gets the same
    shape discipline as dispatch_cached: a slot list that is not a
    configured batch bucket is refused loudly, never compiled
    (review r5)."""
    import jax.numpy as jnp

    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(9), spec, folded=True)
    eng = InferenceEngine(_cfg(batch_buckets=[2, 4]), params=params)
    cache = jnp.zeros((4, 96, 96, 3), jnp.uint8)
    reqs = [_req(i + 1, i) for i in range(3)]
    with pytest.raises(ValueError, match="batch bucket"):
        eng.dispatch_from_cache(
            reqs, cache, np.arange(3), np.full(3, 72), np.full(3, 96))


def test_partial_warmup_does_not_certify_rungs():
    """warmup() over a SUBSET of the batch-bucket grid must not certify
    the serve-size rungs for runtime SLO enabling — the guard exists so a
    first downshift is never a cold compile, and a partial warmup leaves
    most (batch, size) programs cold (review r5)."""
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(10), spec, folded=True)
    eng = InferenceEngine(_cfg(batch_buckets=[1, 2], adaptive_slo_ms=8.0),
                          params=params)
    eng.warmup(batches=[1], buckets=[(96, 96)])   # partial: bucket 2 cold
    assert eng._warmed_sizes == ()
    assert not eng.update_adaptive_slo(12.0)
    # The full grid certifies.
    eng.warmup(batches=[1, 2], buckets=[(96, 96)])
    assert set(eng._warmed_sizes) == {32, 64}
    assert eng.update_adaptive_slo(12.0)
