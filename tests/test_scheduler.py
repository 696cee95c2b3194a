"""ContinuousBatcher unit tests (batch admission policy, no threads)."""

import numpy as np

from zero_latency_yolo_tpu.config import ServerConfig
from zero_latency_yolo_tpu.runtime.engine import (
    InferenceRequest, SimulationEngine)
from zero_latency_yolo_tpu.runtime.scheduler import ContinuousBatcher


def _cfg():
    return ServerConfig.from_dict({
        "model_path": "/nonexistent.npz",
        "detection": {"model_width": 64, "model_height": 64},
        "tpu": {"variant": "yolov8p", "num_classes": 4,
                "batch_buckets": [1, 2, 4], "frame_buckets": [[96, 96]]},
    })


def _req(cid, fid, keyframe=False):
    return InferenceRequest(
        client_id=cid, frame_id=fid, timestamp=fid, width=96, height=64,
        data=np.zeros((64, 96, 3), np.uint8), keyframe=keyframe)


def _batcher(max_batch):
    return ContinuousBatcher(SimulationEngine(_cfg()), lambda r: None,
                             max_batch=max_batch)


def test_keyframe_priority_when_oversubscribed():
    """When more streams are pending than the batch admits, clients whose
    newest frame is a keyframe are admitted first (reference
    onnx_engine.cpp:241-244 bumped keyframe priority)."""
    b = _batcher(max_batch=2)
    b.submit(_req(1, 1))
    b.submit(_req(2, 2, keyframe=True))
    b.submit(_req(3, 3))
    b.submit(_req(4, 4, keyframe=True))
    batch = b._collect()
    assert [r.client_id for r in batch] == [2, 4]
    # Next collect round drains the remaining (non-keyframe) streams.
    assert [r.client_id for r in b._collect()] == [1, 3]


def test_round_robin_fairness_without_keyframes():
    b = _batcher(max_batch=2)
    for cid in (1, 2, 3):
        b.submit(_req(cid, cid))
    assert [r.client_id for r in b._collect()] == [1, 2]
    b.submit(_req(1, 10))
    # Client 3 (not served last round) goes before client 1 (rotated to back).
    assert [r.client_id for r in b._collect()] == [3, 1]


def test_max_batch_clamped_to_engine_buckets():
    """The engine may filter configured batch buckets (mesh divisibility);
    the batcher must never collect more than the largest REAL bucket
    (regression: staging overrun / per-count cached programs)."""
    eng = SimulationEngine(_cfg())
    assert max(eng.batch_buckets) == 4
    b = ContinuousBatcher(eng, lambda r: None, max_batch=64)
    assert b.max_batch == 4
    for cid in range(1, 7):
        b.submit(_req(cid, cid))
    assert len(b._collect()) == 4


def test_supersede_counts_drops():
    b = _batcher(max_batch=4)
    eng = b.engine
    before = eng.frames_dropped.value
    b.submit(_req(1, 1))
    b.submit(_req(1, 2))
    b.submit(_req(1, 3))
    batch = b._collect()
    assert [r.frame_id for r in batch] == [3]  # newest wins
    assert eng.frames_dropped.value == before + 2
    assert b.queue_depth() == 0


def test_max_queue_zero_clamped():
    """max_queue_size <= 0 clamps to 1 at construction — submit() must not
    IndexError popping an empty deque on every frame."""
    b = ContinuousBatcher(SimulationEngine(_cfg()), lambda r: None,
                          max_batch=2, max_queue_per_client=0)
    assert b.max_queue == 1
    assert b.submit(_req(1, 1)) is True
    assert [r.frame_id for r in b._collect()] == [1]


def test_max_inflight_one_means_no_pipelining():
    """max_inflight=1 must drain to ZERO after each dispatch (the configured
    no-pipelining discipline), not silently run at depth 2."""
    import time

    b = ContinuousBatcher(SimulationEngine(_cfg()), lambda r: None,
                          max_batch=2, batch_window_ms=1.0, max_inflight=1)
    drains = []
    orig = b._complete_n

    def spy(k):
        drains.append((k, len(b._inflight)))
        return orig(k)

    b._complete_n = spy
    b.start()
    try:
        for fid in range(6):
            b.submit(_req(1, fid))
            time.sleep(0.02)
        time.sleep(0.3)
    finally:
        b.stop()
    assert len(b._inflight) == 0
    # Every drain call either cleared the whole inflight deque or was the
    # loop-top single completion — the deque never held a batch ACROSS a
    # dispatch (k always covers the full depth at drain time).
    full_drains = [(k, n) for k, n in drains if n >= 1]
    assert full_drains, drains
    assert all(k >= n for k, n in full_drains), drains


def test_deep_inflight_pipeline_real_compute():
    """End-to-end batcher pipeline at max_inflight=8 with REAL device
    compute over the cached path: drain-to-one completion, staging/free-list
    reuse, and the warmed pad/concat drain programs all under load.
    (The other scheduler tests run simulation or default depth 2.)"""
    import time

    import jax
    from zero_latency_yolo_tpu.models import get_spec, init_params
    from zero_latency_yolo_tpu.ops.roi import DeviceFrameCache

    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent.npz",
        "detection": {"model_width": 64, "model_height": 64},
        "tpu": {"variant": "yolov8p", "num_classes": 4, "dtype": "float32",
                "batch_buckets": [1, 2, 4], "frame_buckets": [[96, 96]],
                "pre_nms_topk": 64, "max_inflight": 8},
    })
    from zero_latency_yolo_tpu.runtime.engine import InferenceEngine
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    eng = InferenceEngine(cfg, params=params)
    eng.warmup(inflight=8)
    cache = DeviceFrameCache(num_slots=4, height=96, width=96)
    cache.warm()
    got = []
    b = ContinuousBatcher(eng, lambda rs: got.extend(rs), max_batch=4,
                          batch_window_ms=2.0, device_cache=cache,
                          max_inflight=8)
    b.start()
    rng = np.random.default_rng(0)
    try:
        for cid in range(1, 5):
            cache.write_keyframe(cid, rng.integers(0, 256, (64, 96, 3),
                                                   np.uint8))
        deadline = time.time() + 8
        i = 0
        while time.time() < deadline:
            for cid in range(1, 5):
                b.submit(InferenceRequest(client_id=cid, frame_id=i,
                                          timestamp=i, width=96, height=64,
                                          data=None))
            i += 1
            time.sleep(0.01)
        time.sleep(1.0)
    finally:
        b.stop()
    assert len(got) > 50, len(got)
    assert len(b._inflight) == 0          # everything drained at stop
    assert eng.error_count.value == 0
    # Every result carries sane detections from real compute.
    assert all(0 <= d.x <= 1 for r in got[:50] for d in r.detections)


def test_device_stall_visibility():
    """A device that stops completing (TPU preemption / transport wedge)
    must be VISIBLE: device_stall_s grows with the age of the wedge instead
    of the server serving silence (monitor loop warns past 5s)."""
    import time

    from zero_latency_yolo_tpu.runtime.engine import PendingBatch

    b = _batcher(max_batch=2)
    # Healthy: nothing in flight.
    assert b.device_stall_s() == 0.0

    class NeverReady:
        def is_ready(self):
            return False

    now = time.perf_counter()
    # A real device batch dispatched 10s ago and still unread.
    b._inflight.append(PendingBatch(requests=[], out={"d": NeverReady()},
                                    t0=now - 10.0, n=1))
    assert 9.5 < b.device_stall_s() < 11.0
    b._inflight.clear()

    # Synthetic / simulated lanes cannot wedge -> never counted.
    b._inflight.append(PendingBatch(requests=[], out={"d": NeverReady()},
                                    t0=now - 10.0, n=1, ready_at=now + 1.0))
    assert b.device_stall_s() == 0.0
    b._inflight.clear()
    b._inflight.append(PendingBatch(requests=[], out=None, t0=now - 10.0,
                                    n=1, simulated=[]))
    assert b.device_stall_s() == 0.0
    b._inflight.clear()

    # A readback blocked inside complete_many dominates (the batch was
    # already popped from _inflight when the lane blocked).
    b._completing_since = now - 7.0
    assert 6.5 < b.device_stall_s() < 8.0
    b._completing_since = None

    # A wedge during DISPATCH (H2D/compile/cache flush, _inflight still
    # empty after an idle drain) must be visible too.
    b._dispatching_since = now - 3.0
    assert 2.5 < b.device_stall_s() < 4.0


def test_partial_dispatch_failure_keeps_launched_groups():
    """A batch that splits into several dispatch groups (here: two
    accuracy-floor rungs) must not abandon already-launched groups when a
    later group's dispatch raises — the failed group is counted as
    dropped, the healthy group's results still arrive (review r5)."""
    import threading

    import numpy as np

    from zero_latency_yolo_tpu.config import ServerConfig
    from zero_latency_yolo_tpu.runtime.engine import (
        InferenceEngine, InferenceRequest)
    from zero_latency_yolo_tpu.runtime.scheduler import ContinuousBatcher

    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent.npz",
        "detection": {"model_width": 64, "model_height": 64},
        "tpu": {"variant": "yolov8p", "num_classes": 4,
                "batch_buckets": [1, 2], "frame_buckets": [[96, 96]],
                "serve_sizes": [64, 32]},
    })
    eng = InferenceEngine(cfg)
    assert eng.simulation
    eng._serve_size = 32

    real_dispatch = eng.dispatch

    def flaky_dispatch(requests, size=None):
        if size == 64:  # the floored group's rung fails
            raise RuntimeError("injected dispatch failure")
        return real_dispatch(requests, size=size)

    eng.dispatch = flaky_dispatch
    got = []
    cv = threading.Condition()

    def on_result(results):
        with cv:
            got.extend(results)
            cv.notify()

    rng = np.random.default_rng(0)
    b = ContinuousBatcher(eng, on_result, max_batch=2, batch_window_ms=1.0)
    b.start()
    try:
        drops0 = eng.frames_dropped.value
        err0 = eng.error_count.value
        ra = InferenceRequest(client_id=1, frame_id=1, timestamp=0,
                              width=96, height=72,
                              data=rng.integers(0, 256, (72, 96, 3),
                                                dtype=np.uint8),
                              min_size=64)
        rb = InferenceRequest(client_id=2, frame_id=2, timestamp=0,
                              width=96, height=72,
                              data=rng.integers(0, 256, (72, 96, 3),
                                                dtype=np.uint8))
        b.submit(ra)
        b.submit(rb)
        with cv:
            cv.wait_for(lambda: len(got) >= 1, timeout=5)
        # The healthy (unfloored) group's result arrived...
        assert [r.client_id for r in got] == [2]
        # ...and the failed group is accounted, not silently vanished.
        assert eng.frames_dropped.value == drops0 + 1
        assert eng.error_count.value == err0 + 1
    finally:
        b.stop()
