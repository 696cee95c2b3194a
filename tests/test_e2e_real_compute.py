"""Real-compute end-to-end: UDP client -> server -> pico model on device -> results.

The only non-simulated full-stack test: JPEG frames go over loopback UDP,
through the device frame cache and the jitted pico-model step, and
detections come back deterministic across identical frames.
"""

import asyncio
import threading
import time

import jax
import numpy as np
import pytest

from zero_latency_yolo_tpu.config import ServerConfig
from zero_latency_yolo_tpu.models import get_spec, init_params, save_params
from zero_latency_yolo_tpu.runtime.server import DetectionServer
from zero_latency_yolo_tpu.runtime.simulator import SimClient, synthetic_frame

PORT = 27488


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    model_path = str(tmp_path_factory.mktemp("models") / "pico.npz")
    spec = get_spec("yolov8p", 4)
    save_params(init_params(jax.random.PRNGKey(0), spec, folded=True),
                model_path)
    cfg = ServerConfig.from_dict({
        "model_path": model_path,
        "port": PORT, "web_port": 0,
        "confidence_threshold": 0.25,
        "detection": {"model_width": 64, "model_height": 64,
                      "enable_tracking": True},
        "tpu": {"variant": "yolov8p", "num_classes": 4, "dtype": "float32",
                "batch_window_ms": 1.0, "pre_nms_topk": 64,
                "frame_buckets": [[96, 96]], "batch_buckets": [1, 2]},
    })
    server = DetectionServer(cfg)
    assert not server.engine.simulation
    # Compile ahead of time so result waits don't race XLA on a loaded core.
    # Pass the server's device cache: the live raw-frame path runs the
    # cached-gather programs (plus the cache write programs), and an unwarmed
    # compile at request time outlasts the 5s client-liveness eviction.
    server.engine.warmup(cache=server.device_cache)
    loop = asyncio.new_event_loop()
    t = threading.Thread(target=loop.run_forever, daemon=True)
    t.start()
    asyncio.run_coroutine_threadsafe(server.start(), loop).result(10)
    yield server
    asyncio.run_coroutine_threadsafe(server.stop(), loop).result(10)
    loop.call_soon_threadsafe(loop.stop)
    t.join(timeout=5)


def test_set_config_changes_live_thresholds(harness):
    """SET_CONFIG over the wire changes conf threshold with no recompile."""
    import json as _json
    from zero_latency_yolo_tpu.protocol import CommandPacket, CommandType

    c = SimClient(("127.0.0.1", PORT), screen_width=96, screen_height=64)
    try:
        c.connect()
        c.start_receiver()
        frame = synthetic_frame(96, 64, seed=5)
        # Compile the serving program once, then snapshot the program count:
        # threshold changes must not add to it.
        c.send_raw_frame(frame)
        assert c.wait_results(1, timeout=60.0)
        programs_before = len(harness.engine._step_cache)

        c._send(CommandPacket(
            command_type=CommandType.SET_CONFIG,
            command_data=_json.dumps(
                {"confidence_threshold": 0.999}).encode()).serialize())
        deadline = time.monotonic() + 5
        while (time.monotonic() < deadline and
               harness.engine.config.confidence_threshold != 0.999):
            time.sleep(0.05)
        assert harness.engine.config.confidence_threshold == 0.999

        fid = c.send_raw_frame(frame)
        res = [r for r in c.wait_results(2, timeout=30.0) if r.frame_id == fid]
        assert res and len(res[0].detections) == 0  # nothing passes 0.999

        c._send(CommandPacket(
            command_type=CommandType.SET_CONFIG,
            command_data=_json.dumps(
                {"confidence_threshold": 0.25}).encode()).serialize())
        deadline = time.monotonic() + 5
        while (time.monotonic() < deadline and
               harness.engine.config.confidence_threshold != 0.25):
            time.sleep(0.05)
        # Runtime scalars: no new programs were compiled for the change.
        assert len(harness.engine._step_cache) == programs_before
    finally:
        c.stop()


def test_full_stack_detection_deterministic(harness):
    c = SimClient(("127.0.0.1", PORT), screen_width=96, screen_height=64)
    c2 = SimClient(("127.0.0.1", PORT), screen_width=96, screen_height=64)
    try:
        c.connect()
        c2.connect()
        c.start_receiver()
        c2.start_receiver()
        frame = synthetic_frame(96, 64, seed=5)
        c.send_raw_frame(frame)
        c2.send_raw_frame(frame)
        r1 = c.wait_results(1, timeout=60.0)  # first result pays XLA compile
        r2 = c2.wait_results(1, timeout=60.0)
        assert r1 and r2
        d1, d2 = r1[0].detections, r2[0].detections
        # Same pixels through the real model => identical boxes (track ids
        # are per-client and may differ).
        assert len(d1) == len(d2)
        for a, b in zip(d1, d2):
            assert a.x == pytest.approx(b.x, abs=1e-6)
            assert a.class_id == b.class_id
        st = harness.status()
        assert st["engine"]["simulation"] == "false"
        assert int(st["engine"]["inferences"]) >= 2
    finally:
        c.stop()
        c2.stop()
