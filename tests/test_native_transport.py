"""E2E over the C++ recvmmsg transport (native/udp.cpp)."""

import asyncio
import threading
import time

import pytest

from zero_latency_yolo_tpu.config import ServerConfig
from zero_latency_yolo_tpu.runtime.server import DetectionServer
from zero_latency_yolo_tpu.runtime.simulator import SimClient, synthetic_frame

try:
    from zero_latency_yolo_tpu.runtime.transport import HAVE_NATIVE_UDP
except Exception:  # pragma: no cover
    HAVE_NATIVE_UDP = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE_UDP,
                                reason="native UDP transport unavailable")

PORT = 27588


@pytest.fixture(scope="module")
def harness():
    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent.npz",
        "port": PORT, "web_port": 0, "max_clients": 4,
        "network": {"use_native_transport": True, "timeout_ms": 3000},
        "tpu": {"batch_window_ms": 1.0, "frame_buckets": [[128, 128]],
                "batch_buckets": [1, 2, 4]},
    })
    server = DetectionServer(cfg)
    loop = asyncio.new_event_loop()
    t = threading.Thread(target=loop.run_forever, daemon=True)
    t.start()
    asyncio.run_coroutine_threadsafe(server.start(), loop).result(10)
    yield server
    asyncio.run_coroutine_threadsafe(server.stop(), loop).result(10)
    loop.call_soon_threadsafe(loop.stop)
    t.join(timeout=5)


def test_native_transport_full_flow(harness):
    c = SimClient(("127.0.0.1", PORT), screen_width=96, screen_height=64)
    try:
        info = c.connect()
        assert info.info.max_clients == 4
        c.start_receiver()
        fids = [c.send_raw_frame(synthetic_frame(96, 64, seed=i))
                for i in range(5)]
        res = c.wait_results(2, timeout=5.0)
        assert res, "no results over native transport"
        got = {r.frame_id for r in res}
        assert got & set(fids)
    finally:
        c.stop()


def test_native_transport_burst(harness):
    """A burst larger than one recvmmsg batch still all lands."""
    c = SimClient(("127.0.0.1", PORT), screen_width=96, screen_height=64)
    try:
        c.connect()
        before = harness.packets_received.value
        for _ in range(300):
            c.heartbeat()
        deadline = time.monotonic() + 5.0
        while (time.monotonic() < deadline and
               harness.packets_received.value - before < 300):
            time.sleep(0.05)
        assert harness.packets_received.value - before >= 300
    finally:
        c.stop()
