"""Multi-stream soak + reliability tests (BASELINE configs 2-3 analogs,
simulation mode so CI measures the serving path, not the model)."""

import asyncio
import threading
import time

import numpy as np
import pytest

from zero_latency_yolo_tpu.config import ServerConfig
from zero_latency_yolo_tpu.protocol import ServerInfoPacket, parse_packet
from zero_latency_yolo_tpu.runtime.server import DetectionServer
from zero_latency_yolo_tpu.runtime.simulator import (
    FaultInjector, SimClient, synthetic_frame,
)

PORT = 27288


@pytest.fixture(scope="module")
def harness():
    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent.npz",
        "port": PORT, "web_port": 0,
        "max_clients": 10, "max_queue_size": 8,
        "network": {"timeout_ms": 3000, "max_retries": 3},
        "tpu": {"batch_window_ms": 1.0,
                "frame_buckets": [[240, 320]],
                "batch_buckets": [1, 2, 4, 8]},
    })
    server = DetectionServer(cfg)
    server.device_cache.warm()  # see test_server_e2e harness note
    loop = asyncio.new_event_loop()
    t = threading.Thread(target=loop.run_forever, daemon=True)
    t.start()
    asyncio.run_coroutine_threadsafe(server.start(), loop).result(10)
    yield server
    asyncio.run_coroutine_threadsafe(server.stop(), loop).result(10)
    loop.call_soon_threadsafe(loop.stop)
    t.join(timeout=5)


def test_eight_stream_soak(harness):
    """8 concurrent JPEG+ROI streams. The scheduler sheds stale frames under
    overload (drop-oldest / supersede — that is the intended stream
    semantics), so the contract is: every stream stays live, keeps receiving
    results, and its final frame is served."""
    n_streams, n_frames = 8, 20
    clients = []
    for i in range(n_streams):
        c = SimClient(("127.0.0.1", PORT), screen_width=320, screen_height=240)
        c.connect()
        c.start_receiver()
        clients.append(c)
    try:
        for c in clients:
            c.send_jpeg_keyframe(synthetic_frame(320, 240, seed=1))
        for step in range(n_frames - 1):
            for c in clients:
                region = synthetic_frame(64, 48, seed=step, t=step * 0.1)
                c.send_roi_update(region, x=(step * 16) % 250,
                                  y=(step * 8) % 190)
            time.sleep(0.005)
        # Every stream keeps flowing...
        for c in clients:
            assert len(c.wait_results(3, timeout=10.0)) >= 3
        # ...and a quiescent final frame is always served (nothing wedged).
        time.sleep(0.3)
        final_ids = [c.send_roi_update(synthetic_frame(64, 48, seed=99), 8, 8)
                     for c in clients]
        deadline = time.monotonic() + 10.0
        pending = set(range(n_streams))
        while pending and time.monotonic() < deadline:
            for i in list(pending):
                with clients[i]._lock:
                    got = {r.frame_id for r in clients[i].results}
                if final_ids[i] in got:
                    pending.discard(i)
            time.sleep(0.05)
        assert not pending, f"streams {pending} never got their final result"
        # Latency sanity only — CI shares one CPU core with compile jobs, so
        # this guards against seconds-scale wedges, not real-time targets
        # (those are measured by bench.py on TPU).
        lats = [l for c in clients for l in c.result_latencies_ms]
        assert lats and np.median(lats) < 5000.0
    finally:
        for c in clients:
            c.stop()


def test_packet_loss_stream_still_serves(harness):
    """20% datagram loss: reliable handshake retries + lossy frame stream
    still delivers a usable fraction of results."""
    c = SimClient(("127.0.0.1", PORT), screen_width=320, screen_height=240,
                  faults=FaultInjector(drop=0.2))
    try:
        for attempt in range(5):
            try:
                c.connect()
                break
            except TimeoutError:
                if attempt == 4:
                    raise
        c.start_receiver()
        sent = 0
        for i in range(30):
            c.send_raw_frame(synthetic_frame(96, 64, seed=i))
            sent += 1
            time.sleep(0.002)
        res = c.wait_results(int(sent * 0.5), timeout=10.0)
        assert len(res) >= sent * 0.5
    finally:
        c.stop()


def test_server_retransmits_reliable_packets(harness):
    """SERVER_INFO is sent reliably: a client that never ACKs sees
    retransmissions (reference reliable_udp.cpp:718-777)."""
    import socket as socket_mod
    from zero_latency_yolo_tpu.protocol import ClientInfo, ClientInfoPacket

    sock = socket_mod.socket(socket_mod.AF_INET, socket_mod.SOCK_DGRAM)
    sock.bind(("127.0.0.1", 0))
    sock.settimeout(0.3)
    before = harness.retransmits.value
    info = ClientInfo(screen_width=96, screen_height=64, game_id=1)
    sock.sendto(ClientInfoPacket(info=info).serialize(), ("127.0.0.1", PORT))
    copies = 0
    deadline = time.monotonic() + 4.0
    while time.monotonic() < deadline:
        try:
            data, _ = sock.recvfrom(65536)
        except OSError:
            continue
        try:
            pkt = parse_packet(data)
        except Exception:
            continue
        if isinstance(pkt, ServerInfoPacket):
            copies += 1  # never ACK
    assert copies >= 2, f"expected retransmissions, saw {copies} copies"
    assert harness.retransmits.value > before
    sock.close()


def test_client_timeout_eviction(harness):
    c = SimClient(("127.0.0.1", PORT), screen_width=96, screen_height=64)
    c.connect()
    cid_count = harness.client_count()
    # Go silent (no heartbeat, no disconnect) past timeout_ms=3000.
    c._running = False
    c.sock.close()
    deadline = time.monotonic() + 8.0
    while time.monotonic() < deadline and harness.client_count() >= cid_count:
        time.sleep(0.2)
    assert harness.client_count() < cid_count


def test_faulty_churn_soak(harness):
    """Concurrent connect/stream/disconnect churn under 5% loss/dup/corrupt:
    every handler fault is isolated, sessions and cache slots all free up,
    and the server keeps serving (stresses the decode-queue-ordered
    eviction cleanup)."""
    import random

    from zero_latency_yolo_tpu.runtime.simulator import FaultInjector

    results_total = [0]
    errors: list = []
    lock = threading.Lock()

    def churn(tid):
        for cycle in range(4):
            try:
                faults = FaultInjector(drop=0.05, duplicate=0.05,
                                       corrupt=0.05,
                                       rng=random.Random(tid * 100 + cycle))
                c = SimClient(("127.0.0.1", PORT), screen_width=320,
                              screen_height=240, faults=faults)
                try:
                    c.connect()
                except (TimeoutError, ConnectionRefusedError):
                    continue  # handshake lost to faults / server full
                c.start_receiver()
                c.send_jpeg_keyframe(synthetic_frame(320, 240, seed=cycle))
                for i in range(4):
                    c.send_roi_update(synthetic_frame(32, 32, seed=i),
                                      (i * 16) % 280, (i * 8) % 200)
                    time.sleep(0.01)
                got = len(c.wait_results(2, timeout=3))
                with lock:
                    results_total[0] += got
                c.stop()
            except Exception as e:  # noqa: BLE001
                errors.append((tid, cycle, repr(e)))
                return

    threads = [threading.Thread(target=churn, args=(t,)) for t in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors, errors
    assert results_total[0] >= 10, results_total
    # All sessions and slots reclaimed after churn.
    deadline = time.monotonic() + 8
    cache = harness.device_cache
    while (len(cache._free) < cache.num_slots
           and time.monotonic() < deadline):
        time.sleep(0.1)
    assert len(cache._free) == cache.num_slots
