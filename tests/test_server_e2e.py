"""End-to-end loopback tests: SimClient <-UDP-> DetectionServer.

Uses simulation mode (no model file), exactly like the reference's de-facto
fake backend (onnx_engine.cpp:70-75): the full network/scheduler/adapter path
runs without device compute, so these tests are fast. Real-compute e2e is
covered by bench.py and test_engine.py.
"""

import asyncio
import threading
import time

import numpy as np
import pytest

from zero_latency_yolo_tpu.config import ServerConfig
from zero_latency_yolo_tpu.runtime.server import DetectionServer
from zero_latency_yolo_tpu.runtime.simulator import (
    FaultInjector, SimClient, synthetic_frame,
)

PORT = 27188


class ServerHarness:
    def __init__(self, config: ServerConfig):
        self.server = DetectionServer(config)
        self.loop = asyncio.new_event_loop()
        self.thread = threading.Thread(target=self.loop.run_forever, daemon=True)

    def start(self):
        self.thread.start()
        asyncio.run_coroutine_threadsafe(self.server.start(), self.loop).result(10)
        return self.server

    def stop(self):
        asyncio.run_coroutine_threadsafe(self.server.stop(), self.loop).result(10)
        self.loop.call_soon_threadsafe(self.loop.stop)
        self.thread.join(timeout=5)


@pytest.fixture(scope="module")
def harness():
    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent/model.npz",  # => simulation mode
        "port": PORT,
        "web_port": 0,
        "max_clients": 4,
        "max_queue_size": 8,
        "network": {"timeout_ms": 2000},
        "detection": {"enable_tracking": True, "max_tracking_age_ms": 500},
        "tpu": {"batch_window_ms": 1.0,
                "frame_buckets": [[128, 128]],
                "batch_buckets": [1, 2, 4]},
    })
    h = ServerHarness(cfg)
    server = h.start()
    assert server.engine.simulation
    # Sim mode skips engine warmup, but cache-write programs are real device
    # programs even under simulation — compile them up front so latency
    # assertions measure the serving path, not first-shape XLA compiles.
    server.device_cache.warm()
    yield server
    h.stop()


def _client(port, **kw):
    c = SimClient(("127.0.0.1", port), screen_width=96, screen_height=64, **kw)
    return c


def test_handshake(harness):
    c = _client(harness.port)
    try:
        pkt = c.connect()
        assert pkt.info.max_clients == 4
        assert pkt.info.protocol_version == 1
        assert harness.client_count() == 1
    finally:
        c.stop()


def test_raw_frame_to_detection_result(harness):
    c = _client(harness.port)
    try:
        c.connect()
        c.start_receiver()
        frame = synthetic_frame(96, 64, seed=1)
        fid = c.send_raw_frame(frame)
        results = c.wait_results(1, timeout=5.0)
        assert results, "no detection result received"
        assert results[0].frame_id == fid
        assert len(results[0].detections) <= 32
        # Tracking on: any detections carry non-zero track ids.
        for d in results[0].detections:
            assert d.track_id > 0
    finally:
        c.stop()


def test_jpeg_and_roi_stream(harness):
    c = _client(harness.port)
    try:
        c.connect()
        c.start_receiver()
        frame = synthetic_frame(96, 64, seed=2)
        kf_id = c.send_jpeg_keyframe(frame)
        region = synthetic_frame(32, 16, seed=3)
        roi_id = c.send_roi_update(region, x=8, y=8)
        # Per-client supersede semantics: when both frames land in the same
        # batch window, the older one is dropped — but the NEWEST frame must
        # always be answered.
        deadline = time.monotonic() + 5.0
        got = []
        while time.monotonic() < deadline:
            got = [r.frame_id for r in c.wait_results(1, timeout=1.0)]
            if roi_id in got:
                break
        assert roi_id in got, f"newest frame unanswered; got {got}"
        assert set(got) <= {kf_id, roi_id}
        # The device cache now holds the pasted content.
        cache = harness.device_cache
        cid = max(harness._sessions.keys())
        assert cache.has_frame(cid)
    finally:
        c.stop()


def test_heartbeat_echo(harness):
    c = _client(harness.port)
    try:
        c.connect()
        c.heartbeat(ping=123)
        deadline = time.monotonic() + 3.0
        got = False
        c.sock.settimeout(0.5)
        while time.monotonic() < deadline and not got:
            try:
                data, _ = c.sock.recvfrom(65536)
            except OSError:
                continue
            from zero_latency_yolo_tpu.protocol import HeartbeatPacket, parse_packet
            try:
                pkt = parse_packet(data)
            except Exception:
                continue
            if isinstance(pkt, HeartbeatPacket):
                assert pkt.ping == 123
                got = True
        assert got
    finally:
        c.stop()


def test_server_full(harness):
    clients = []
    try:
        while harness.client_count() < 4:
            c = _client(harness.port)
            c.connect()
            clients.append(c)
        extra = _client(harness.port)
        clients.append(extra)
        with pytest.raises((ConnectionRefusedError, TimeoutError)):
            extra.connect()
    finally:
        for c in clients:
            c.stop()


def test_corrupt_packets_counted_not_fatal(harness):
    before = harness.bad_packets.value
    c = _client(harness.port, faults=FaultInjector(corrupt=1.0))
    try:
        c.sock.sendto(b"garbage-not-a-packet", ("127.0.0.1", harness.port))
        c.heartbeat()  # corrupted by injector
        time.sleep(0.3)
        assert harness.bad_packets.value >= before + 1
        # Server still serves a clean client.
        c2 = _client(harness.port)
        try:
            c2.connect()
        finally:
            c2.stop()
    finally:
        c.stop()


def test_frame_from_unknown_client_ignored(harness):
    c = _client(harness.port)  # never connects
    try:
        before = harness.engine.inference_count.value
        c.send_raw_frame(synthetic_frame(96, 64))
        time.sleep(0.3)
        # No session -> no inference submitted for this frame.
        # (Other clients may be active; just assert no crash and bounded growth.)
        assert harness.client_count() <= 4
    finally:
        c.stop()


def test_multi_stream_batching(harness):
    clients = []
    try:
        for _ in range(3 - min(2, harness.client_count())):
            pass
        for i in range(2):
            c = _client(harness.port)
            c.connect()
            c.start_receiver()
            clients.append(c)
        for step in range(5):
            for c in clients:
                c.send_raw_frame(synthetic_frame(96, 64, seed=step))
            time.sleep(0.01)
        for c in clients:
            res = c.wait_results(3, timeout=5.0)
            assert len(res) >= 3
    finally:
        for c in clients:
            c.stop()


def test_status_snapshot(harness):
    st = harness.status()
    assert st["server"] == "zero_latency_yolo_tpu"
    assert st["transport"]["packets_received"] > 0
    assert "engine" in st and st["engine"]["simulation"] == "true"
    # GC observability + the post-warmup posture (tpu.gc_tune defaults on):
    # the server must surface pause pressure and actually hold the tuned
    # thresholds while serving (utils/gcstats.py).
    import gc

    from zero_latency_yolo_tpu.utils.gcstats import LATENCY_THRESHOLDS
    hg = st["host_gc"]
    assert hg["thresholds"] == list(LATENCY_THRESHOLDS)
    assert gc.get_threshold() == LATENCY_THRESHOLDS
    assert hg["frozen"] > 0
    assert hg["pause_total_ms"] >= 0.0


def test_config_update_applies_thresholds(harness):
    """CONFIG_UPDATE (type 7 — declared but dead in the reference) applies
    runtime thresholds live from a registered session; unknown peers and
    bad values are ignored."""
    from zero_latency_yolo_tpu.protocol import ConfigUpdatePacket
    c = _client(harness.port)
    c.connect()
    try:
        before_conf = harness.config.confidence_threshold
        pkt = ConfigUpdatePacket(settings={"confidence_threshold": 0.61,
                                           "nms_threshold": 0.37,
                                           "bogus_key": 1})
        c._send(pkt.serialize())
        deadline = time.monotonic() + 5
        while (harness.config.confidence_threshold != 0.61
               and time.monotonic() < deadline):
            time.sleep(0.05)
        assert harness.config.confidence_threshold == 0.61
        assert harness.config.nms_threshold == 0.37
        # Non-numeric, NaN, and out-of-range updates are all ignored —
        # json accepts the NaN token and a NaN threshold would blank every
        # detection for every client.
        for bad in ("nope", float("nan"), float("inf"), 2.5, -0.1):
            c._send(ConfigUpdatePacket(
                settings={"confidence_threshold": bad}).serialize())
        time.sleep(0.5)
        assert harness.config.confidence_threshold == 0.61
    finally:
        c.stop()


def test_eviction_does_not_leak_cache_slots(harness):
    """Client churn with frames still in the decode queue must not leak
    device-cache slots (cleanup is ordered through the decode worker): after
    max_clients churn cycles, a new client still connects and serves."""
    for i in range(6):  # > max_clients=4 churn rounds
        c = _client(harness.port)
        c.connect()
        c.start_receiver()
        c.send_jpeg_keyframe(synthetic_frame(96, 64, seed=i))
        c.stop()  # DISCONNECT with the keyframe possibly still queued
        time.sleep(0.05)
    deadline = time.monotonic() + 5
    while harness.device_cache._free == [] and time.monotonic() < deadline:
        time.sleep(0.05)
    assert len(harness.device_cache._free) == harness.device_cache.num_slots
    c = _client(harness.port)
    c.connect()
    c.start_receiver()
    c.send_jpeg_keyframe(synthetic_frame(96, 64, seed=99))
    assert len(c.wait_results(1, timeout=5)) == 1
    c.stop()


def test_cleanup_enqueue_nonblocking_when_queue_full():
    """Eviction's cleanup sentinel must never block the event-loop thread
    on a full decode queue (the worker can stall tens of seconds mid-item
    behind a cold-shape compile under the cache lock; a blocking put froze
    datagrams, heartbeats, ACKs and result sends for the whole compile).
    On Full it reschedules via call_later and still lands FIFO-ordered
    behind the queued frames."""
    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent/model.npz",
        "port": PORT + 7, "web_port": 0, "worker_threads": 1,
        "tpu": {"frame_buckets": [[64, 64]], "batch_buckets": [1]},
    })
    server = DetectionServer(cfg)   # not started: no decode worker draining
    q = server._decode_queues[0]  # cid 42 % 1 worker == queue 0
    while not q.full():
        q.put_nowait(("__cleanup__", 0))

    calls = []

    class FakeLoop:
        def call_later(self, delay, fn, *args):
            calls.append((delay, fn, args))

    server._loop = FakeLoop()
    server._running = True
    t0 = time.perf_counter()
    server._enqueue_cleanup(42)
    assert time.perf_counter() - t0 < 0.5   # returned immediately, no block
    assert calls and calls[0][2] == ("__cleanup__", 42)
    q.get_nowait()                          # worker frees one slot
    calls[0][1](*calls[0][2])               # the scheduled retry fires
    items = []
    while not q.empty():
        items.append(q.get_nowait())
    assert items[-1] == ("__cleanup__", 42)  # sentinel landed, FIFO-last


def test_monitor_survives_poisoned_status(monkeypatch):
    """One malformed status() (e.g. a hot-swapped engine missing a stats
    key) must not kill the monitor loop for the process lifetime."""
    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent/model.npz",
        "port": PORT + 8, "web_port": 0,
        "tpu": {"frame_buckets": [[64, 64]], "batch_buckets": [1]},
    })
    server = DetectionServer(cfg)
    calls = {"n": 0}

    def poisoned():
        calls["n"] += 1
        raise KeyError("pipeline_p99_ms")

    server.engine.status = poisoned

    async def run():
        orig_sleep = asyncio.sleep
        ticks = {"n": 0}
        me = asyncio.current_task()

        async def fast_sleep(_t):
            # The patch is GLOBAL: a task from a previous test still winding
            # down on another loop thread must not consume our ticks (that
            # cancels the monitor early — observed flake under load).
            if asyncio.current_task() is me:
                ticks["n"] += 1
                if ticks["n"] > 3:
                    raise asyncio.CancelledError
            await orig_sleep(0)

        monkeypatch.setattr(asyncio, "sleep", fast_sleep)
        try:
            await server._monitor_loop()
        except asyncio.CancelledError:
            pass

    asyncio.run(run())
    assert calls["n"] == 3  # kept iterating through the failures


def test_request_keyframe_recovery():
    """Shed-frozen cache slot => server sends COMMAND(REQUEST_KEYFRAME)
    (reference declared the type, types.h:94-103, never sent it); the
    client re-anchors with an immediate keyframe instead of waiting out
    its keyframe cadence, and the slot unfreezes."""
    from zero_latency_yolo_tpu.runtime.simulator import StreamDriver
    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent/model.npz",
        "port": PORT + 9, "web_port": 0, "max_clients": 4,
        "network": {"timeout_ms": 5000},
        "tpu": {"batch_window_ms": 1.0, "frame_buckets": [[128, 128]],
                "batch_buckets": [1, 2]},
    })
    h = ServerHarness(cfg)
    server = h.start()
    server.device_cache.warm()
    server.device_cache._max_pending = 0  # every pending ROI write sheds
    c = _client(server.port)
    driver = StreamDriver(c, keyframe_interval=1000)  # cadence never fires
    try:
        c.connect()
        c.start_receiver()
        frame = synthetic_frame(96, 64, seed=1)
        assert driver.push(frame) is not None      # keyframe primes the slot
        assert c.wait_results(1, timeout=5)
        frame2 = frame.copy()
        frame2[8:24, 8:24] = 255                   # small change => ROI path
        driver.push(frame2)
        assert driver.roi_sent == 1
        # The shed freezes the slot; the server must command a keyframe.
        deadline = time.monotonic() + 5.0
        while time.monotonic() < deadline and not c.keyframe_requested:
            time.sleep(0.02)
        assert c.keyframe_requests_seen >= 1
        assert server.keyframe_requests.value >= 1
        # Next capture re-anchors as a keyframe (flag consumed by push).
        kf_before = driver.keyframes_sent
        assert driver.push(frame2) is not None
        assert driver.keyframes_sent == kf_before + 1
        deadline = time.monotonic() + 5.0
        while (time.monotonic() < deadline
               and server.device_cache.frozen_clients()):
            time.sleep(0.02)
        assert server.device_cache.frozen_clients() == []  # re-anchored
    finally:
        c.stop()
        h.stop()


def test_sharded_decode_workers_preserve_per_client_order():
    """worker_threads=3 shards decode by client id: independent clients'
    frames decode in parallel while each client's keyframe->ROI ordering
    (and eviction cleanup) stays FIFO on its own worker."""
    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent/model.npz",
        "port": PORT + 15, "web_port": 0, "max_clients": 6,
        "worker_threads": 3,
        "tpu": {"batch_window_ms": 1.0, "frame_buckets": [[128, 128]],
                "batch_buckets": [1, 2, 4]},
    })
    h = ServerHarness(cfg)
    server = h.start()
    server.device_cache.warm()
    assert len(server._decode_queues) == 3
    clients = []
    try:
        for i in range(3):
            c = _client(server.port)
            c.connect()
            c.start_receiver()
            clients.append(c)
        for i, c in enumerate(clients):
            c.send_jpeg_keyframe(synthetic_frame(96, 64, seed=10 + i))
        for c in clients:
            assert c.wait_results(1, timeout=10)
        for i, c in enumerate(clients):
            c.send_roi_update(synthetic_frame(32, 16, seed=20 + i), 8, 8)
        for c in clients:
            assert len(c.wait_results(2, timeout=10)) >= 2
        # Each client's slot holds ITS OWN keyframe content (no
        # cross-worker mix-up): gather and compare a corner pixel far from
        # the pasted ROI.
        import numpy as np
        cids = sorted(server._sessions)
        # Single-dispatcher invariant: stop the batcher before gathering
        # from the test thread (concurrent dispatch wedges relayed TPUs).
        server.batcher.stop()
        frames, _, _ = server.device_cache.gather(cids)
        for i, cid in enumerate(cids):
            want = synthetic_frame(96, 64, seed=10 + i)
            got = np.asarray(frames[i])[:64, :96]
            # JPEG is lossy: compare means, not bytes.
            assert abs(float(got[50:, 60:].mean())
                       - float(want[50:, 60:].mean())) < 8.0
    finally:
        for c in clients:
            c.stop()
        h.stop()


def test_stream_control_pause_resume_stop(harness):
    """COMMAND stream control (reference declared START/STOP/PAUSE/
    RESUME_STREAM, types.h:94-103, and ignored them all): PAUSE sheds
    frames at ingest with the session kept alive, RESUME re-anchors via a
    server REQUEST_KEYFRAME, STOP additionally releases the device-cache
    slot and tracker state, START revives a stopped stream."""
    def _poll(cond, timeout=5.0):
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if cond():
                return True
            time.sleep(0.02)
        return cond()

    c = _client(harness.port)
    try:
        c.connect()
        c.start_receiver()
        fid = c.send_raw_frame(synthetic_frame(96, 64, seed=11))
        assert c.wait_results(1, timeout=5.0)
        cid = max(harness._sessions.keys())

        # --- PAUSE: frames shed before decode/device work
        c.pause_stream()
        assert _poll(lambda: harness._sessions[cid].paused)
        base_paused = harness.frames_paused.value
        n_results = len(c.wait_results(0, timeout=0))
        c.send_raw_frame(synthetic_frame(96, 64, seed=12))
        c.send_raw_frame(synthetic_frame(96, 64, seed=13))
        assert _poll(lambda: harness.frames_paused.value >= base_paused + 2)
        time.sleep(0.25)
        assert len(c.wait_results(0, timeout=0)) == n_results, \
            "paused stream produced results"
        assert cid in harness._sessions  # session alive, not evicted

        # --- RESUME: unpause + server-initiated keyframe re-anchor
        kf_seen = c.keyframe_requests_seen
        c.resume_stream()
        assert _poll(lambda: not harness._sessions[cid].paused)
        assert _poll(lambda: c.keyframe_requests_seen > kf_seen), \
            "no REQUEST_KEYFRAME after resume"
        c.send_jpeg_keyframe(synthetic_frame(96, 64, seed=14))
        assert _poll(lambda: len(c.wait_results(0, timeout=0)) > n_results)
        assert _poll(lambda: harness.device_cache.has_frame(cid))

        # --- STOP: slot + tracker state released, session still registered
        c.stop_stream()
        assert _poll(lambda: not harness.device_cache.has_frame(cid)), \
            "STOP_STREAM did not release the cache slot"
        assert harness._sessions[cid].paused

        # --- START: revive; re-anchor requested; stream serves again
        kf_seen = c.keyframe_requests_seen
        c.start_stream()
        assert _poll(lambda: c.keyframe_requests_seen > kf_seen)
        n_results = len(c.wait_results(0, timeout=0))
        c.send_jpeg_keyframe(synthetic_frame(96, 64, seed=15))
        assert _poll(lambda: len(c.wait_results(0, timeout=0)) > n_results)
        assert harness.status()["frames_paused"] >= 2
    finally:
        c.stop()


def test_karn_rtt_sampling_and_backoff(harness):
    """Karn's algorithm: an ACK for a RETRANSMITTED packet is ambiguous
    (original or copy?) and must not feed the RTT estimator — a near-zero
    sample collapses the RTO and burns retries on high-latency paths. The
    retransmit wait backs off exponentially per retry."""
    import time as _t

    from zero_latency_yolo_tpu.protocol import AckPacket
    from zero_latency_yolo_tpu.runtime.server import (
        ClientSession, PendingPacket,
    )

    s = ClientSession(client_id=1, addr=("127.0.0.1", 1))
    # Fresh packet: sampled.
    s.pending[7] = PendingPacket(data=b"x", addr=s.addr,
                                 sent_at=_t.monotonic() - 0.3)
    harness._handle_ack(AckPacket(acked_sequence=7), s)
    assert s.srtt is not None and 0.25 < s.srtt < 0.4
    srtt_before = s.srtt
    # Retransmitted packet: ACK clears it but never feeds the estimator.
    s.pending[8] = PendingPacket(data=b"x", addr=s.addr,
                                 sent_at=_t.monotonic(), retries=1)
    harness._handle_ack(AckPacket(acked_sequence=8), s)
    assert 8 not in s.pending
    assert s.srtt == srtt_before
    # Backoff arithmetic: the per-retry wait doubles, capped at 2 s.
    s.rto = 0.2
    waits = [min(s.rto * (1 << r), 2.0) for r in range(5)]
    assert waits == [0.2, 0.4, 0.8, 1.6, 2.0]


def test_reliable_inflight_window(harness):
    """The reliable-send in-flight window (the reference computed a
    congestion window but never gated with it — reliable_udp.h:130-151):
    at most int(cwnd) un-ACKed reliable packets per client, excess SHED
    (bounded retransmit memory under a non-ACKing peer), AIMD halve on
    loss / additive growth on clean ACK."""
    import time as _t

    from zero_latency_yolo_tpu.protocol import (
        AckPacket, CommandPacket, CommandType,
    )
    from zero_latency_yolo_tpu.runtime.server import (
        REL_WND_INIT, REL_WND_MAX, ClientSession, PendingPacket,
    )

    s = ClientSession(client_id=999, addr=("127.0.0.1", 9))
    shed0 = harness.reliable_shed.value
    for _ in range(50):
        pkt = CommandPacket(command_type=CommandType.REQUEST_KEYFRAME)
        harness._send_reliable(pkt.serialize(), s)
    # Bounded: pending holds exactly the window, the other 42 were shed.
    assert len(s.pending) == int(REL_WND_INIT)
    assert harness.reliable_shed.value - shed0 == 50 - int(REL_WND_INIT)

    # Loss events halve multiplicatively — at most once per RTO.
    now = _t.monotonic()
    s.backoff_window(now)
    assert s.cwnd == REL_WND_INIT / 2
    s.backoff_window(now + s.rto / 2)      # same RTO window: no double cut
    assert s.cwnd == REL_WND_INIT / 2
    s.backoff_window(now + 2 * s.rto)
    s.backoff_window(now + 4 * s.rto)
    s.backoff_window(now + 8 * s.rto)
    assert s.cwnd == 1.0                   # floor, never zero

    # Clean ACKs grow the window additively (+1/cwnd per ACK).
    for seq in list(s.pending.keys()):
        harness._handle_ack(AckPacket(acked_sequence=seq), s)
    assert s.cwnd > 1.0
    assert not s.pending

    # Growth caps at REL_WND_MAX.
    s.cwnd = REL_WND_MAX
    s.pending[123456] = PendingPacket(data=b"x", addr=s.addr,
                                      sent_at=_t.monotonic())
    s.ack_pending(123456)
    assert s.cwnd == REL_WND_MAX


def test_reliable_window_backoff_once_per_tick(harness):
    """A management-loop tick that retransmits several overdue packets for
    one client is ONE loss event: cwnd halves once, not per packet — and
    unreliable result sends keep flowing while the reliable window is
    saturated (no head-of-line stall)."""
    import time as _t

    from zero_latency_yolo_tpu.runtime.server import (
        REL_WND_INIT, ClientSession, PendingPacket,
    )

    s = ClientSession(client_id=998, addr=("127.0.0.1", 8))
    old = _t.monotonic() - 10.0
    for seq in (1, 2, 3):
        s.pending[seq] = PendingPacket(data=b"zlt", addr=s.addr, sent_at=old)
    now = _t.monotonic()
    # Simulate the management-loop body for this session's pendings.
    for seq in list(s.pending.keys()):
        p = s.pending[seq]
        p.retries += 1
        p.sent_at = now
        s.backoff_window(now)
    assert s.cwnd == REL_WND_INIT / 2      # one halve for the whole burst

    # Saturated window never blocks the unreliable result path: results go
    # through _send_raw directly (structural), and a reliable send at cap
    # returns immediately (shed) instead of queueing.
    t0 = _t.perf_counter()
    s.cwnd = 1.0
    from zero_latency_yolo_tpu.protocol import CommandPacket, CommandType
    for _ in range(1000):
        harness._send_reliable(
            CommandPacket(command_type=CommandType.PING).serialize(), s)
    assert _t.perf_counter() - t0 < 1.0
    assert len(s.pending) == 3             # unchanged: every new send shed


def test_http_header_line_cap(harness):
    """A client trickling header lines forever must not hold the management
    port open (slowloris): the server gives up after the header cap."""
    import json as _json
    import socket as _socket

    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent/model.npz",
        "port": PORT + 71, "web_port": PORT + 72, "max_clients": 2,
        "tpu": {"batch_window_ms": 1.0, "frame_buckets": [[128, 128]],
                "batch_buckets": [1]},
    })
    h = ServerHarness(cfg)
    h.start()
    try:
        # Legitimate request works.
        sock = _socket.create_connection(("127.0.0.1", PORT + 72), timeout=5)
        sock.sendall(b"GET /statusz HTTP/1.1\r\nHost: x\r\n\r\n")
        data = sock.recv(65536)
        sock.close()
        assert data.startswith(b"HTTP/1.1 200")
        # 200 junk header lines: connection is dropped without a response
        # (the cap fires long before the per-line timeouts accumulate).
        sock = _socket.create_connection(("127.0.0.1", PORT + 72), timeout=5)
        sock.settimeout(10)
        sock.sendall(b"GET /statusz HTTP/1.1\r\n")
        sock.sendall(b"".join(b"X-Junk-%d: y\r\n" % i for i in range(200)))
        got = b""
        try:
            while True:
                chunk = sock.recv(4096)
                if not chunk:
                    break
                got += chunk
        except OSError:
            pass
        sock.close()
        assert got == b""  # no response to the slowloris attempt
    finally:
        h.stop()


def test_bind_address_scopes_udp_and_web():
    """network.bind_address / web_bind_address scope the serving socket and
    the management plane to one interface (the reference hardcoded
    INADDR_ANY for both). Loopback-bound server serves normally."""
    import json as _json
    import socket as _socket

    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent/model.npz",
        "port": PORT + 81, "web_port": PORT + 82, "max_clients": 2,
        "network": {"bind_address": "127.0.0.1",
                    "web_bind_address": "127.0.0.1"},
        "tpu": {"batch_window_ms": 1.0, "frame_buckets": [[128, 128]],
                "batch_buckets": [1]},
    })
    h = ServerHarness(cfg)
    server = h.start()
    c = _client(server.port)
    try:
        c.connect()
        c.start_receiver()
        c.send_raw_frame(synthetic_frame(96, 64))
        assert c.wait_results(1, timeout=5)
        sock = _socket.create_connection(("127.0.0.1", PORT + 82), timeout=5)
        sock.sendall(b"GET /statusz HTTP/1.1\r\nHost: x\r\n\r\n")
        data = sock.recv(65536)
        sock.close()
        assert data.startswith(b"HTTP/1.1 200")
        body = data.split(b"\r\n\r\n", 1)[1]
        assert _json.loads(body)["clients"] == 1
    finally:
        c.stop()
        h.stop()


def test_web_auth_token_e2e():
    """The raw-HTTP tier parses `Authorization: Bearer <token>` (scheme
    case-insensitive, bare token accepted) and the POST gate holds at the
    wire; GET telemetry stays open."""
    import socket as _socket

    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent/model.npz",
        "port": PORT + 83, "web_port": PORT + 84, "max_clients": 2,
        "network": {"web_auth_token": "hunter2hunter2"},
        "tpu": {"batch_window_ms": 1.0, "frame_buckets": [[128, 128]],
                "batch_buckets": [1]},
    })
    h = ServerHarness(cfg)
    h.start()

    def _req(lines: bytes) -> bytes:
        sock = _socket.create_connection(("127.0.0.1", PORT + 84), timeout=5)
        sock.sendall(lines)
        data = b""
        try:
            while True:
                chunk = sock.recv(65536)
                if not chunk:
                    break
                data += chunk
        except OSError:
            pass
        sock.close()
        return data

    try:
        assert _req(b"GET /statusz HTTP/1.1\r\nHost: x\r\n\r\n"
                    ).startswith(b"HTTP/1.1 200")
        body = b"not-really-weights"
        post = (b"POST /api/models/upload?name=e2e.npz HTTP/1.1\r\n"
                b"Host: x\r\nContent-Length: %d\r\n" % len(body))
        assert _req(post + b"\r\n" + body).startswith(b"HTTP/1.1 401")
        assert _req(post + b"Authorization: Bearer wrong\r\n\r\n" + body
                    ).startswith(b"HTTP/1.1 401")
        ok = _req(post + b"Authorization: bearer hunter2hunter2\r\n\r\n" + body)
        assert ok.startswith(b"HTTP/1.1 200"), ok[:200]
        # bare-token form (curl convenience, no Bearer scheme)
        ok2 = _req(post + b"Authorization: hunter2hunter2\r\n\r\n" + body)
        assert ok2.startswith(b"HTTP/1.1 200"), ok2[:200]
        # Invalid-UTF-8 header bytes decode to U+FFFD; the compare must
        # still answer 401 (a str-mode compare_digest raises TypeError on
        # non-ASCII and the connection would drop with no response —
        # ADVICE r3 medium).
        bad = _req(post + b"Authorization: Bearer \xff\xfe\xfd\r\n\r\n"
                   + body)
        assert bad.startswith(b"HTTP/1.1 401"), bad[:200]
    finally:
        h.stop()


def test_allow_client_config_off_locks_global_thresholds():
    """network.allow_client_config=false: a client's SET_CONFIG gets
    ERROR(INVALID_REQUEST) and the GLOBAL thresholds stay put (one tenant
    must not be able to blank detections for every stream); read-only
    GET_CONFIG still answers."""
    import json as _json

    from zero_latency_yolo_tpu.protocol import CommandType

    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent/model.npz",
        "port": PORT + 85, "web_port": 0, "max_clients": 2,
        "confidence_threshold": 0.5,
        "network": {"allow_client_config": False},
        "tpu": {"batch_window_ms": 1.0, "frame_buckets": [[128, 128]],
                "batch_buckets": [1]},
    })
    h = ServerHarness(cfg)
    server = h.start()
    c = _client(server.port)
    try:
        c.connect()
        c.start_receiver()
        c.send_command(CommandType.SET_CONFIG,
                       b'{"confidence_threshold": 0.99}')
        deadline = time.monotonic() + 3.0
        while time.monotonic() < deadline and c.errors_seen == 0:
            time.sleep(0.05)
        assert c.errors_seen >= 1
        assert server.engine.config.confidence_threshold == 0.5
        # The lock must also cover a RAW CONFIG_UPDATE datagram (type 7):
        # the wire format is public, so a tenant can craft one directly —
        # it must hit the same gate as SET_CONFIG (ADVICE r3 high).
        from zero_latency_yolo_tpu.protocol import ConfigUpdatePacket
        errors_before = c.errors_seen
        c._send(ConfigUpdatePacket(
            settings={"confidence_threshold": 0.99}).serialize())
        deadline = time.monotonic() + 3.0
        while (time.monotonic() < deadline
               and c.errors_seen == errors_before):
            time.sleep(0.05)
        assert c.errors_seen > errors_before, (
            "raw CONFIG_UPDATE must be refused with an ERROR when "
            "allow_client_config is off")
        assert server.engine.config.confidence_threshold == 0.5
        c.send_command(CommandType.GET_CONFIG)
        deadline = time.monotonic() + 3.0
        echo = None
        while time.monotonic() < deadline and echo is None:
            with c._lock:
                for pkt in c.commands:
                    if pkt.command_type == CommandType.GET_CONFIG:
                        echo = pkt
            time.sleep(0.05)
        assert echo is not None, "GET_CONFIG must stay read-open"
        assert _json.loads(echo.command_data)["confidence_threshold"] == 0.5
    finally:
        c.stop()
        h.stop()


def test_shed_keyframe_request_does_not_burn_rate_limit(harness):
    """A REQUEST_KEYFRAME shed at a full reliable window must leave the
    per-session rate limit and the sent-counter untouched, so the
    management loop's ~1s frozen re-request actually retries (review
    r5)."""
    from zero_latency_yolo_tpu.runtime.server import ClientSession, PendingPacket

    s = ClientSession(client_id=997, addr=("127.0.0.1", 7))
    s.cwnd = 1.0
    s.pending[1] = PendingPacket(data=b"x", addr=s.addr,
                                 sent_at=time.monotonic())
    harness._sessions[997] = s
    try:
        kf0 = harness.keyframe_requests.value
        shed0 = harness.reliable_shed.value
        harness._send_keyframe_requests([997])
        assert harness.keyframe_requests.value == kf0      # not counted
        assert harness.reliable_shed.value == shed0 + 1    # shed counted
        assert s.last_kf_request == 0.0                    # limiter unarmed
        # Window opens (ACK clears pending): the re-request goes through.
        s.ack_pending(1)
        harness._send_keyframe_requests([997])
        assert harness.keyframe_requests.value == kf0 + 1
        assert s.last_kf_request > 0.0
    finally:
        harness._sessions.pop(997, None)


def test_stop_start_restart_accepts_clients():
    """In-process stop() -> start() on the SAME instance must accept new
    handshakes again: _draining is cleared on start and the GC observer is
    reinstalled (review r5 — a restarted instance used to answer every
    CLIENT_INFO with a drain DISCONNECT forever)."""
    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent/model.npz",
        "port": PORT + 90, "web_port": 0, "max_clients": 2,
        "tpu": {"batch_window_ms": 1.0, "frame_buckets": [[128, 128]],
                "batch_buckets": [1]},
    })
    h = ServerHarness(cfg)
    h.start()
    try:
        c = _client(PORT + 90)
        c.connect()
        c.stop()
        # Stop and start the SAME server object on its loop.
        asyncio.run_coroutine_threadsafe(h.server.stop(), h.loop).result(10)
        assert h.server._draining
        asyncio.run_coroutine_threadsafe(h.server.start(), h.loop).result(10)
        assert not h.server._draining
        assert h.server._gc_tracker._installed
        c2 = _client(PORT + 90)
        pkt = c2.connect()        # used to raise TimeoutError (drain NAK)
        assert pkt.info.max_clients == 2
        c2.stop()
    finally:
        h.stop()


def test_config_update_refusal_is_echoed(harness):
    """A refused CONFIG_UPDATE (type 7) must answer with an ERROR carrying
    the refusal reason — review r5: the silent swallow was exactly the
    'silent success with nothing applied' the validator contract forbids,
    and the reason must name the real problem (not 'non-numeric')."""
    import json as _json
    import time as _t

    from zero_latency_yolo_tpu.protocol import ConfigUpdatePacket

    c = _client(harness.port)
    try:
        c.connect()
        c.start_receiver()
        c._send(ConfigUpdatePacket(
            settings={"min_serve_size": 99999}).serialize())
        deadline = _t.monotonic() + 5
        msg = None
        while _t.monotonic() < deadline and msg is None:
            with c._lock:
                for e in c.errors:
                    if "min_serve_size" in e.message:
                        msg = e.message
            _t.sleep(0.05)
        assert msg is not None, "refusal not echoed"
        assert "raise-only" in msg or "out of range" in msg, msg
    finally:
        c.stop()
