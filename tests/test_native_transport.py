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
    server.device_cache.warm()  # see test_server_e2e harness note
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


def test_inline_ack_from_drain_thread(harness):
    """v2 transport: a registered peer's packet is ACKed by the C++ drain
    path (reference ACK-all, reliable_udp.cpp:602-605) — the ACK carries the
    original packet's sequence, and arrives even before the loop thread runs
    the packet handler."""
    import socket as _socket

    from zero_latency_yolo_tpu.protocol import (
        AckPacket, ClientInfo, ClientInfoPacket, HeartbeatPacket, PacketType,
        parse_packet)
    from zero_latency_yolo_tpu.runtime.transport import HAVE_NATIVE_UDP_V2
    if not HAVE_NATIVE_UDP_V2:
        pytest.skip("v2 UDP symbols unavailable")

    sock = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
    sock.settimeout(3.0)
    sock.bind(("127.0.0.1", 0))
    try:
        sock.sendto(ClientInfoPacket(info=ClientInfo(
            client_id=0, protocol_version=1, screen_width=96,
            screen_height=64, game_id=1)).serialize(), ("127.0.0.1", PORT))
        # Absorb the SERVER_INFO reply (registration also installs us in the
        # native peer table).
        deadline = time.monotonic() + 3.0
        while time.monotonic() < deadline:
            data, _ = sock.recvfrom(65536)
            if parse_packet(data).TYPE == PacketType.SERVER_INFO:
                break
        hb = HeartbeatPacket(ping=7)
        raw = hb.serialize()
        sock.sendto(raw, ("127.0.0.1", PORT))
        acked = None
        deadline = time.monotonic() + 3.0
        while time.monotonic() < deadline and acked is None:
            data, _ = sock.recvfrom(65536)
            pkt = parse_packet(data)
            if isinstance(pkt, AckPacket) and \
                    pkt.acked_sequence == hb.sequence:
                acked = pkt
        assert acked is not None, "no inline ACK for the heartbeat"
    finally:
        sock.close()


def test_send_many_burst(harness):
    """send_many (sendmmsg) delivers every packet of a result-sized burst."""
    from zero_latency_yolo_tpu.protocol import HeartbeatPacket, parse_packet
    from zero_latency_yolo_tpu.runtime.transport import HAVE_NATIVE_UDP_V2
    if not HAVE_NATIVE_UDP_V2:
        pytest.skip("v2 UDP symbols unavailable")
    import socket as _socket
    sock = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
    sock.settimeout(3.0)
    sock.bind(("127.0.0.1", 0))
    addr = sock.getsockname()
    try:
        pkts = [(HeartbeatPacket(ping=i).serialize(), addr)
                for i in range(100)]  # > one sendmmsg chunk (64)
        sent, _bytes = harness._transport.send_many(pkts)
        assert sent == 100
        got = set()
        deadline = time.monotonic() + 3.0
        while time.monotonic() < deadline and len(got) < 100:
            data, _ = sock.recvfrom(65536)
            got.add(parse_packet(data).ping)
        assert got == set(range(100))
    finally:
        sock.close()


def test_v1_fallback_drain_loop(monkeypatch):
    """With v2 symbols unavailable (older .so), the v1 drain loop still
    delivers (data, addr, None, False) tuples and send_many falls back to
    per-packet sendto."""
    import zero_latency_yolo_tpu.runtime.transport as tr
    monkeypatch.setattr(tr, "HAVE_NATIVE_UDP_V2", False)
    import socket as _socket
    import queue

    got = queue.Queue()
    t = tr.NativeUdpTransport(27590, 1 << 20, 1 << 20,
                              on_batch=lambda b: [got.put(x) for x in b])
    sock = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", 0))
    try:
        sock.sendto(b"hello-v1", ("127.0.0.1", 27590))
        data, addr, hdr, acked = got.get(timeout=3)
        assert data == b"hello-v1" and hdr is None and not acked
        # send_many fallback delivers all packets.
        sock.settimeout(3.0)
        n, nbytes = t.send_many(
            [(b"x%d" % i, sock.getsockname()) for i in range(5)])
        assert n == 5 and nbytes == 10
        seen = set()
        while len(seen) < 5:
            seen.add(sock.recvfrom(64)[0])
        assert seen == {b"x0", b"x1", b"x2", b"x3", b"x4"}
    finally:
        sock.close()
        t.close()


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


def test_send_many_partial_send_skips_only_failed():
    """A partial sendmmsg return must not drop the burst tail: the failing
    message gets one single-send retry, then only IT is skipped."""
    from zero_latency_yolo_tpu.runtime import transport as tr
    t = tr.NativeUdpTransport(27591, 1 << 20, 1 << 20, lambda b: None)
    try:
        items = [(b"pkt-a" * 10, ("127.0.0.1", 9001)),
                 (b"pkt-b" * 10, ("127.0.0.1", 9002)),
                 (b"pkt-c" * 10, ("127.0.0.1", 9003))]

        class FakeLib:
            def __init__(self, retry_rc):
                self.batch_calls = []
                self.single_calls = []
                self.retry_rc = retry_rc

            def zl_udp_send_batch(self, fd, arena, descs, n):
                self.batch_calls.append(n)
                if len(self.batch_calls) == 1:
                    return 1  # sent 1 of n; message at index 1 failed
                return n

            def zl_udp_send(self, fd, data, ln, ip, port):
                self.single_calls.append(bytes(data[:5]))
                return self.retry_rc

        # Retry succeeds: every message delivered, nothing dropped.
        fake = FakeLib(retry_rc=50)
        t._lib = fake
        sent, nbytes = t.send_many(items)
        assert sent == 3 and nbytes == sum(len(d) for d, _ in items)
        assert t.dropped == 0
        assert fake.single_calls == [b"pkt-b"]  # only the failed head retried
        assert fake.batch_calls == [3, 1]       # tail resent as its own burst

        # Retry fails too: only that one message is dropped, tail still goes.
        fake2 = FakeLib(retry_rc=-1)
        t._lib = fake2
        sent, nbytes = t.send_many(items)
        assert sent == 2 and nbytes == len(items[0][0]) + len(items[2][0])
        assert t.dropped == 1
        assert fake2.batch_calls == [3, 1]
    finally:
        t._lib = tr._codec._LIB  # restore before close()
        t.close()


def test_native_bind_address_scoped():
    """zl_udp_open3 binds an explicit interface; garbage addresses are
    -EINVAL, never a silent INADDR_ANY listen."""
    import socket as _socket

    from zero_latency_yolo_tpu.runtime.transport import (
        HAVE_NATIVE_UDP_BIND_ADDR, NativeUdpTransport)
    if not HAVE_NATIVE_UDP_BIND_ADDR:
        pytest.skip(".so predates zl_udp_open3")
    got = []
    t = NativeUdpTransport(PORT + 40, 1 << 20, 1 << 20,
                           lambda batch: got.extend(batch),
                           bind_address="127.0.0.1")
    try:
        s = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
        s.sendto(b"x" * 8, ("127.0.0.1", PORT + 40))
        s.close()
        deadline = time.monotonic() + 3.0
        while time.monotonic() < deadline and not got:
            time.sleep(0.02)
        assert got and got[0][0] == b"x" * 8
    finally:
        t.close()
    with pytest.raises(OSError):
        NativeUdpTransport(PORT + 41, 1 << 20, 1 << 20, lambda b: None,
                           bind_address="not-an-ip")
