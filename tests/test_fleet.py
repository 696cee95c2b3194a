"""SO_REUSEPORT fleet sharding: N server processes on ONE UDP port.

The kernel flow-hashes clients across the shard group (sticky per 4-tuple),
so each session lives wholly inside one shard — the multi-core / multi-chip
scale-out (scripts/serve_fleet.py; the dp=2 gate closure in BENCH_NOTES).
The reference has no multi-process story at all (one process, racing worker
threads — src/inference/onnx_engine.cpp:315-470).
"""

import asyncio
import importlib.util
import json
import os
import threading
import time

import pytest

from zero_latency_yolo_tpu.config import ServerConfig
from zero_latency_yolo_tpu.runtime.server import DetectionServer
from zero_latency_yolo_tpu.runtime.simulator import SimClient, synthetic_frame

PORT = 27488


def _cfg(port=PORT, **net):
    return ServerConfig.from_dict({
        "model_path": "/nonexistent/model.npz",  # simulation mode
        "port": port,
        "web_port": 0,
        "max_clients": 8,
        "network": {"timeout_ms": 2000, "reuse_port": True, **net},
        "tpu": {"batch_window_ms": 1.0,
                "frame_buckets": [[128, 128]],
                "batch_buckets": [1, 2, 4]},
    })


class _Harness:
    """Same in-process server harness as test_server_e2e, one per shard."""

    def __init__(self, config):
        self.server = DetectionServer(config)
        self.loop = asyncio.new_event_loop()
        self.thread = threading.Thread(target=self.loop.run_forever,
                                       daemon=True)

    def start(self):
        self.thread.start()
        asyncio.run_coroutine_threadsafe(
            self.server.start(), self.loop).result(10)
        return self.server

    def stop(self):
        asyncio.run_coroutine_threadsafe(
            self.server.stop(), self.loop).result(10)
        self.loop.call_soon_threadsafe(self.loop.stop)
        self.thread.join(timeout=5)


def test_config_reuse_port_roundtrip(tmp_path):
    cfg = _cfg()
    assert cfg.network.reuse_port is True
    path = str(tmp_path / "server.json")
    cfg.save(path)
    again = ServerConfig.load(path)
    assert again.network.reuse_port is True
    # Old configs that omit the key keep the safe default.
    assert ServerConfig.from_dict({}).network.reuse_port is False


def test_two_shards_share_one_port_and_serve():
    """Two in-process servers bind the SAME port; every client handshakes,
    streams a frame, and gets a result; sessions are disjoint across shards
    (kernel stickiness) and account for every client."""
    shards = [_Harness(_cfg()) for _ in range(2)]
    servers = [h.start() for h in shards]
    try:
        assert servers[0].port == servers[1].port == PORT
        clients = []
        try:
            for i in range(6):
                c = SimClient(("127.0.0.1", PORT),
                              screen_width=96, screen_height=64)
                c.connect()
                c.start_receiver()
                clients.append(c)
            for i, c in enumerate(clients):
                fid = c.send_raw_frame(synthetic_frame(96, 64, seed=i))
                results = c.wait_results(1, timeout=5.0)
                assert results, f"client {i} got no result"
                assert results[0].frame_id == fid
            # Client ids are a per-shard namespace (each shard numbers from
            # 1); flow stickiness is asserted on ADDRESSES: every client
            # socket lands on exactly one shard, and together they account
            # for all of them.
            addrs = [set(s.addr for s in srv._sessions.values())
                     for srv in servers]
            assert len(addrs[0]) + len(addrs[1]) == len(clients)
            assert not (addrs[0] & addrs[1])
        finally:
            for c in clients:
                c.stop()
    finally:
        for h in shards:
            h.stop()


def test_reuse_port_skips_port_fallback():
    """A reuse_port shard must never drift to port+1 (the fleet's clients
    all aim at ONE port): a plain bind holding the port fails the start."""
    import socket
    blocker = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    blocker.bind(("0.0.0.0", PORT + 7))
    try:
        h = _Harness(_cfg(port=PORT + 7))
        with pytest.raises(OSError):
            h.thread.start()
            asyncio.run_coroutine_threadsafe(
                h.server.start(), h.loop).result(10)
        h.loop.call_soon_threadsafe(h.loop.stop)
        h.thread.join(timeout=5)
    finally:
        blocker.close()


def test_native_transport_reuseport_group():
    """Two native transports join one reuseport group; a plain native bind
    on the same port still gets a clean EADDRINUSE (the round-2 port-steal
    fix is preserved)."""
    from zero_latency_yolo_tpu.runtime import transport as t
    if not t.HAVE_NATIVE_UDP_REUSEPORT:
        pytest.skip("native UDP (open2) unavailable")
    port = PORT + 11
    t1 = t.NativeUdpTransport(port, 0, 0, lambda b: None, reuse_port=True)
    try:
        t2 = t.NativeUdpTransport(port, 0, 0, lambda b: None, reuse_port=True)
        t2.close()
        with pytest.raises(OSError):
            t.NativeUdpTransport(port, 0, 0, lambda b: None)
    finally:
        t1.close()


def test_shard_shutdown_notifies_its_clients():
    """Stopping one shard sends COMMAND(DISCONNECT) to ITS sessions only:
    those clients learn immediately (re-handshake onto a survivor in one
    RTT) while the other shard's clients see nothing. The reference
    declared the command type but only ever sent it client->server."""
    port = PORT + 31
    shards = [_Harness(_cfg(port=port)) for _ in range(2)]
    servers = [h.start() for h in shards]
    clients = []
    try:
        while True:
            c = SimClient(("127.0.0.1", port),
                          screen_width=96, screen_height=64)
            c.connect()
            c.start_receiver()
            clients.append(c)
            # Stop growing once both shards hold at least one session.
            if all(srv._sessions for srv in servers) or len(clients) >= 8:
                break
        if not all(srv._sessions for srv in servers):
            pytest.skip("kernel hashed every client onto one shard")
        shard0_addrs = {s.addr for s in servers[0]._sessions.values()}
        shards[0].stop()
        deadline = time.monotonic() + 3.0
        while time.monotonic() < deadline:
            flags = [c.server_disconnected for c in clients]
            want = [c.sock.getsockname() in shard0_addrs for c in clients]
            if all(f for f, w in zip(flags, want) if w):
                break
            time.sleep(0.05)
        for c, w in zip(clients, want):
            assert c.server_disconnected == w, (
                f"client {c.sock.getsockname()} expected "
                f"disconnected={w}, got {c.server_disconnected}")
    finally:
        for c in clients:
            try:
                c.stop()
            except OSError:
                pass
        shards[1].stop()


def test_fleet_rebalance_streams_survive_shard_loss():
    """The full rebalance loop: streams on a 2-shard fleet keep serving
    after one shard stops — its clients get the drain notice, re-handshake
    on the SAME socket (the kernel re-hashes the flow to the survivor),
    re-anchor with a keyframe, and results keep flowing."""
    port = PORT + 37
    shards = [_Harness(_cfg(port=port)) for _ in range(2)]
    servers = [h.start() for h in shards]
    clients, drivers = [], []
    stopped0 = False
    try:
        from zero_latency_yolo_tpu.runtime.simulator import StreamDriver
        while True:
            c = SimClient(("127.0.0.1", port),
                          screen_width=96, screen_height=64)
            c.connect()
            c.start_receiver()
            clients.append(c)
            drivers.append(StreamDriver(c, keyframe_interval=8))
            if all(srv._sessions for srv in servers) or len(clients) >= 8:
                break
        if not all(srv._sessions for srv in servers):
            pytest.skip("kernel hashed every client onto one shard")
        shard0_addrs = {s.addr for s in servers[0]._sessions.values()}
        for t in range(4):  # streams running on both shards
            for d in drivers:
                d.push(synthetic_frame(96, 64, seed=1, t=t * 0.3))
        for c in clients:
            assert c.wait_results(1, timeout=5.0)

        shards[0].stop()
        stopped0 = True
        baseline = {id(c): len(c.results) for c in clients}
        deadline = time.monotonic() + 10.0
        moved = [c for c in clients
                 if c.sock.getsockname() in shard0_addrs]
        assert moved, "no client was on shard 0?"
        while time.monotonic() < deadline:
            for d in drivers:
                d.push(synthetic_frame(96, 64, seed=1,
                                       t=time.monotonic()))
            if all(len(c.results) > baseline[id(c)] + 2 for c in clients):
                break
            time.sleep(0.05)
        for c in clients:
            assert len(c.results) > baseline[id(c)], (
                "stream starved after shard loss")
        for c in moved:
            d = drivers[clients.index(c)]
            assert d.rehandshakes >= 1, "moved client never re-handshook"
        # Every surviving session lives on shard 1 now.
        assert len(servers[1]._sessions) == len(clients)
    finally:
        for c in clients:
            try:
                c.stop()
            except OSError:
                pass
        if not stopped0:
            shards[0].stop()
        shards[1].stop()


def test_fleet_crash_rebalance_via_unknown_sender_nak():
    """A CRASHED shard sends no drain notice: its clients keep streaming
    into the survivor, which answers the sessionless frames with
    ERROR(TIMEOUT) — the client re-handshakes in one RTT and
    streaming resumes (the --on-shard-exit restart loop's crash half)."""
    port = PORT + 41
    shards = [_Harness(_cfg(port=port)) for _ in range(2)]
    servers = [h.start() for h in shards]
    clients, drivers = [], []
    stopped0 = False
    try:
        from zero_latency_yolo_tpu.runtime.simulator import StreamDriver
        while True:
            c = SimClient(("127.0.0.1", port),
                          screen_width=96, screen_height=64)
            c.connect()
            c.start_receiver()
            clients.append(c)
            drivers.append(StreamDriver(c, keyframe_interval=8))
            if all(srv._sessions for srv in servers) or len(clients) >= 8:
                break
        if not all(srv._sessions for srv in servers):
            pytest.skip("kernel hashed every client onto one shard")
        shard0_addrs = {s.addr for s in servers[0]._sessions.values()}
        for t in range(4):
            for d in drivers:
                d.push(synthetic_frame(96, 64, seed=3, t=t * 0.3))
        for c in clients:
            assert c.wait_results(1, timeout=5.0)

        # Crash shard 0: drop its sessions first so stop() sends NO drain
        # notices (SIGKILL semantics — socket closes, clients learn nothing).
        servers[0]._sessions.clear()
        shards[0].stop()
        stopped0 = True
        baseline = {id(c): len(c.results) for c in clients}
        moved = [c for c in clients if c.sock.getsockname() in shard0_addrs]
        assert moved
        deadline = time.monotonic() + 10.0
        while time.monotonic() < deadline:
            for d in drivers:
                d.push(synthetic_frame(96, 64, seed=3, t=time.monotonic()))
            if all(len(c.results) > baseline[id(c)] + 2 for c in clients):
                break
            time.sleep(0.05)
        for c in clients:
            assert len(c.results) > baseline[id(c)], (
                "stream starved after shard crash")
        for c in moved:
            assert drivers[clients.index(c)].rehandshakes >= 1
        # The NAK may be sent by either shard: the dying shard's socket is
        # still in the reuseport group (zero sessions) for the duration of
        # its stop() teardown, so the first sessionless frame can be NAKed
        # there before the kernel moves the flow. Fleet-wide at least one
        # NAK drove the recovery.
        assert sum(s.unknown_sender_naks.value for s in servers) >= 1
        assert len(servers[1]._sessions) == len(clients)
    finally:
        for c in clients:
            try:
                c.stop()
            except OSError:
                pass
        if not stopped0:
            shards[0].stop()
        shards[1].stop()


def test_unknown_sender_nak_rate_limited():
    """The re-handshake NAK is rate-limited per address: two sessionless
    frames inside a second draw exactly ONE ERROR reply (attenuation, not
    a reflection amplifier)."""
    import socket as _socket

    from zero_latency_yolo_tpu.protocol import (
        ErrorCode, FrameDataPacket, PacketType, parse_packet)
    h = _Harness(_cfg(port=PORT + 47))
    server = h.start()
    sock = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", 0))
    sock.settimeout(1.0)
    try:
        frame = FrameDataPacket(frame_id=1, width=8, height=8,
                                data=b"\0" * 192).serialize()
        errors = 0
        for _ in range(2):
            sock.sendto(frame, ("127.0.0.1", PORT + 47))
        deadline = time.monotonic() + 2.0
        while time.monotonic() < deadline:
            try:
                data, _ = sock.recvfrom(65536)
            except _socket.timeout:
                break
            pkt = parse_packet(data)
            if pkt.TYPE == PacketType.ERROR:
                assert pkt.error_code == ErrorCode.TIMEOUT
                errors += 1
        assert errors == 1, f"expected exactly one NAK, got {errors}"
        assert server.unknown_sender_naks.value == 1
        # Idle clients matter too: a sessionless HEARTBEAT (from a fresh
        # address — the rate limiter is per-addr) draws the same NAK.
        from zero_latency_yolo_tpu.protocol import HeartbeatPacket
        sock2 = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
        sock2.bind(("127.0.0.1", 0))
        sock2.settimeout(2.0)
        try:
            sock2.sendto(HeartbeatPacket(ping=7).serialize(),
                         ("127.0.0.1", PORT + 47))
            data, _ = sock2.recvfrom(65536)
            pkt = parse_packet(data)
            assert pkt.TYPE == PacketType.ERROR
            assert pkt.error_code == ErrorCode.TIMEOUT
        finally:
            sock2.close()
    finally:
        sock.close()
        h.stop()


def test_two_native_shards_share_one_port():
    """Same two-shard flow over the C++ recvmmsg transport: the reuseport
    group + drain-thread intake + inline ACK path all in one process pair
    (the production fleet configuration for a loaded host)."""
    from zero_latency_yolo_tpu.runtime import transport as t
    if not t.HAVE_NATIVE_UDP_REUSEPORT:
        pytest.skip("native UDP (open2) unavailable")
    port = PORT + 23
    shards = [_Harness(_cfg(port=port, use_native_transport=True))
              for _ in range(2)]
    servers = [h.start() for h in shards]
    try:
        assert servers[0].port == servers[1].port == port
        assert all(srv._transport is not None for srv in servers)
        clients = []
        try:
            for i in range(6):
                c = SimClient(("127.0.0.1", port),
                              screen_width=96, screen_height=64)
                c.connect()
                c.start_receiver()
                clients.append(c)
            for i, c in enumerate(clients):
                fid = c.send_raw_frame(synthetic_frame(96, 64, seed=i))
                results = c.wait_results(1, timeout=5.0)
                assert results, f"client {i} got no result (native fleet)"
                assert results[0].frame_id == fid
            addrs = [set(s.addr for s in srv._sessions.values())
                     for srv in servers]
            assert len(addrs[0]) + len(addrs[1]) == len(clients)
            assert not (addrs[0] & addrs[1])
        finally:
            for c in clients:
                c.stop()
    finally:
        for h in shards:
            h.stop()


def _load_fleet_module():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "serve_fleet.py")
    spec = importlib.util.spec_from_file_location("serve_fleet", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_restart_budget_rolling_window():
    """--on-shard-exit restart is budget-limited: a crash-looping shard
    stops the fleet instead of flapping forever; the window rolls, and
    budgets are per-shard."""
    fleet = _load_fleet_module()
    clock = {"t": 0.0}
    b = fleet.RestartBudget(max_restarts=3, window_s=300.0,
                            now=lambda: clock["t"])
    assert all(b.allow(0) for _ in range(3))
    assert not b.allow(0)           # budget exhausted at t=0
    assert b.allow(1)               # independent per-shard budget
    clock["t"] = 301.0
    assert b.allow(0)               # the window rolled; events expired
    clock["t"] = 302.0
    assert b.allow(0) and b.allow(0)
    assert not b.allow(0)           # 3 within the new window again


def test_fleet_shard_config_derivation():
    """Derivation happens on the NORMALIZED config: every assertion here is
    on the ServerConfig a shard actually loads, because the raw JSON omits
    keys the server fills with defaults (that mismatch shipped as review
    findings: affinity all on core 0, one shared stats file, web_port=0
    silently re-enabled at the default port)."""
    fleet = _load_fleet_module()
    base = {
        "port": 7788,
        "web_port": 8080,
        "use_cpu_affinity": True,
        "cpu_core_id": 2,
        "logging": {"log_file": "logs/server.log"},
        "analytics": {"stats_file": "logs/stats.json"},
    }
    l0 = ServerConfig.from_dict(fleet.derive_shard_config(base, 0, ncpu=8))
    l1 = ServerConfig.from_dict(fleet.derive_shard_config(base, 1, ncpu=8))
    for l in (l0, l1):
        assert l.network.reuse_port is True
        assert l.network.port == 7788     # every shard on the fleet port
    assert l0.network.web_port == 8080
    assert l1.network.web_port == 8081
    assert l0.logging.log_file == "logs/server-0.log"
    assert l1.logging.log_file == "logs/server-1.log"
    assert l1.analytics.stats_file == "logs/stats-1.json"
    assert l0.cpu_core_id == 2 and l1.cpu_core_id == 3
    # A disabled dashboard stays disabled on every shard — as LOADED, so the
    # default web port cannot sneak back in through an absent key.
    assert ServerConfig.from_dict(
        fleet.derive_shard_config({"web_port": 0}, 1,
                                  ncpu=8)).network.web_port == 0
    # The base dict must not be mutated (shards derive independently).
    assert base["logging"]["log_file"] == "logs/server.log"


def test_fleet_defaults_shard_cleanly():
    """An EMPTY base config (all server defaults) must still derive shards
    that do not collide: distinct cores (affinity defaults ON), distinct
    stats files, distinct web ports from the DEFAULT web port."""
    fleet = _load_fleet_module()
    l0 = ServerConfig.from_dict(fleet.derive_shard_config({}, 0, ncpu=8))
    l1 = ServerConfig.from_dict(fleet.derive_shard_config({}, 1, ncpu=8))
    assert l0.cpu_core_id != l1.cpu_core_id
    assert l0.analytics.stats_file != l1.analytics.stats_file
    assert l0.logging.log_file != l1.logging.log_file
    assert l0.network.web_port != l1.network.web_port
    assert l0.network.web_port == ServerConfig().network.web_port  # 3000


def test_fleet_core_pin_wraps_within_host_cpus(capsys):
    """cpu_core_id+shard past the host's last core would make
    sched_setaffinity fail — the shard would float unpinned while the
    operator believes the fleet is core-isolated. Derivation wraps within
    the host's cores and says so on stderr (a shared pin is visible, a
    silent mis-pin is not)."""
    fleet = _load_fleet_module()
    base = {"use_cpu_affinity": True, "cpu_core_id": 1}
    l0 = ServerConfig.from_dict(fleet.derive_shard_config(base, 0, ncpu=2))
    l1 = ServerConfig.from_dict(fleet.derive_shard_config(base, 1, ncpu=2))
    l2 = ServerConfig.from_dict(fleet.derive_shard_config(base, 2, ncpu=2))
    assert l0.cpu_core_id == 1
    assert l1.cpu_core_id == 0          # wrapped: (1+1) % 2
    assert l2.cpu_core_id == 1          # wrapped: (1+2) % 2
    assert "wrapping" in capsys.readouterr().err


def test_bad_set_config_does_not_trigger_rehandshake():
    """ERROR(INVALID_REQUEST) answers a live session's malformed SET_CONFIG;
    only ERROR(TIMEOUT) — the unknown-sender NAK — may mean session loss.
    A client that re-handshook on any ERROR would silently clear its own
    PAUSE state on every rejected config request."""
    from zero_latency_yolo_tpu.protocol import CommandType
    h = _Harness(_cfg(port=PORT + 53))
    server = h.start()
    c = SimClient(("127.0.0.1", PORT + 53),
                  screen_width=96, screen_height=64)
    try:
        c.connect()
        c.start_receiver()
        c.send_command(CommandType.SET_CONFIG, b"not json at all")
        deadline = time.monotonic() + 2.0
        while time.monotonic() < deadline and c.errors_seen == 0:
            time.sleep(0.05)
        assert c.errors_seen >= 1  # the INVALID_REQUEST reply arrived...
        assert c.server_disconnected is False  # ...and did NOT read as loss
        assert server.client_count() == 1  # no spurious re-handshake churn
    finally:
        c.stop()
        h.stop()


def test_draining_server_refuses_new_handshakes():
    """While stop() tears down (socket still open, kernel still hashing
    this shard's flows here), CLIENT_INFO must NOT mint a session on the
    dying shard — it is answered with the same COMMAND(DISCONNECT) drain
    notice, so the client keeps retrying until the socket closes and the
    kernel re-hashes its flow to a survivor."""
    import socket as _socket

    from zero_latency_yolo_tpu.protocol import (
        ClientInfo, ClientInfoPacket, CommandType, PacketType, parse_packet)
    h = _Harness(_cfg(port=PORT + 59))
    server = h.start()
    sock = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", 0))
    sock.settimeout(2.0)
    try:
        server._draining = True  # the window stop() opens before teardown
        info = ClientInfo(client_id=0, screen_width=64, screen_height=48,
                          game_id=1)
        sock.sendto(ClientInfoPacket(info=info).serialize(),
                    ("127.0.0.1", PORT + 59))
        data, _ = sock.recvfrom(65536)
        pkt = parse_packet(data)
        assert pkt.TYPE == PacketType.COMMAND
        assert pkt.command_type == CommandType.DISCONNECT
        assert server.client_count() == 0
    finally:
        sock.close()
        server._draining = False
        h.stop()


def test_failed_reconnect_keeps_disconnected_flag():
    """A reconnect whose handshake is lost must leave server_disconnected
    SET so the next push() retries immediately — clearing it up front would
    leave the driver streaming sessionless until another (1/s rate-limited)
    NAK arrives."""
    import socket as _socket

    # Reserve a port with no server behind it: every CLIENT_INFO vanishes.
    placeholder = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
    placeholder.bind(("127.0.0.1", 0))
    dead_addr = placeholder.getsockname()
    placeholder.close()
    c = SimClient(dead_addr, screen_width=64, screen_height=48)
    try:
        c.start_receiver()
        c.server_disconnected = True
        assert c.reconnect(timeout=0.3) is False
        assert c.server_disconnected is True  # still set: push() will retry
    finally:
        c.stop()


def test_stale_server_info_does_not_cancel_disconnect():
    """A retransmitted/stale SERVER_INFO (e.g. from the dying shard) while
    NO reconnect is in flight must not cancel a genuine disconnect notice."""
    import socket as _socket

    from zero_latency_yolo_tpu.protocol import ServerInfo, ServerInfoPacket
    h = _Harness(_cfg(port=PORT + 61))
    h.start()
    c = SimClient(("127.0.0.1", PORT + 61),
                  screen_width=96, screen_height=64)
    try:
        c.connect()
        c.start_receiver()
        c.server_disconnected = True
        stale = ServerInfoPacket(info=ServerInfo(
            server_id=9, model_version=1.0, max_clients=8,
            max_fps=60, status=0)).serialize()
        spoof = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
        try:
            spoof.sendto(stale, c.sock.getsockname())
        finally:
            spoof.close()
        time.sleep(0.3)
        assert c.server_disconnected is True
    finally:
        c.stop()
        h.stop()


class _FakeFleet:
    """Deterministic stand-in for the manager's callbacks: shards are
    dicts with alive/healthy flags; time is a manual clock."""

    def __init__(self, n):
        self.t = 0.0
        self.shards = [{"alive": True, "healthy": True, "gen": 0}
                       for _ in range(n)]
        self.log_lines = []
        self.kills = []

    def roller(self, fleet_mod, **kw):
        return fleet_mod.RollingRestarter(
            len(self.shards),
            stop_shard=lambda i: self.shards[i].update(stopping=True),
            kill_shard=lambda i: (self.kills.append(i),
                                  self.shards[i].update(alive=False)),
            respawn=lambda i: self.shards[i].update(
                alive=True, healthy=False, stopping=False,
                gen=self.shards[i]["gen"] + 1),
            is_alive=lambda i: self.shards[i]["alive"],
            healthy=lambda i: self.shards[i]["healthy"],
            log=self.log_lines.append,
            now=lambda: self.t, **kw)


def test_rolling_restart_one_shard_at_a_time():
    """SIGHUP rolls every shard exactly once, strictly serially: shard i+1
    is not touched until shard i's replacement reports healthy. This is the
    zero-downtime path for architecture-changing model swaps (the hot-swap
    watcher rejects those per-shard by design)."""
    fleet = _load_fleet_module()
    f = _FakeFleet(3)
    r = f.roller(fleet)
    r.request()
    assert r.active
    r.tick()                                  # drains shard 0
    assert f.shards[0].get("stopping")
    assert not f.shards[1].get("stopping")    # strictly one at a time
    assert r.expects_exit(0) and not r.expects_exit(1)
    f.shards[0]["alive"] = False              # graceful exit
    r.tick()                                  # respawn 0
    assert f.shards[0]["gen"] == 1 and f.shards[0]["alive"]
    r.tick()                                  # warming: not healthy yet
    assert not f.shards[1].get("stopping")
    f.shards[0]["healthy"] = True
    r.tick()                                  # 0 healthy -> state clears
    r.tick()                                  # drains shard 1
    assert f.shards[1].get("stopping")
    for i in (1, 2):
        f.shards[i]["alive"] = False
        r.tick()
        f.shards[i]["healthy"] = True
        r.tick()
        r.tick()
    assert [s["gen"] for s in f.shards] == [1, 1, 1]
    assert not r.active
    assert any("complete" in m for m in f.log_lines)
    # A second request starts a fresh roll; a request mid-roll is ignored.
    r.request()
    r.tick()
    r.request()
    assert any("ignored" in m for m in f.log_lines)


def test_rolling_restart_kills_shard_that_ignores_sigterm():
    fleet = _load_fleet_module()
    f = _FakeFleet(2)
    r = f.roller(fleet, drain_grace_s=10.0)
    r.request()
    r.tick()                                  # drain shard 0
    f.t = 11.0                                # SIGTERM ignored past grace
    r.tick()
    assert f.kills == [0]
    r.tick()                                  # now dead -> respawn
    assert f.shards[0]["gen"] == 1


def test_rolling_restart_aborts_on_unhealthy_replacement():
    """A replacement that never turns healthy ABORTS the roll: the
    remaining shards keep serving the old model instead of the roll
    marching on and degrading capacity shard by shard."""
    fleet = _load_fleet_module()
    f = _FakeFleet(3)
    r = f.roller(fleet, warm_grace_s=30.0)
    r.request()
    r.tick()
    f.shards[0]["alive"] = False
    r.tick()                                  # respawned, healthy=False
    f.t = 31.0                                # past warm grace
    r.tick()
    assert not r.active                       # aborted
    assert f.shards[1]["gen"] == 0 and f.shards[2]["gen"] == 0
    assert any("ABORTED" in m for m in f.log_lines)


def test_rolling_restart_abort_mid_roll_clears_active():
    """A fleet-stop signal mid-roll supersedes the roll via abort(): active
    must clear IMMEDIATELY (no further ticks), in every phase — the manager's
    exit condition is `no shards alive and not roller.active`, and tick() is
    never called again once the fleet is stopping, so a sticky `active` would
    spin the manager forever after the shards die."""
    fleet = _load_fleet_module()
    for phase in ("queued", "stopping", "warming"):
        f = _FakeFleet(3)
        r = f.roller(fleet)
        r.request()
        if phase in ("stopping", "warming"):
            r.tick()                          # drain shard 0
        if phase == "warming":
            f.shards[0]["alive"] = False
            r.tick()                          # respawn -> warming
        assert r.active
        r.abort()
        assert not r.active, phase
        assert not r.expects_exit(0), phase   # exits now fall to the manager


def test_rolling_restart_aborts_when_replacement_dies():
    fleet = _load_fleet_module()
    f = _FakeFleet(2)
    r = f.roller(fleet)
    r.request()
    r.tick()
    f.shards[0]["alive"] = False
    r.tick()                                  # respawn
    f.shards[0]["alive"] = False              # replacement crashes
    r.tick()
    assert not r.active
    assert not r.expects_exit(0)              # crash falls to the manager's
    assert f.shards[1]["gen"] == 0            # --on-shard-exit policy


def test_pid_bound_to_udp_port_sees_real_sockets():
    """The dashboardless roll health check reads /proc: a UDP socket this
    very process binds must be visible, and an unbound port must not —
    'bound' is the zero-downtime gate (the server binds before warmup and
    queues frames host-side; a time grace can pass a replacement that is
    still importing, draining the next shard into a no-listener window)."""
    import socket

    fleet = _load_fleet_module()
    if not os.path.isdir(f"/proc/{os.getpid()}/fd"):
        pytest.skip("no /proc on this platform")
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        assert fleet.pid_bound_to_udp_port(os.getpid(), port)
        # TCP on some other port is not a UDP bind; a dead pid is False.
        assert not fleet.pid_bound_to_udp_port(os.getpid(), 1)
    finally:
        s.close()
    assert not fleet.pid_bound_to_udp_port(os.getpid(), port)


def test_rolling_restart_e2e_zero_downtime():
    """THE deployment claim, end-to-end at the wire: a real serve_fleet.py
    manager process with 2 sim-mode shards, live streams pushing frames the
    whole time, `kill -HUP` -> both shards respawn one at a time onto new
    pids, every stream keeps receiving results throughout (drain notice ->
    re-handshake onto the survivor), and SIGTERM exits rc=0 with no orphan
    shard processes."""
    import re
    import signal as _signal
    import subprocess
    import sys as _sys

    from zero_latency_yolo_tpu.runtime.simulator import StreamDriver

    port = PORT + 53
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfgdir = os.path.join("/tmp", f"zlt-rolltest-{os.getpid()}")
    os.makedirs(cfgdir, exist_ok=True)
    cfg_path = os.path.join(cfgdir, "server.json")
    with open(cfg_path, "w", encoding="utf-8") as f:
        json.dump({
            "model_path": "/nonexistent/model.npz",   # simulation mode
            "port": port, "web_port": 0, "max_clients": 8,
            "use_cpu_affinity": False,
            "logging": {"log_file": os.path.join(cfgdir, "server.log")},
            "analytics": {"stats_file": os.path.join(cfgdir, "stats.json")},
            "network": {"timeout_ms": 4000},
            "tpu": {"batch_window_ms": 1.0, "frame_buckets": [[128, 128]],
                    "batch_buckets": [1, 2, 4]},
        }, f)
    log_path = os.path.join(cfgdir, "fleet.log")
    env = dict(os.environ)
    env.pop("ZLT_SYNTH_STEP_MS", None)
    with open(log_path, "w", encoding="utf-8") as logf:
        mgr = subprocess.Popen(
            [_sys.executable, os.path.join(repo, "scripts", "serve_fleet.py"),
             "--config", cfg_path, "--shards", "2", "--platform", "cpu",
             "--status-interval", "0", "--roll-warm-grace", "90",
             "--roll-drain-grace", "10"],
            cwd=repo, env=env, stdout=logf, stderr=subprocess.STDOUT)
    clients, drivers = [], []
    try:
        def log_text():
            with open(log_path, encoding="utf-8", errors="replace") as f:
                return f.read()

        def spawned_pids():
            return [int(m) for m in
                    re.findall(r"shard \d+: pid=(\d+)", log_text())]

        # Wait until both shards actually serve (handshake + first result).
        deadline = time.monotonic() + 60.0
        while time.monotonic() < deadline and len(clients) < 4:
            c = SimClient(("127.0.0.1", port),
                          screen_width=96, screen_height=64)
            try:
                c.connect()                   # own 3s handshake deadline
            except Exception:
                c.sock.close()
                time.sleep(0.5)
                continue
            c.start_receiver()
            clients.append(c)
            drivers.append(StreamDriver(c, keyframe_interval=8))
        assert len(clients) == 4, f"fleet never served: {log_text()[-2000:]}"
        # Keep pushing while waiting: under heavy co-located load (one-core
        # box running a parallel compile) a single 3-frame burst can be
        # entirely shed by a still-warming shard, and a one-shot 10 s wait
        # then flakes — sustained pushes make this a liveness check, not a
        # single-burst delivery bet.
        deadline = time.monotonic() + 30.0
        t = 0
        while time.monotonic() < deadline and any(
                not c.results for c in clients):
            for d in drivers:
                d.push(synthetic_frame(96, 64, seed=2, t=t * 0.3))
            t += 1
            time.sleep(0.3)
        for c in clients:
            assert c.results, "no results pre-roll"
        boot_pids = spawned_pids()
        assert len(boot_pids) == 2

        mgr.send_signal(_signal.SIGHUP)
        # Stream continuously through the whole roll.
        deadline = time.monotonic() + 150.0
        while time.monotonic() < deadline:
            for d in drivers:
                d.push(synthetic_frame(96, 64, seed=2, t=time.monotonic()))
            if "rolling restart complete" in log_text():
                break
            time.sleep(0.1)
        else:
            raise AssertionError(
                f"roll never completed: {log_text()[-2000:]}")
        all_pids = spawned_pids()
        assert len(all_pids) == 4, all_pids
        assert set(all_pids[2:]).isdisjoint(boot_pids), "shards not respawned"

        # Zero downtime: every stream moved shards at least once (both
        # shards drained) and keeps getting results AFTER the roll.
        baseline = {id(c): len(c.results) for c in clients}
        deadline = time.monotonic() + 20.0
        while time.monotonic() < deadline:
            for d in drivers:
                d.push(synthetic_frame(96, 64, seed=2, t=time.monotonic()))
            if all(len(c.results) > baseline[id(c)] + 2 for c in clients):
                break
            time.sleep(0.1)
        for c in clients:
            assert len(c.results) > baseline[id(c)], (
                "stream starved after the roll")
        for d in drivers:
            assert d.rehandshakes >= 1, "client never re-handshook mid-roll"
    finally:
        for c in clients:
            try:
                c.stop()
            except OSError:
                pass
        if mgr.poll() is None:
            mgr.send_signal(_signal.SIGTERM)
        try:
            rc = mgr.wait(timeout=40.0)
        except subprocess.TimeoutExpired:
            mgr.kill()
            raise AssertionError("fleet manager ignored SIGTERM")
    assert rc == 0, f"manager exit rc={rc}: {log_text()[-2000:]}"
    # No orphan shard processes survive the manager.
    for pid in spawned_pids():
        assert not os.path.isdir(f"/proc/{pid}"), f"orphan shard pid {pid}"


def test_fleet_canary_model_derivation():
    """--canary-model: the override lands on the derived shard config (and
    ONLY when passed), composing with the usual per-shard derivation; the
    base dict is untouched."""
    fleet = _load_fleet_module()
    base = {"model_path": "models/base.npz", "web_port": 8080}
    l0 = ServerConfig.from_dict(fleet.derive_shard_config(base, 0, ncpu=8))
    l1 = ServerConfig.from_dict(fleet.derive_shard_config(
        base, 1, ncpu=8, model_path="models/candidate.npz"))
    assert l0.model_path == "models/base.npz"
    assert l1.model_path == "models/candidate.npz"
    assert l1.network.web_port == 8081  # normal derivation still applies
    assert base["model_path"] == "models/base.npz"


def test_fleet_canary_cli_validation(tmp_path):
    """Canary misconfig fails BEFORE any shard spawns: no baseline shard
    left, or a typo'd artifact path (which would boot the canary cohort in
    simulation mode — random detections presented as the candidate)."""
    import subprocess
    import sys as _sys

    script = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                          "serve_fleet.py")
    model = tmp_path / "cand.npz"
    model.write_bytes(b"x")
    # All shards canary -> no baseline cohort to compare against.
    r = subprocess.run(
        [_sys.executable, script, "--shards", "2", "--canary-shards", "2",
         "--canary-model", str(model)],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 2 and "baseline" in r.stderr
    # Nonexistent artifact.
    r = subprocess.run(
        [_sys.executable, script, "--shards", "2",
         "--canary-model", str(tmp_path / "nope.npz")],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 2 and "does not exist" in r.stderr


def test_fleet_canary_e2e_two_cohorts():
    """Canary rollout end-to-end: a real serve_fleet.py manager, shard 0 on
    the base model (nonexistent -> simulation mode), shard 1 serving a REAL
    pico artifact via --canary-model. Each shard's own statusz proves which
    artifact its cohort rides (model_file + model_sha + simulation flag) —
    the per-cohort comparison surface the feature exists for."""
    import subprocess
    import sys as _sys
    import urllib.request

    import jax as _jax

    from zero_latency_yolo_tpu.models import get_spec, init_params, save_params

    port = PORT + 61
    web = 28480
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfgdir = os.path.join("/tmp", f"zlt-canarytest-{os.getpid()}")
    os.makedirs(cfgdir, exist_ok=True)
    cand = os.path.join(cfgdir, "cand.npz")
    save_params(init_params(_jax.random.PRNGKey(0), get_spec("yolov8p", 4),
                            folded=True), cand)
    cfg_path = os.path.join(cfgdir, "server.json")
    with open(cfg_path, "w", encoding="utf-8") as f:
        json.dump({
            "model_path": os.path.join(cfgdir, "base.npz"),  # nonexistent
            "port": port, "web_port": web, "max_clients": 4,
            "use_cpu_affinity": False,
            "logging": {"log_file": os.path.join(cfgdir, "server.log")},
            "analytics": {"stats_file": os.path.join(cfgdir, "stats.json")},
            "detection": {"model_width": 64, "model_height": 64},
            "tpu": {"variant": "yolov8p", "num_classes": 4,
                    "dtype": "float32", "batch_window_ms": 1.0,
                    "frame_buckets": [[96, 96]], "batch_buckets": [1, 2]},
        }, f)
    log_path = os.path.join(cfgdir, "fleet.log")
    with open(log_path, "w", encoding="utf-8") as logf:
        mgr = subprocess.Popen(
            [_sys.executable, os.path.join(repo, "scripts", "serve_fleet.py"),
             "--config", cfg_path, "--shards", "2", "--platform", "cpu",
             "--status-interval", "0", "--canary-model", cand],
            cwd=repo, stdout=logf, stderr=subprocess.STDOUT)
    try:
        def statusz(shard):
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{web + shard}/statusz",
                        timeout=2) as r:
                    return json.loads(r.read())
            except Exception:
                return None

        deadline = time.monotonic() + 120.0
        st0 = st1 = None
        while time.monotonic() < deadline and not (st0 and st1):
            st0, st1 = statusz(0), statusz(1)
            time.sleep(1.0)
        with open(log_path, encoding="utf-8", errors="replace") as f:
            log_text = f.read()
        assert st0 and st1, f"shards never answered statusz: {log_text[-2000:]}"
        assert "CANARY" in log_text
        eng0, eng1 = st0["engine"], st1["engine"]
        assert eng0["model_file"] == "base.npz"
        assert eng0["simulation"] == "true"          # base file absent
        assert eng1["model_file"] == "cand.npz"      # the canary cohort
        assert eng1["simulation"] == "false"
        assert len(eng1["model_sha"]) == 12           # real artifact hashed
    finally:
        mgr.terminate()
        try:
            mgr.wait(timeout=30)
        except subprocess.TimeoutExpired:
            mgr.kill()
            mgr.wait(timeout=10)


def test_sighup_reload_repoints_model_on_roll():
    """SIGHUP re-reads --config before rolling: edit model_path, HUP, and
    the respawned shard serves the NEW file — the documented promote path
    (re-point + roll) for canary/architecture changes. Refused reloads
    (port moves) keep the boot-time derivation."""
    import signal as _signal
    import subprocess
    import sys as _sys
    import urllib.request

    port = PORT + 67
    web = 28490
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfgdir = os.path.join("/tmp", f"zlt-reloadtest-{os.getpid()}")
    os.makedirs(cfgdir, exist_ok=True)
    cfg_path = os.path.join(cfgdir, "server.json")

    def write_cfg(model_name):
        with open(cfg_path, "w", encoding="utf-8") as f:
            json.dump({
                "model_path": os.path.join(cfgdir, model_name),  # sim mode
                "port": port, "web_port": web, "max_clients": 4,
                "use_cpu_affinity": False,
                "logging": {"log_file": os.path.join(cfgdir, "server.log")},
                "analytics": {"stats_file": os.path.join(cfgdir, "st.json")},
                "tpu": {"batch_window_ms": 1.0,
                        "frame_buckets": [[96, 96]], "batch_buckets": [1, 2]},
            }, f)

    write_cfg("a.npz")
    log_path = os.path.join(cfgdir, "fleet.log")
    with open(log_path, "w", encoding="utf-8") as logf:
        mgr = subprocess.Popen(
            [_sys.executable, os.path.join(repo, "scripts", "serve_fleet.py"),
             "--config", cfg_path, "--shards", "1", "--platform", "cpu",
             "--status-interval", "0", "--roll-warm-grace", "90",
             "--roll-drain-grace", "10"],
            cwd=repo, stdout=logf, stderr=subprocess.STDOUT)
    try:
        def statusz():
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{web}/statusz", timeout=2) as r:
                    return json.loads(r.read())
            except Exception:
                return None

        def log_text():
            with open(log_path, encoding="utf-8", errors="replace") as f:
                return f.read()

        deadline = time.monotonic() + 90.0
        st = None
        while time.monotonic() < deadline and not st:
            st = statusz()
            time.sleep(1.0)
        assert st, f"shard never served statusz: {log_text()[-2000:]}"
        assert st["engine"]["model_file"] == "a.npz"

        write_cfg("b.npz")                       # re-point the config...
        mgr.send_signal(_signal.SIGHUP)          # ...and roll
        deadline = time.monotonic() + 120.0
        while time.monotonic() < deadline:
            if "rolling restart complete" in log_text():
                break
            time.sleep(0.5)
        else:
            raise AssertionError(f"roll never completed: {log_text()[-2000:]}")
        assert "config reloaded" in log_text()
        deadline = time.monotonic() + 60.0
        st = None
        while time.monotonic() < deadline:
            st = statusz()
            if st and st["engine"]["model_file"] == "b.npz":
                break
            time.sleep(1.0)
        assert st and st["engine"]["model_file"] == "b.npz", (
            f"respawned shard kept the old model: {st}")
    finally:
        mgr.terminate()
        try:
            mgr.wait(timeout=30)
        except subprocess.TimeoutExpired:
            mgr.kill()
            mgr.wait(timeout=10)
