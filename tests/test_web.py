"""Management-plane HTTP API tests (reference web dashboard parity)."""

import asyncio
import json
import urllib.request

import pytest

from zero_latency_yolo_tpu.runtime.web import ManagementApi


@pytest.fixture()
def api(tmp_path):
    models = tmp_path / "models"
    logs = tmp_path / "logs"
    models.mkdir()
    logs.mkdir()
    (models / "yolo_nano_cs16.onnx").write_bytes(b"onnx-bytes")
    (logs / "server.log").write_text("line1\nline2\n")
    return ManagementApi(status_fn=lambda: {"clients": 2},
                         models_dir=str(models), logs_dir=str(logs))


def _call(api, method, path, body=b""):
    return asyncio.run(api.handle(method, path, body))


def test_status_routes(api):
    for route in ("/", "/statusz", "/api/server/status"):
        code, payload = _call(api, "GET", route)
        assert code == 200 and payload == {"clients": 2}


def test_model_list_and_upload(api):
    code, payload = _call(api, "GET", "/api/models")
    assert code == 200
    assert payload["models"][0]["name"] == "yolo_nano_cs16.onnx"
    code, payload = _call(api, "POST", "/api/models/upload?name=new.npz",
                          b"\x00" * 64)
    assert code == 200 and payload["ok"]
    code, payload = _call(api, "GET", "/api/models")
    assert {m["name"] for m in payload["models"]} == {
        "yolo_nano_cs16.onnx", "new.npz"}


def test_model_upload_rejects_bad_names(api):
    assert _call(api, "POST", "/api/models/upload?name=../evil.onnx", b"x")[0] == 400
    assert _call(api, "POST", "/api/models/upload?name=ok.txt", b"x")[0] == 400
    assert _call(api, "POST", "/api/models/upload?name=ok.onnx", b"")[0] == 400


def test_log_list_view_and_traversal_guard(api):
    code, payload = _call(api, "GET", "/api/logs")
    assert code == 200 and payload["logs"][0]["name"] == "server.log"
    code, payload = _call(api, "GET", "/api/logs/server.log")
    assert code == 200 and "line1" in payload["content"]
    assert _call(api, "GET", "/api/logs/../../etc/passwd")[0] == 400
    assert _call(api, "GET", "/api/logs/%2e%2e%2fetc")[0] in (400, 404)
    assert _call(api, "GET", "/api/logs/missing.log")[0] == 404


def test_client_version_and_404(api):
    code, payload = _call(api, "GET", "/api/client/version")
    assert code == 200 and "version" in payload
    assert _call(api, "GET", "/api/nope")[0] == 404


def test_http_end_to_end(tmp_path):
    """Full HTTP round-trip against a live server's statusz port."""
    import threading
    from zero_latency_yolo_tpu.config import ServerConfig
    from zero_latency_yolo_tpu.runtime.server import DetectionServer

    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent.npz",
        "port": 27391, "web_port": 27392, "max_clients": 2,
        "tpu": {"frame_buckets": [[64, 64]], "batch_buckets": [1]},
    })
    server = DetectionServer(cfg)
    loop = asyncio.new_event_loop()
    t = threading.Thread(target=loop.run_forever, daemon=True)
    t.start()
    asyncio.run_coroutine_threadsafe(server.start(), loop).result(10)
    try:
        with urllib.request.urlopen(
                "http://127.0.0.1:27392/api/server/status", timeout=5) as r:
            payload = json.loads(r.read())
        assert payload["server"] == "zero_latency_yolo_tpu"
        assert payload["engine"]["simulation"] == "true"
        with urllib.request.urlopen(
                "http://127.0.0.1:27392/api/models", timeout=5) as r:
            assert r.status == 200
    finally:
        asyncio.run_coroutine_threadsafe(server.stop(), loop).result(10)
        loop.call_soon_threadsafe(loop.stop)
        t.join(timeout=5)


def test_metricsz_prometheus_format(tmp_path):
    """/metricsz flattens the numeric status leaves into Prometheus text;
    numeric-looking STRINGS export too (the engine status map is all-string
    by the reference getStatus() contract); non-numeric strings and
    per-session rows (unbounded label cardinality) are skipped."""
    status = {
        "server": "zero_latency_yolo_tpu",          # string -> skipped
        "clients": 3,
        "served_fps": 123.5,
        "transport": {"packets_received": 42, "rx_pps": 7.0},
        "detect_latency": {"p99 ms": 6.25},          # key sanitized
        # The engine subtree is all-string by design: numeric strings MUST
        # still export or the endpoint is blind to engine health.
        "engine": {"simulation": "true", "inferences": "1234",
                   "pipeline_p99_ms": "6.44", "model": "n.npz",
                   "bad": "nan"},
        "frame_cache": None,                         # absent tree tolerated
        "sessions": {"1": {"frames": 9}},            # skipped wholesale
        "paused": True,                              # bool -> 0/1
    }
    api = ManagementApi(status_fn=lambda: status,
                        models_dir=str(tmp_path), logs_dir=str(tmp_path))
    code, payload = _call(api, "GET", "/metricsz")
    assert code == 200 and "__text__" in payload
    lines = payload["__text__"].strip().splitlines()
    metrics = dict(line.rsplit(" ", 1) for line in lines)
    assert metrics["zlt_clients"] == "3"
    assert metrics["zlt_served_fps"] == "123.5"
    assert metrics["zlt_transport_packets_received"] == "42"
    assert metrics["zlt_detect_latency_p99_ms"] == "6.25"
    assert metrics["zlt_paused"] == "1"
    assert metrics["zlt_engine_inferences"] == "1234"
    assert metrics["zlt_engine_pipeline_p99_ms"] == "6.44"
    assert "zlt_engine_simulation" not in metrics  # non-numeric string
    assert "zlt_engine_model" not in metrics
    assert "zlt_engine_bad" not in metrics         # nan never exported
    assert not any(k.startswith("zlt_sessions") for k in metrics)
    assert not any(k.startswith("zlt_server") for k in metrics)


def test_metricsz_http_content_type(tmp_path):
    """Over HTTP the endpoint must answer text/plain, not JSON — that is
    what a Prometheus scraper parses."""
    import threading
    from zero_latency_yolo_tpu.config import ServerConfig
    from zero_latency_yolo_tpu.runtime.server import DetectionServer

    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent.npz",
        "port": 27393, "web_port": 27394, "max_clients": 2,
        "tpu": {"frame_buckets": [[64, 64]], "batch_buckets": [1]},
    })
    server = DetectionServer(cfg)
    loop = asyncio.new_event_loop()
    t = threading.Thread(target=loop.run_forever, daemon=True)
    t.start()
    asyncio.run_coroutine_threadsafe(server.start(), loop).result(10)
    try:
        with urllib.request.urlopen(
                "http://127.0.0.1:27394/metricsz", timeout=5) as r:
            assert r.headers.get_content_type() == "text/plain"
            body = r.read().decode()
        assert "zlt_clients 0" in body
        assert "zlt_transport_packets_received" in body
    finally:
        asyncio.run_coroutine_threadsafe(server.stop(), loop).result(10)
        loop.call_soon_threadsafe(loop.stop)
        t.join(timeout=5)


def test_historyz_route(tmp_path):
    """/historyz serves the monitor loop's rolling snapshots (the trend the
    reference's web plane scraped from log files); absent wiring -> []."""
    hist = [{"t": 1.0, "served_fps": 100.0, "detect_p99_ms": 5.0}]
    api = ManagementApi(status_fn=lambda: {}, history_fn=lambda: list(hist),
                        models_dir=str(tmp_path), logs_dir=str(tmp_path))
    code, payload = _call(api, "GET", "/historyz")
    assert code == 200 and payload == {"history": hist}
    bare = ManagementApi(status_fn=lambda: {}, models_dir=str(tmp_path),
                         logs_dir=str(tmp_path))
    assert _call(bare, "GET", "/historyz") == (200, {"history": []})


def test_debugz_route(tmp_path):
    """/debugz serves sampled per-frame lifecycle traces (the reference's
    per-frame DEBUG timing line, onnx_engine.cpp:615-618, as structured
    data); absent wiring -> []."""
    traces = [{"client_id": 1, "frame_id": 7, "detect_ms": 4.2}]
    api = ManagementApi(status_fn=lambda: {}, traces_fn=lambda: list(traces),
                        models_dir=str(tmp_path), logs_dir=str(tmp_path))
    code, payload = _call(api, "GET", "/debugz")
    assert code == 200 and payload == {"traces": traces}
    bare = ManagementApi(status_fn=lambda: {}, models_dir=str(tmp_path),
                         logs_dir=str(tmp_path))
    assert _call(bare, "GET", "/debugz") == (200, {"traces": []})


def test_trace_sampling_e2e_loopback():
    """tpu.trace_sample_every=1: every served frame lands in the trace ring
    with its stage spans; stages compose into the total."""
    import threading
    import time as _time

    from zero_latency_yolo_tpu.config import ServerConfig
    from zero_latency_yolo_tpu.runtime.server import DetectionServer
    from zero_latency_yolo_tpu.runtime.simulator import (
        SimClient, synthetic_frame)

    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent/model.npz",  # simulation mode
        "port": 27996, "web_port": 0, "max_clients": 2,
        "network": {"timeout_ms": 20000},
        "tpu": {"batch_window_ms": 1.0, "frame_buckets": [[64, 96]],
                "batch_buckets": [1, 2], "trace_sample_every": 1},
    })
    server = DetectionServer(cfg)
    loop = asyncio.new_event_loop()
    t = threading.Thread(target=loop.run_forever, daemon=True)
    t.start()
    asyncio.run_coroutine_threadsafe(server.start(), loop).result(30)
    c = SimClient(("127.0.0.1", 27996), screen_width=96, screen_height=64)
    try:
        c.connect()
        c.start_receiver()
        frame = synthetic_frame(96, 64)
        for _ in range(5):
            c.send_raw_frame(frame)
            _time.sleep(0.05)
        assert c.wait_results(3, timeout=10)
        code, payload = _call(server.management, "GET", "/debugz")
        assert code == 200
        traces = payload["traces"]
        assert traces, "no lifecycle traces sampled at sample_every=1"
        for tr in traces:
            assert tr["client_id"] == 1
            assert tr["batch"] >= 1
            # Stage spans are non-negative and compose into the total.
            assert tr["decode_ms"] >= 0 and tr["queue_ms"] >= 0
            assert tr["pipeline_ms"] >= 0 and tr["send_ms"] >= 0
            assert tr["detect_ms"] >= 0
            assert (tr["queue_ms"] + tr["pipeline_ms"] + tr["send_ms"]
                    <= tr["detect_ms"] + 0.01)
            # decode is a prefix of the total (it is a prefix of queue_ms
            # only on the real-device path; simulated results carry
            # queue_ms=0).
            assert tr["decode_ms"] <= tr["detect_ms"] + 0.01
    finally:
        c.stop()
        asyncio.run_coroutine_threadsafe(server.stop(), loop).result(30)
        loop.call_soon_threadsafe(loop.stop)
        t.join(timeout=5)


def test_trace_sample_every_config_gate():
    from zero_latency_yolo_tpu.config import ServerConfig

    import pytest
    with pytest.raises(ValueError, match="trace_sample_every"):
        ServerConfig.from_dict({"tpu": {"trace_sample_every": -1}})
    cfg = ServerConfig.from_dict({"tpu": {"trace_sample_every": 8}})
    assert cfg.tpu.trace_sample_every == 8


def test_profilez_routes(tmp_path):
    """POST /profilez runs the wired capture fn; GET reports status; the
    unwired API 404s; bad/busy captures map to 400/409."""
    calls = []

    def fake_capture(seconds):
        calls.append(seconds)
        if seconds > 10:
            return {"error": "seconds must be in [0.05, 30.0]"}
        if seconds == 5.0:
            return {"error": "a profile capture is already in flight"}
        return {"ok": True, "dir": str(tmp_path), "seconds": seconds,
                "files": [{"name": "t.xplane.pb", "size": 10}]}

    api = ManagementApi(status_fn=lambda: {}, models_dir=str(tmp_path),
                        logs_dir=str(tmp_path),
                        profile_fn=fake_capture,
                        profile_status_fn=lambda: {"capturing": False,
                                                   "last": None})
    code, payload = _call(api, "GET", "/profilez")
    assert code == 200 and payload == {"capturing": False, "last": None}
    code, payload = _call(api, "POST", "/profilez?seconds=0.5")
    assert code == 200 and payload["ok"] and calls == [0.5]
    # default window when the query is absent
    code, payload = _call(api, "POST", "/profilez")
    assert code == 200 and calls == [0.5, 2.0]
    assert _call(api, "POST", "/profilez?seconds=99")[0] == 400
    assert _call(api, "POST", "/profilez?seconds=5")[0] == 409
    assert _call(api, "POST", "/profilez?seconds=abc")[0] == 400

    bare = ManagementApi(status_fn=lambda: {}, models_dir=str(tmp_path),
                         logs_dir=str(tmp_path))
    assert _call(bare, "GET", "/profilez")[0] == 404
    assert _call(bare, "POST", "/profilez?seconds=1")[0] == 404


def test_profile_capture_real(tmp_path):
    """utils.profiling.capture writes a real XPlane trace of live device
    work (CPU backend here) and is single-flight."""
    import threading

    import jax.numpy as jnp
    import numpy as np

    from zero_latency_yolo_tpu.utils import profiling

    assert "error" in profiling.capture(0.0, str(tmp_path))  # below min_s
    assert "error" in profiling.capture(99.0, str(tmp_path))  # above max_s

    started = threading.Event()

    def busy():
        started.set()
        for _ in range(20):
            np.asarray(jnp.arange(512.0).sum())

    t = threading.Thread(target=busy)
    t.start()
    started.wait()
    out = profiling.capture(0.3, str(tmp_path))
    t.join()
    assert out.get("ok"), out
    assert out["files"], "capture produced no trace files"
    status = profiling.capture_status()
    assert status["capturing"] is False
    assert status["last"]["dir"] == out["dir"]


def test_post_auth_token(tmp_path):
    """network.web_auth_token gates every POST route with a constant-time
    bearer compare; GET telemetry stays open (scope those with
    web_bind_address). Empty token (default) keeps the open plane."""
    models = tmp_path / "models"
    models.mkdir()
    api = ManagementApi(status_fn=lambda: {"clients": 1},
                        models_dir=str(models), logs_dir=str(tmp_path),
                        auth_token="s3cret-token")
    # GETs open regardless of the token
    assert _call(api, "GET", "/statusz")[0] == 200
    assert _call(api, "GET", "/api/models")[0] == 200
    # POSTs: missing / wrong token -> 401, nothing written
    code, payload = _call(api, "POST", "/api/models/upload?name=new.npz",
                          b"weights")
    assert code == 401 and "web_auth_token" in payload["error"]
    code, _ = asyncio.run(api.handle(
        "POST", "/api/models/upload?name=new.npz", b"weights", auth="wrong"))
    assert code == 401
    assert not (models / "new.npz").exists()
    # Right token -> normal route behavior
    code, _ = asyncio.run(api.handle(
        "POST", "/api/models/upload?name=new.npz", b"weights",
        auth="s3cret-token"))
    assert code == 200
    assert (models / "new.npz").read_bytes() == b"weights"
    # /profilez POST is gated too (404-when-unwired must not leak past auth)
    assert asyncio.run(api.handle("POST", "/profilez", b""))[0] == 401
    # Default-empty token: open plane (reference parity)
    open_api = ManagementApi(status_fn=lambda: {}, models_dir=str(models),
                             logs_dir=str(tmp_path))
    code, _ = _call(open_api, "POST", "/api/models/upload?name=n2.npz", b"w")
    assert code == 200


def test_http_malformed_request_fuzz(tmp_path):
    """Management-plane HTTP fuzz (VERDICT r4 #9): the hand-rolled parser
    on raw asyncio streams must survive a malformed-request corpus — bad
    request lines, oversized/garbage headers, unparseable Content-Length,
    truncated bodies, binary noise, auth edge cases — with no unhandled
    exception reaching the event loop and the port still serving
    legitimate requests after every probe. An unauthenticated POST naming
    a huge Content-Length must be answered WITHOUT the server reading the
    body (pre-auth body-read gate — memory DoS)."""
    import socket
    import threading
    from zero_latency_yolo_tpu.config import ServerConfig
    from zero_latency_yolo_tpu.runtime.server import DetectionServer

    port, web_port = 27397, 27398
    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent.npz",
        "port": port, "web_port": web_port, "max_clients": 2,
        "network": {"web_auth_token": "fuzz-secret-token-1"},
        "tpu": {"frame_buckets": [[64, 64]], "batch_buckets": [1]},
    })
    server = DetectionServer(cfg)
    loop = asyncio.new_event_loop()
    t = threading.Thread(target=loop.run_forever, daemon=True)
    t.start()
    asyncio.run_coroutine_threadsafe(server.start(), loop).result(10)

    def probe(payload: bytes, expect_reply: bool = False) -> bytes:
        s = socket.create_connection(("127.0.0.1", web_port), timeout=5)
        try:
            s.sendall(payload)
            s.settimeout(5)
            try:
                return s.recv(65536)
            except socket.timeout:
                return b""
        finally:
            s.close()

    def alive() -> bool:
        data = probe(b"GET /statusz HTTP/1.1\r\nHost: x\r\n\r\n")
        return data.startswith(b"HTTP/1.1 200")

    rng_corpus = [
        b"",                                     # connect-and-close
        b"\r\n\r\n",
        b"GARBAGE\r\n\r\n",
        b"GET\r\n\r\n",                          # no path
        b"\x00\xff\xfe\x01" * 64 + b"\r\n\r\n",  # binary noise
        b"GET " + b"/" + b"A" * 70000 + b" HTTP/1.1\r\n\r\n",  # >64 KiB line
        b"GET /statusz HTTP/1.1\r\n" + b"X: y\r\n" * 100 + b"\r\n",  # >64 hdrs
        b"POST /api/models/upload HTTP/1.1\r\nContent-Length: abc\r\n\r\n",
        b"POST /api/models/upload HTTP/1.1\r\nContent-Length: -5\r\n\r\n",
        b"POST /api/models/upload HTTP/1.1\r\nContent-Length: 10\r\n\r\nab",
        b"GET /%ff%fe\xc3\x28 HTTP/1.1\r\n\r\n",  # bad UTF-8 path
        b"POST /profilez HTTP/1.1\r\nAuthorization: \xc3\x28\xff\r\n"
        b"Content-Length: 0\r\n\r\n",             # invalid-UTF-8 auth
        b"POST /profilez HTTP/1.1\r\nAuthorization: Bearer\r\n"
        b"Content-Length: 0\r\n\r\n",             # empty bearer
        b"OPTIONS * HTTP/1.1\r\n\r\n",
        b"GET /statusz HTTP/1.0\r\nContent-Length: 999999999999999999999"
        b"9999999999\r\n\r\n",                    # overflow-scale length
    ]
    try:
        assert alive()
        for i, payload in enumerate(rng_corpus):
            probe(payload)
            assert alive(), f"mgmt port dead after corpus item {i}"

        # Unauthenticated POST with a large Content-Length: the 401 must
        # arrive while the body was NEVER sent — the server answers from
        # headers alone instead of buffering attacker bytes.
        s = socket.create_connection(("127.0.0.1", web_port), timeout=5)
        try:
            s.sendall(b"POST /api/models/upload?name=x.npz HTTP/1.1\r\n"
                      b"Authorization: Bearer wrong-token-000\r\n"
                      b"Content-Length: 100000000\r\n\r\n")
            s.settimeout(5)
            data = s.recv(65536)
            assert data.startswith(b"HTTP/1.1 401"), data[:64]
        finally:
            s.close()
        assert alive()

        # The right token still works end-to-end after the fuzz battery.
        data = probe(b"POST /profilez?seconds=0.01 HTTP/1.1\r\n"
                     b"Authorization: Bearer fuzz-secret-token-1\r\n"
                     b"Content-Length: 0\r\n\r\n")
        assert data.startswith(b"HTTP/1.1"), data[:64]
        assert not data.startswith(b"HTTP/1.1 401"), data[:64]
    finally:
        asyncio.run_coroutine_threadsafe(server.stop(), loop).result(10)
        loop.call_soon_threadsafe(loop.stop)
        t.join(timeout=5)


def test_upload_name_rejects_trailing_newline(api, tmp_path):
    """re.match with a $ anchor matches before a trailing newline, so
    name=evil%0A used to pass the safe-name gate and write a file with an
    embedded newline (review r5) — fullmatch rejects it."""
    code, payload = _call(api, "POST", "/api/logs/upload?name=evil%0A",
                          b"data")
    assert code == 400, payload
    code, payload = _call(api, "POST",
                          "/api/models/upload?name=m%0A.npz", b"data")
    assert code == 400, payload
    # Sanity: the clean name still uploads.
    code, payload = _call(api, "POST", "/api/logs/upload?name=ok.log",
                          b"data")
    assert code == 200, payload


def test_model_extension_case_insensitive(api):
    """An uppercase artifact extension (best.PT) must upload and list —
    str.endswith is case-sensitive and used to both 400 the upload and
    hide the actively-served file from /api/models (review r5)."""
    code, payload = _call(api, "POST", "/api/models/upload?name=best.PT",
                          b"weights")
    assert code == 200, payload
    code, payload = _call(api, "GET", "/api/models")
    assert code == 200
    assert any(m["name"] == "best.PT" for m in payload["models"]), payload
