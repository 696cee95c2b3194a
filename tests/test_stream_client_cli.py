"""Live streaming client (scripts/stream_client.py): media source ->
StreamDriver keyframe/ROI encode -> real loopback server -> results, as a
separate process speaking the wire protocol."""

import asyncio
import json
import os
import subprocess
import sys
import threading

import numpy as np
import pytest

from zero_latency_yolo_tpu.config import ServerConfig
from zero_latency_yolo_tpu.runtime.server import DetectionServer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "stream_client.py")
PORT = 27413


@pytest.fixture(scope="module")
def server():
    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent/model.npz",  # simulation mode
        "port": PORT, "web_port": 0, "max_clients": 2,
        "tpu": {"batch_window_ms": 1.0, "frame_buckets": [[64, 96]],
                "batch_buckets": [1, 2]},
    })
    srv = DetectionServer(cfg)
    loop = asyncio.new_event_loop()
    thread = threading.Thread(target=loop.run_forever, daemon=True)
    thread.start()
    asyncio.run_coroutine_threadsafe(srv.start(), loop).result(10)
    srv.device_cache.warm()
    yield srv
    asyncio.run_coroutine_threadsafe(srv.stop(), loop).result(10)
    loop.call_soon_threadsafe(loop.stop)
    thread.join(timeout=5)


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    import cv2
    path = tmp_path_factory.mktemp("media") / "clip.avi"
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"),
                         10, (96, 64))
    assert vw.isOpened()
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    for i in range(8):
        frame = base.copy()
        # A moving patch: realistic diff-ROI updates between keyframes.
        frame[10:26, 8 * i:8 * i + 16] = 255
        vw.write(frame)
    vw.release()
    return str(path)


def test_stream_video_to_server(server, clip):
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, SCRIPT, clip, "--server", f"127.0.0.1:{PORT}",
         "--fps", "60", "--loop", "--duration", "3", "--print-dets",
         "--keyframe-interval", "4"],
        capture_output=True, text=True, env=env, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(line) for line in r.stdout.splitlines() if line]
    stats = lines[-1]
    assert stats["frames_pushed"] > 0
    assert stats["keyframes"] >= 1 and stats["roi_updates"] >= 1
    assert stats["results"] > 0, (r.stderr[-1000:], stats)
    assert stats["e2e_p99_ms"] > 0
    # --print-dets rows precede the stats line.
    det_rows = [l for l in lines[:-1] if "frame_id" in l]
    assert det_rows and all("detections" in d for d in det_rows)
    # The streamed session is gone after the client's DISCONNECT.
    assert server.client_count() == 0


def test_stream_rejects_bad_args(clip):
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run([sys.executable, SCRIPT, clip, "--server", "nope"],
                       capture_output=True, text=True, env=env, timeout=60)
    assert r.returncode != 0 and "HOST:PORT" in r.stderr
