"""Dataset capture (runtime/capture.py): sampled served keyframes +
detections recorded as a YOLO-convention directory.

Unit level: pairing, sampling, confidence gate, bounds, resume. Loop level:
the captured directory loads through train/data.py (the fine-tune input) —
the serve -> fine-tune flywheel actually round-trips.
"""

import os
import time

import numpy as np
import pytest

from zero_latency_yolo_tpu.config import ServerConfig
from zero_latency_yolo_tpu.protocol import Detection
from zero_latency_yolo_tpu.runtime.capture import DatasetCapture


def _wait_written(cap, n, timeout=5.0):
    t_end = time.time() + timeout
    while time.time() < t_end:
        if cap.written >= n and cap._queue.empty():
            return
        time.sleep(0.01)
    raise AssertionError(
        f"capture writer stalled: written={cap.written}, wanted {n}")


def _frame(seed=0, h=48, w=64):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8)


def test_capture_pairs_frame_with_result(tmp_path):
    cap = DatasetCapture(str(tmp_path), sample_every=1, max_images=10)
    try:
        cap.offer_keyframe(1, 7, _frame(1))
        dets = [Detection(x=0.5, y=0.25, width=0.2, height=0.1,
                          confidence=0.9, class_id=2),
                Detection(x=0.1, y=0.1, width=0.05, height=0.05,
                          confidence=0.1, class_id=0)]  # below gate
        cap.on_result(1, 7, dets)
        _wait_written(cap, 1)
        imgs = os.listdir(tmp_path / "images")
        lbls = os.listdir(tmp_path / "labels")
        assert len(imgs) == 1 and len(lbls) == 1
        assert imgs[0].endswith(".jpg") and not imgs[0].endswith(".jpg.tmp")
        text = (tmp_path / "labels" / lbls[0]).read_text().strip()
        # min_confidence=0.25 drops the second detection.
        assert text.splitlines() == ["2 0.500000 0.250000 0.200000 0.100000"]
    finally:
        cap.stop()


def test_capture_zero_detections_writes_background(tmp_path):
    cap = DatasetCapture(str(tmp_path), sample_every=1, max_images=10)
    try:
        cap.offer_keyframe(3, 1, _frame(2))
        cap.on_result(3, 1, [])
        _wait_written(cap, 1)
        lbl = os.listdir(tmp_path / "labels")[0]
        assert (tmp_path / "labels" / lbl).read_text() == ""
    finally:
        cap.stop()


def test_capture_sampling_and_unmatched_results(tmp_path):
    cap = DatasetCapture(str(tmp_path), sample_every=3, max_images=100)
    try:
        for fid in range(6):
            cap.offer_keyframe(1, fid, _frame(fid))
            cap.on_result(1, fid, [Detection(x=0.5, y=0.5, width=0.1,
                                             height=0.1, confidence=0.8)])
        # Results for unsampled frames are no-ops (frames 1,2,4,5).
        _wait_written(cap, 2)
        assert cap.written == 2
        assert len(os.listdir(tmp_path / "images")) == 2
    finally:
        cap.stop()


def test_capture_max_images_and_resume(tmp_path):
    cap = DatasetCapture(str(tmp_path), sample_every=1, max_images=2)
    try:
        for fid in range(5):
            cap.offer_keyframe(1, fid, _frame(fid))
            cap.on_result(1, fid, [])
        _wait_written(cap, 2)
        time.sleep(0.05)
        assert cap.written == 2
        assert len(os.listdir(tmp_path / "images")) == 2
    finally:
        cap.stop()
    # A restart counts the existing images: the directory bound holds
    # across processes, so it refuses to write more.
    cap2 = DatasetCapture(str(tmp_path), sample_every=1, max_images=2)
    try:
        assert cap2.written == 2
        cap2.offer_keyframe(1, 99, _frame(9))
        cap2.on_result(1, 99, [])
        time.sleep(0.2)
        assert len(os.listdir(tmp_path / "images")) == 2
    finally:
        cap2.stop()


def test_capture_pending_bound_and_eviction(tmp_path):
    from zero_latency_yolo_tpu.runtime.capture import PENDING_CAP
    cap = DatasetCapture(str(tmp_path), sample_every=1, max_images=1000)
    try:
        for fid in range(PENDING_CAP + 8):
            cap.offer_keyframe(1, fid, _frame(0))
        assert len(cap._pending) == PENDING_CAP
        assert cap.pending_evicted == 8
        cap.evict_client(1)
        assert len(cap._pending) == 0
        # An evicted client's late result is a no-op.
        cap.on_result(1, PENDING_CAP + 5, [])
        time.sleep(0.1)
        assert cap.written == 0
    finally:
        cap.stop()


def test_capture_pending_bytes_bound(tmp_path, monkeypatch):
    """The pending stash is bounded by BYTES, not just count: client-chosen
    wire geometry (u16 w/h) can make one frame many MB."""
    import zero_latency_yolo_tpu.runtime.capture as capture_mod
    big = np.zeros((200, 200, 3), np.uint8)  # 120 KB each
    monkeypatch.setattr(capture_mod, "PENDING_BYTES_CAP", 4 * big.nbytes)
    cap = DatasetCapture(str(tmp_path), sample_every=1, max_images=1000)
    try:
        for fid in range(10):
            cap.offer_keyframe(1, fid, big)
        assert len(cap._pending) == 4  # bytes cap binds before PENDING_CAP
        assert cap._pending_bytes <= 4 * big.nbytes
        assert cap.pending_evicted == 6
        st = cap.status()
        assert st["pending_bytes"] == cap._pending_bytes
        # Re-offering an already-pending frame must not double-count bytes.
        cap.offer_keyframe(1, 9, big)
        assert cap._pending_bytes <= 4 * big.nbytes
        # Pairing a result releases its bytes.
        cap.on_result(1, 9, [])
        assert cap._pending_bytes <= 3 * big.nbytes
        cap.evict_client(1)
        assert cap._pending_bytes == 0
    finally:
        cap.stop()


def test_capture_label_clamping(tmp_path):
    cap = DatasetCapture(str(tmp_path), sample_every=1, max_images=10,
                         min_confidence=0.0)
    try:
        cap.offer_keyframe(1, 1, _frame(3))
        cap.on_result(1, 1, [
            Detection(x=1.02, y=-0.01, width=0.3, height=0.2, confidence=0.9,
                      class_id=1),
            Detection(x=0.5, y=0.5, width=0.0, height=0.2, confidence=0.9,
                      class_id=1),  # degenerate: dropped
        ])
        _wait_written(cap, 1)
        lbl = os.listdir(tmp_path / "labels")[0]
        lines = (tmp_path / "labels" / lbl).read_text().splitlines()
        assert lines == ["1 1.000000 0.000000 0.300000 0.200000"]
    finally:
        cap.stop()


def test_captured_dir_loads_through_train_data(tmp_path):
    """The flywheel round-trip: what capture writes, the fine-tune loader
    reads — geometry validated, labels parsed, classes in range."""
    cap = DatasetCapture(str(tmp_path), sample_every=1, max_images=10)
    try:
        for fid in range(3):
            cap.offer_keyframe(1, fid, _frame(fid, h=64, w=96))
            cap.on_result(1, fid, [
                Detection(x=0.5, y=0.5, width=0.25, height=0.25,
                          confidence=0.9, class_id=fid % 4)])
        _wait_written(cap, 3)
    finally:
        cap.stop()
    from zero_latency_yolo_tpu.train.data import load_yolo_dir
    images, targets = load_yolo_dir(str(tmp_path), 64, num_classes=4)
    assert images.shape == (3, 64, 64, 3)
    assert targets.shape[0] == 3
    # Each image carries exactly one valid target row.
    valid = (targets[..., 0] >= 0).sum(axis=1)
    assert list(valid) == [1, 1, 1]


def test_capture_e2e_loopback(tmp_path):
    """Full path: SimClient keyframes -> decode worker stash -> engine
    (simulation) -> result pairing -> writer -> YOLO dir on disk."""
    import asyncio
    import threading

    from zero_latency_yolo_tpu.runtime.server import DetectionServer
    from zero_latency_yolo_tpu.runtime.simulator import (
        SimClient, synthetic_frame,
    )

    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent/model.npz",  # simulation mode
        "port": 27411, "web_port": 0, "max_clients": 2,
        "analytics": {"capture_dir": str(tmp_path),
                      "capture_sample_every": 1,
                      "capture_min_confidence": 0.0},
        "tpu": {"batch_window_ms": 1.0, "frame_buckets": [[64, 96]],
                "batch_buckets": [1, 2]},
    })
    server = DetectionServer(cfg)
    loop = asyncio.new_event_loop()
    thread = threading.Thread(target=loop.run_forever, daemon=True)
    thread.start()
    asyncio.run_coroutine_threadsafe(server.start(), loop).result(10)
    c = SimClient(("127.0.0.1", server.port), screen_width=96,
                  screen_height=64)
    try:
        c.connect()
        c.start_receiver()
        for seed in range(3):
            c.send_raw_frame(synthetic_frame(96, 64, seed=seed))
        assert c.wait_results(3, timeout=10.0)
        _wait_written(server._capture, 1, timeout=10.0)
        st = server.status()["capture"]
        assert st["written"] >= 1 and st["dir"] == str(tmp_path)
    finally:
        c.stop()
        asyncio.run_coroutine_threadsafe(server.stop(), loop).result(10)
        loop.call_soon_threadsafe(loop.stop)
        thread.join(timeout=5)
    from zero_latency_yolo_tpu.train.data import load_yolo_dir
    images, _targets = load_yolo_dir(str(tmp_path), 64)
    assert images.shape[0] >= 1


def test_capture_config_validation():
    with pytest.raises(ValueError):
        ServerConfig.from_dict({"analytics": {"capture_dir": "/tmp/x",
                                              "capture_sample_every": 0}})
    with pytest.raises(ValueError):
        ServerConfig.from_dict({"analytics": {"capture_dir": "/tmp/x",
                                              "capture_min_confidence": 1.5}})
    # Gates only apply when capture is enabled (old configs stay valid).
    ServerConfig.from_dict({"analytics": {"capture_sample_every": 0}})
