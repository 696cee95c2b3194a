"""Kalman tracker / association tests (reference intent: SURVEY §2.5)."""

import numpy as np

from zero_latency_yolo_tpu.runtime.tracker import (
    KalmanTracker, MultiObjectTracker, _iou_xywh,
)


def test_iou_pairwise():
    a = np.array([[0.5, 0.5, 0.2, 0.2]], np.float32)
    b = np.array([[0.5, 0.5, 0.2, 0.2], [0.9, 0.9, 0.1, 0.1]], np.float32)
    iou = _iou_xywh(a, b)
    assert abs(iou[0, 0] - 1.0) < 1e-5
    assert iou[0, 1] == 0.0


def test_single_kf_converges_to_constant_velocity():
    kf = KalmanTracker(np.array([0.1, 0.5, 0.05, 0.1]))
    dt = 1 / 60
    for i in range(1, 180):
        kf.predict(dt)
        x = 0.1 + 0.2 * i * dt  # moving right at 0.2 units/s
        kf.update(np.array([x, 0.5, 0.05, 0.1]))
    assert abs(kf.x[4] - 0.2) < 0.05  # vx estimated
    pred = kf.predict(dt)
    assert abs(pred[0] - (0.1 + 0.2 * 180 * dt)) < 0.02


def test_track_identity_through_motion():
    trk = MultiObjectTracker(max_age_ms=500)
    ids_per_frame = []
    t0 = 1000.0
    for i in range(10):
        boxes = np.array([
            [0.2 + 0.01 * i, 0.5, 0.06, 0.12],
            [0.7 - 0.01 * i, 0.3, 0.06, 0.12]], np.float32)
        out = trk.update(boxes, np.array([0, 1]), np.array([0.9, 0.8]),
                         now_ms=t0 + i * 16.7)
        ids_per_frame.append(sorted(d[3] for d in out if len(out) == 2 or True)[:2])
    first = ids_per_frame[0]
    assert all(ids[:2] == first for ids in ids_per_frame)
    assert len(set(first)) == 2


def test_class_gate_prevents_cross_class_match():
    trk = MultiObjectTracker()
    out1 = trk.update(np.array([[0.5, 0.5, 0.1, 0.1]], np.float32),
                      np.array([0]), np.array([0.9]), now_ms=0.0)
    out2 = trk.update(np.array([[0.5, 0.5, 0.1, 0.1]], np.float32),
                      np.array([2]), np.array([0.9]), now_ms=16.0)
    assert out1[0][3] != out2[0][3]  # same box, different class => new track


def test_coasting_for_confirmed_tracks():
    trk = MultiObjectTracker(max_age_ms=500, min_hits=3)
    box = np.array([[0.5, 0.5, 0.1, 0.1]], np.float32)
    for i in range(4):
        trk.update(box, np.array([0]), np.array([0.9]), now_ms=i * 16.0)
    # Miss a frame: confirmed track coasts at reduced confidence.
    out = trk.update(np.zeros((0, 4), np.float32), np.zeros(0, np.int64),
                     np.zeros(0, np.float32), now_ms=5 * 16.0)
    assert len(out) == 1
    assert out[0][1] < 0.9 and out[0][3] == 1


def test_expiry_after_max_age():
    trk = MultiObjectTracker(max_age_ms=100, min_hits=1)
    trk.update(np.array([[0.5, 0.5, 0.1, 0.1]], np.float32),
               np.array([0]), np.array([0.9]), now_ms=0.0)
    # Silent for > max_age/2 => dropped.
    out = trk.update(np.zeros((0, 4), np.float32), np.zeros(0, np.int64),
                     np.zeros(0, np.float32), now_ms=200.0)
    assert len(trk) == 0
    # A new detection then gets a fresh id.
    out = trk.update(np.array([[0.5, 0.5, 0.1, 0.1]], np.float32),
                     np.array([0]), np.array([0.9]), now_ms=210.0)
    assert out[0][3] == 2


def test_confidence_ema():
    trk = MultiObjectTracker()
    trk.update(np.array([[0.5, 0.5, 0.1, 0.1]], np.float32),
               np.array([0]), np.array([1.0]), now_ms=0.0)
    trk.update(np.array([[0.5, 0.5, 0.1, 0.1]], np.float32),
               np.array([0]), np.array([0.0]), now_ms=16.0)
    # EMA: 0.7*1.0 + 0.3*0.0 = 0.7
    assert abs(trk.meta[0].confidence - 0.7) < 1e-6


def test_continuous_track_id_stable_past_max_age():
    """A continuously-matched target must KEEP its track id past
    max_tracking_age_ms. (Deliberate deviation from the reference's
    absolute-age expiry, kalman_tracker.cpp:167-171, which recycled a live
    target's id every 500 ms — dead code there, id churn here.)"""
    import numpy as np
    from zero_latency_yolo_tpu.runtime.tracker import MultiObjectTracker
    trk = MultiObjectTracker(max_age_ms=100, min_hits=1)
    box = np.array([0.5, 0.5, 0.1, 0.2], np.float32)
    ids = set()
    # 40 matched updates spanning 8x max_age.
    for i in range(40):
        out = trk.update(box[None] + i * 0.001, np.array([0]),
                         np.array([0.9]), now_ms=i * 20.0)
        assert len(out) == 1
        ids.add(out[0][3])
    assert len(ids) == 1, f"id churned across continuous matches: {ids}"
