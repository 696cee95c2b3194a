"""Game-adapter unit tests: shaping, ids, queries, lifecycle races.

The adapter rebuilds the reference's detection-shaping duties
(cs16_game_adapter.cpp:36-145); until now these lines were covered only
incidentally through server e2e tests that never asserted on shaped box
sizes or id assignment.
"""

import numpy as np

from zero_latency_yolo_tpu.config import (CLASS_HEAD, CLASS_T, GameConfig)
from zero_latency_yolo_tpu.protocol import Detection
from zero_latency_yolo_tpu.runtime.adapters import GameAdapter, get_adapter
from zero_latency_yolo_tpu.runtime.tracker import MultiObjectTracker


def _det(x=0.5, y=0.5, w=0.2, h=0.3, conf=0.9, cls=CLASS_T, tid=0, ts=1000):
    return Detection(x=x, y=y, width=w, height=h, confidence=conf,
                     class_id=cls, track_id=tid, timestamp=ts)


def _adapter(tracking=True, head=0.7):
    return GameAdapter(GameConfig(head_size_factor=head),
                       enable_tracking=tracking)


def test_head_box_shaping_applied_once():
    a = _adapter(tracking=False)
    a.register_client(1)
    out = a.process_detections(1, [_det(cls=CLASS_HEAD, w=0.2, h=0.3),
                                   _det(cls=CLASS_T, w=0.2, h=0.3)])
    head = [d for d in out if d.class_id == CLASS_HEAD][0]
    body = [d for d in out if d.class_id == CLASS_T][0]
    assert np.isclose(head.width, 0.2 * 0.7)
    assert np.isclose(head.height, 0.3 * 0.7)
    assert body.width == 0.2 and body.height == 0.3  # only heads shrink


def test_fresh_id_fallback_without_tracking():
    a = _adapter(tracking=False)
    a.register_client(1)
    out = a.process_detections(1, [_det(), _det(x=0.2)])
    ids = [d.track_id for d in out]
    assert 0 not in ids and len(set(ids)) == 2
    out2 = a.process_detections(1, [_det()])
    assert out2[0].track_id not in ids  # reference: fresh per frame


def test_tracked_ids_stable_across_frames():
    a = _adapter(tracking=True)
    a.register_client(1)
    first = a.process_detections(1, [_det()], now_ms=0.0)
    for i in range(1, 5):
        out = a.process_detections(1, [_det(x=0.5 + 0.01 * i)],
                                   now_ms=50.0 * i)
    assert out[0].track_id == first[0].track_id


def test_evicted_client_frames_still_shaped_with_ids():
    """A frame in flight when its client is evicted must not ship raw:
    head shaping is adapter-wide and ids must not be 0 on the wire."""
    a = _adapter(tracking=True)
    out = a.process_detections(99, [_det(cls=CLASS_HEAD, w=0.2, h=0.3)])
    assert np.isclose(out[0].width, 0.2 * 0.7)
    assert out[0].track_id != 0


def test_reset_client_clears_tracks_keeps_registration():
    a = _adapter(tracking=True)
    a.register_client(1, screen_width=1920, screen_height=1080)
    a.process_detections(1, [_det()], now_ms=0.0)
    assert a.best_target(1) is not None
    a.reset_client(1)
    assert a.client_count() == 1
    assert a.best_target(1) is None  # clean table
    # And the replacement state kept the screen geometry.
    with a._lock:
        st = a._clients[1]
    assert (st.screen_width, st.screen_height) == (1920, 1080)


def test_best_target_uses_pixel_distance():
    """Reference metric is PIXEL distance to screen center
    (cs16_game_adapter.cpp:71-109): on 16:9, equal normalized offsets are
    very different pixel offsets."""
    a = _adapter(tracking=False)
    a.register_client(1, screen_width=1920, screen_height=1080)
    # A: 0.10 normalized in x = 192 px; B: 0.111 normalized in y = 120 px.
    dets = [_det(x=0.4, y=0.5), _det(x=0.5, y=0.389)]
    a.process_detections(1, dets)
    best = a.best_target(1)
    assert best is not None and np.isclose(best.y, 0.389)  # pixel-nearer


def test_predict_motion_extrapolates_track_velocity():
    a = _adapter(tracking=True)
    a.register_client(1)
    tid = None
    for i in range(6):  # constant +x motion at 0.2/s
        out = a.process_detections(1, [_det(x=0.3 + 0.02 * i)],
                                   now_ms=100.0 * i)
        tid = out[0].track_id
    near = a.predict_motion(1, tid, horizon_ms=1.0)
    far = a.predict_motion(1, tid, horizon_ms=200.0)
    assert near is not None and far is not None
    # The KF's filtered position lags the raw measurement, so assert on
    # the learned velocity's SIGN: a longer horizon extrapolates further +x.
    assert far[0] > near[0]
    assert a.predict_motion(1, 10_000) is None  # unknown track


def test_tracker_bank_bounded():
    """A jittery detector must not grow the bank without limit — the
    association cost runs on the event-loop result path."""
    t = MultiObjectTracker(max_age_ms=10_000.0, max_tracks=16)
    rng = np.random.RandomState(0)
    for frame in range(30):
        boxes = rng.uniform(0.05, 0.95, size=(8, 4)).astype(np.float32)
        boxes[:, 2:] = 0.01  # tiny: never overlaps -> never matches
        t.update(boxes, np.arange(8, dtype=np.int64),
                 np.full(8, 0.9, np.float32), now_ms=float(frame))
    assert len(t) <= 16


def test_unknown_adapter_name_falls_back_generic():
    a = get_adapter("doom", GameConfig())
    assert a.GAME_NAME == "generic"
