"""AP evaluation tests with controlled predictions."""

import numpy as np
import pytest

from zero_latency_yolo_tpu.train.eval import (
    average_precision, evaluate, match_detections,
)


def test_ap_perfect():
    scored = [(0.9, True), (0.8, True)]
    assert average_precision(scored, n_gt=2) == pytest.approx(1.0)


def test_ap_half():
    # one TP then one FP, 2 gt: recall tops at 0.5, precision 1.0 up to it
    scored = [(0.9, True), (0.8, False)]
    assert average_precision(scored, n_gt=2) == pytest.approx(0.5)


def test_ap_ordering_matters():
    # FP ranked above TP drags precision at the recall point
    scored = [(0.9, False), (0.8, True)]
    assert average_precision(scored, n_gt=1) == pytest.approx(0.5)


def test_match_greedy_one_gt_per_detection():
    gt = np.array([[0.5, 0.5, 0.2, 0.2]])
    preds = np.array([[0.5, 0.5, 0.2, 0.2], [0.51, 0.5, 0.2, 0.2]])
    scores = np.array([0.9, 0.8])
    res = match_detections(preds, scores, gt)
    assert res[0] == (0.9, True)
    assert res[1][1] is False  # second overlapping det is a duplicate -> FP


def test_evaluate_end_to_end_with_oracle_model():
    """Feed evaluate() a fake 'model' by monkeypatching forward_decoded to
    emit exactly the GT boxes -> mAP must be 1.0."""
    import zero_latency_yolo_tpu.train.eval as ev
    from zero_latency_yolo_tpu.models import get_spec

    spec = get_spec("yolov8p", 4)
    s = 64
    n = 4
    rng = np.random.default_rng(0)
    targets = np.full((n, 3, 5), -1.0, np.float32)
    for i in range(n):
        targets[i, 0] = (i % 4, 0.4, 0.5, 0.3, 0.3)
        targets[i, 1] = ((i + 1) % 4, 0.75, 0.3, 0.2, 0.2)
    images = rng.uniform(0, 1, (n, s, s, 3)).astype(np.float32)

    a = spec.num_anchors(s, s)

    def fake_forward(params, spec_, x, dtype=None):
        import jax.numpy as jnp
        b = x.shape[0]
        pred = np.zeros((b, a, 4 + 4), np.float32)
        for bi in range(min(b, n)):
            for m, t in enumerate(targets[bi]):
                if t[0] < 0:
                    continue
                pred[bi, m, :4] = t[1:] * s  # model-input pixels
                pred[bi, m, 4 + int(t[0])] = 0.9
        return jnp.asarray(pred)

    orig = ev.forward_decoded
    ev.forward_decoded = fake_forward
    try:
        # batch == n so the fake model's in-batch index equals the image
        # index (it has no other way to know which image it sees).
        metrics = ev.evaluate(None, spec, images, targets, batch=n)
    finally:
        ev.forward_decoded = orig
    assert metrics["mAP"] == pytest.approx(1.0, abs=1e-6), metrics
    # Exact boxes match at every IoU rung of the COCO ladder.
    assert metrics["mAP50_95"] == pytest.approx(1.0, abs=1e-6), metrics
    assert metrics["recall"] == pytest.approx(1.0)
    assert metrics["num_gt"] == 8


def test_coco_ladder_penalizes_loose_boxes():
    """A detection that overlaps its GT at IoU ~0.54 is a hit at 0.5 but a
    miss at the higher rungs: mAP50 stays 1.0 while mAP50_95 drops — the
    COCO metric must actually distinguish localization quality."""
    import zero_latency_yolo_tpu.train.eval as ev
    from zero_latency_yolo_tpu.models import get_spec

    spec = get_spec("yolov8p", 4)
    s, n = 64, 2
    targets = np.full((n, 1, 5), -1.0, np.float32)
    targets[:, 0] = (0, 0.5, 0.5, 0.4, 0.4)
    images = np.zeros((n, s, s, 3), np.float32)
    a = spec.num_anchors(s, s)

    def fake_forward(params, spec_, x, dtype=None):
        import jax.numpy as jnp
        b = x.shape[0]
        pred = np.zeros((b, a, 4 + 4), np.float32)
        # Shifted by 0.12 of the image on one axis: inter 0.28*0.4,
        # union 0.32 - 0.112 -> IoU ~ 0.538 (clear of both rung edges).
        pred[:, 0, :4] = np.array([0.62, 0.5, 0.4, 0.4]) * s
        pred[:, 0, 4] = 0.9
        return jnp.asarray(pred)

    orig = ev.forward_decoded
    ev.forward_decoded = fake_forward
    try:
        metrics = ev.evaluate(None, spec, images, targets, batch=n)
    finally:
        ev.forward_decoded = orig
    assert metrics["mAP"] == pytest.approx(1.0, abs=1e-6), metrics
    # Hits only the 0.50 rung of 10 -> mAP50_95 = 0.1.
    assert metrics["mAP50_95"] == pytest.approx(0.1, abs=1e-6), metrics
