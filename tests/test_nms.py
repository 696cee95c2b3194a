"""Fused postprocess vs NumPy greedy-NMS oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from zero_latency_yolo_tpu.ops import nms_reference, postprocess_batch
from zero_latency_yolo_tpu.ops.nms import MAX_DET


def _rand_pred(rng, a=500, nc=4, size=416.0):
    boxes = np.stack([
        rng.uniform(0, size, a), rng.uniform(0, size, a),
        rng.uniform(8, size / 3, a), rng.uniform(8, size / 3, a)], axis=-1)
    probs = rng.uniform(0, 1, (a, nc)) ** 3  # mostly low scores
    return np.concatenate([boxes, probs], axis=-1).astype(np.float32)


def _run_device(pred, weights, conf, iou, scale=1.0, pad=(0.0, 0.0),
                src_wh=(416.0, 416.0)):
    b = pred[None]
    out = postprocess_batch(
        jnp.asarray(b), jnp.asarray(weights, jnp.float32),
        jnp.float32(conf), jnp.float32(iou),
        jnp.asarray([scale], jnp.float32),
        jnp.asarray([pad], jnp.float32),
        jnp.asarray([src_wh], jnp.float32))
    return {k: np.asarray(v)[0] for k, v in out.items()}


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_matches_numpy_oracle(seed):
    rng = np.random.default_rng(seed)
    pred = _rand_pred(rng)
    weights = np.array([1.0, 1.0, 1.2, 0.8], np.float32)
    conf, iou = 0.5, 0.45
    ref = nms_reference(pred, weights, conf, iou)
    got = _run_device(pred, weights, conf, iou)
    n = int(got["count"])
    assert n == min(len(ref), MAX_DET)
    for i in range(n):
        ref_box, ref_score, ref_cls = ref[i]
        assert got["classes"][i] == ref_cls
        assert got["scores"][i] == pytest.approx(ref_score, abs=1e-5)
        np.testing.assert_allclose(got["boxes"][i] * 416.0, ref_box, atol=1e-2)


def test_class_weights_change_threshold_outcome():
    # One box at prob 0.45 for class 2 (head, weight 1.2 -> 0.54 passes).
    pred = np.zeros((10, 8), np.float32)
    pred[0, :4] = [100, 100, 50, 50]
    pred[0, 4 + 2] = 0.45
    unweighted = _run_device(pred, np.ones(4, np.float32), 0.5, 0.45)
    weighted = _run_device(pred, np.array([1, 1, 1.2, 0.8], np.float32), 0.5, 0.45)
    assert int(unweighted["count"]) == 0
    assert int(weighted["count"]) == 1
    assert weighted["classes"][0] == 2


def test_same_class_suppression_and_cross_class_survival():
    pred = np.zeros((4, 8), np.float32)
    # Two heavily overlapping class-0 boxes; one identical class-1 box.
    pred[0] = [100, 100, 40, 40, 0.9, 0, 0, 0]
    pred[1] = [102, 102, 40, 40, 0.8, 0, 0, 0]
    pred[2] = [100, 100, 40, 40, 0, 0.85, 0, 0]
    got = _run_device(pred, np.ones(4, np.float32), 0.5, 0.45)
    assert int(got["count"]) == 2
    assert set(got["classes"][:2].tolist()) == {0, 1}
    assert got["scores"][0] == pytest.approx(0.9, abs=1e-6)


def test_unletterbox_maps_back_to_source_coords():
    # 800x600 source letterboxed into 416: scale=416/800=0.52, pad_y=(416-312)/2=52.
    scale = 416.0 / 800.0
    pad_y = (416 - round(600 * scale)) / 2.0
    pred = np.zeros((1, 8), np.float32)
    # Box centered at source (400, 300) => model coords (400*s, 300*s + pad_y).
    pred[0] = [400 * scale, 300 * scale + pad_y, 80 * scale, 60 * scale,
               0.9, 0, 0, 0]
    got = _run_device(pred, np.ones(4, np.float32), 0.5, 0.45,
                      scale=scale, pad=(0.0, pad_y), src_wh=(800.0, 600.0))
    assert int(got["count"]) == 1
    np.testing.assert_allclose(got["boxes"][0],
                               [0.5, 0.5, 0.1, 0.1], atol=1e-5)


def test_empty_when_nothing_passes():
    pred = np.zeros((100, 8), np.float32)
    got = _run_device(pred, np.ones(4, np.float32), 0.5, 0.45)
    assert int(got["count"]) == 0
    assert got["scores"].sum() == 0


def test_perlevel_selection_matches_concat():
    """postprocess_batch_levels (tpu.select="perlevel") keeps the same set
    as the global top-k over the concatenated anchors: the global top-k of a
    union is contained in the union of per-level top-ks."""
    from zero_latency_yolo_tpu.ops.nms import postprocess_batch_levels

    rng = np.random.default_rng(11)
    parts = [_rand_pred(rng, a=a) for a in (64, 16, 4)]
    boxes_l = [jnp.asarray(p[None, :, :4]) for p in parts]
    probs_l = [jnp.asarray(p[None, :, 4:]) for p in parts]
    weights = np.array([1.0, 1.0, 1.2, 0.8], np.float32)
    base = _run_device(np.concatenate(parts, axis=0), weights, 0.4, 0.45)
    out = postprocess_batch_levels(
        boxes_l, probs_l, jnp.asarray(weights),
        jnp.float32(0.4), jnp.float32(0.45),
        jnp.asarray([1.0], jnp.float32),
        jnp.asarray([(0.0, 0.0)], jnp.float32),
        jnp.asarray([(416.0, 416.0)], jnp.float32))
    got = {k: np.asarray(v)[0] for k, v in out.items()}
    n = int(base["count"])
    assert int(got["count"]) == n
    np.testing.assert_allclose(got["scores"][:n], base["scores"][:n],
                               atol=1e-6)
    np.testing.assert_allclose(got["boxes"][:n], base["boxes"][:n], atol=1e-5)
    np.testing.assert_array_equal(got["classes"][:n], base["classes"][:n])


def test_cap_at_max_det():
    # 100 well-separated confident boxes -> clipped to MAX_DET.
    rng = np.random.default_rng(7)
    pred = np.zeros((100, 8), np.float32)
    for i in range(100):
        pred[i, :4] = [(i % 10) * 40 + 20, (i // 10) * 40 + 20, 10, 10]
        pred[i, 4] = 0.6 + 0.003 * i
    got = _run_device(pred, np.ones(4, np.float32), 0.5, 0.45)
    assert int(got["count"]) == MAX_DET
    # Highest scores kept, descending.
    assert np.all(np.diff(got["scores"]) <= 1e-6)
    assert got["scores"][0] == pytest.approx(0.6 + 0.003 * 99, abs=1e-5)
