"""Pallas NMS suppression kernel vs XLA scan (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zero_latency_yolo_tpu.ops.nms import (
    _greedy_nms_mask, _iou_matrix_center, nms_reference, postprocess_batch,
)
from zero_latency_yolo_tpu.ops.nms_pallas import greedy_nms_mask_pallas


@pytest.mark.parametrize("seed,k", [(0, 64), (1, 128), (2, 256)])
def test_kernel_matches_xla_scan(seed, k):
    rng = np.random.default_rng(seed)
    b = 2
    boxes = rng.uniform(0, 416, (b, k, 4)).astype(np.float32)
    boxes[..., 2:] = rng.uniform(20, 200, (b, k, 2))
    classes = rng.integers(0, 4, (b, k))
    valid = rng.uniform(size=(b, k)) > 0.3
    iou = np.stack([np.asarray(_iou_matrix_center(jnp.asarray(x))) for x in boxes])
    same = classes[:, :, None] == classes[:, None, :]
    ref = np.stack([
        np.asarray(_greedy_nms_mask(jnp.asarray(iou[i]), jnp.asarray(same[i]),
                                    jnp.asarray(valid[i]), 0.45))
        for i in range(b)])
    got = np.asarray(greedy_nms_mask_pallas(
        jnp.asarray(iou), jnp.asarray(same), jnp.asarray(valid), 0.45,
        interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_postprocess_pallas_impl_matches_oracle():
    rng = np.random.default_rng(3)
    a, nc = 400, 4
    boxes = np.stack([rng.uniform(0, 416, a), rng.uniform(0, 416, a),
                      rng.uniform(8, 150, a), rng.uniform(8, 150, a)], axis=-1)
    probs = rng.uniform(0, 1, (a, nc)) ** 3
    pred = np.concatenate([boxes, probs], -1).astype(np.float32)[None]
    weights = np.array([1.0, 1.0, 1.2, 0.8], np.float32)
    out = postprocess_batch(
        jnp.asarray(pred), jnp.asarray(weights), jnp.float32(0.5),
        jnp.float32(0.45), jnp.asarray([1.0], jnp.float32),
        jnp.asarray([[0.0, 0.0]], jnp.float32),
        jnp.asarray([[416.0, 416.0]], jnp.float32),
        256, "pallas_interpret")
    ref = nms_reference(pred[0], weights, 0.5, 0.45)
    n = int(np.asarray(out["count"])[0])
    assert n == min(len(ref), 32)
    for i in range(n):
        assert int(np.asarray(out["classes"])[0, i]) == ref[i][2]
        assert float(np.asarray(out["scores"])[0, i]) == pytest.approx(
            ref[i][1], abs=1e-5)
