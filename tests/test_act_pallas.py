"""Flat full-lane bias+SiLU Pallas epilogue (ops/act_pallas.py): exactness
vs the stock XLA tails, in interpreter mode on CPU (the same code path a
Pallas-capable TPU host compiles natively; see tpu.act)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zero_latency_yolo_tpu.ops.act_pallas import (
    fused_bias_silu, make_flat_act_conv)


@pytest.mark.parametrize("shape,c", [((2, 8, 8, 16), 16), ((1, 4, 4, 64), 64),
                                     ((2, 2, 2, 128), 128),
                                     ((1, 2, 2, 256), 256)])  # >128: fallback
def test_fused_bias_silu_matches_xla(shape, c):
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    got = fused_bias_silu(y, b, interpret=True)
    want = jax.nn.silu(y + b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_flat_act_conv_full_model_exact():
    """Full pico forward with the Pallas epilogue conv_fn must match the
    stock forward bit-for-bit in f32 (same conv, same math, different
    lane tiling)."""
    from zero_latency_yolo_tpu.models import get_spec, init_params
    from zero_latency_yolo_tpu.models.yolov8 import forward_decoded
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    x = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32))
    want = forward_decoded(params, spec, x)
    got = forward_decoded(params, spec, x,
                          conv_fn=make_flat_act_conv(interpret=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_engine_act_flag_builds(tmp_path):
    """tpu.act="pallas_interpret" threads through the engine step builder."""
    from zero_latency_yolo_tpu.config import ServerConfig
    from zero_latency_yolo_tpu.models import get_spec, init_params
    from zero_latency_yolo_tpu.runtime.engine import (
        InferenceEngine, InferenceRequest)
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent.npz",
        "detection": {"model_width": 64, "model_height": 64},
        "tpu": {"variant": "yolov8p", "num_classes": 4, "dtype": "float32",
                "batch_buckets": [2], "frame_buckets": [[96, 96]],
                "pre_nms_topk": 64, "act": "pallas_interpret"},
    })
    eng = InferenceEngine(cfg, params=params)
    reqs = [InferenceRequest(client_id=i + 1, frame_id=i, timestamp=0,
                             width=96, height=64,
                             data=np.random.default_rng(i).integers(
                                 0, 256, (64, 96, 3), dtype=np.uint8))
            for i in range(2)]
    res = eng.infer_batch(reqs)
    assert len(res) == 2
    # Matches the stock engine on identical inputs.
    cfg2 = ServerConfig.from_dict({
        "model_path": "/nonexistent.npz",
        "detection": {"model_width": 64, "model_height": 64},
        "tpu": {"variant": "yolov8p", "num_classes": 4, "dtype": "float32",
                "batch_buckets": [2], "frame_buckets": [[96, 96]],
                "pre_nms_topk": 64},
    })
    eng2 = InferenceEngine(cfg2, params=params)
    res2 = eng2.infer_batch([InferenceRequest(
        client_id=i + 1, frame_id=i, timestamp=0, width=96, height=64,
        data=np.random.default_rng(i).integers(0, 256, (64, 96, 3),
                                               dtype=np.uint8))
        for i in range(2)])
    for a, b in zip(res, res2):
        assert len(a.detections) == len(b.detections)
        for da, db in zip(a.detections, b.detections):
            assert da.x == pytest.approx(db.x, abs=1e-5)
