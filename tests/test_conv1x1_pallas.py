"""Fused 1x1-conv-as-matmul + bias + SiLU Pallas kernel
(ops/conv1x1_pallas.py): exactness vs the stock XLA conv path, in
interpreter mode on CPU (the same code path a Pallas-capable TPU host
compiles natively; see tpu.conv1x1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zero_latency_yolo_tpu.ops.conv1x1_pallas import (
    conv1x1_bias_act, make_mm1x1_conv)


@pytest.mark.parametrize("shape,cout,act", [
    ((2, 8, 8, 16), 32, True),     # small channels, silu
    ((1, 8, 8, 64), 128, True),    # lane-exact cout
    ((2, 4, 4, 128), 256, True),   # multi-block N
    ((1, 8, 8, 32), 64, False),    # bias-only epilogue (head tips)
])
def test_conv1x1_kernel_matches_xla(shape, cout, act):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(shape[-1], cout)).astype(np.float32)
                    * 0.1)
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    got = conv1x1_bias_act(x, w, b, act=act, interpret=True)
    assert got is not None
    want = jnp.einsum("bhwk,kn->bhwn", x, w) + b
    if act:
        want = jax.nn.silu(want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_conv1x1_ineligible_shapes_fall_back():
    """Odd spatial sizes / tiny channel counts return None (the conv_fn
    wrapper then uses the stock conv)."""
    x = jnp.zeros((1, 13, 13, 16), jnp.float32)   # m=169: no pow2 block
    w = jnp.zeros((16, 32), jnp.float32)
    b = jnp.zeros((32,), jnp.float32)
    assert conv1x1_bias_act(x, w, b, interpret=True) is None
    x2 = jnp.zeros((1, 8, 8, 16), jnp.float32)
    w2 = jnp.zeros((16, 4), jnp.float32)          # cout=4 < 8 sublanes
    assert conv1x1_bias_act(x2, w2, jnp.zeros((4,)), interpret=True) is None


def test_mm1x1_conv_full_model_close():
    """Full pico forward with the fused-matmul conv_fn must match the stock
    forward (same math; the contraction runs as dot instead of conv, so
    allow float addition-order noise)."""
    from zero_latency_yolo_tpu.models import get_spec, init_params
    from zero_latency_yolo_tpu.models.yolov8 import forward_decoded
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    x = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32))
    want = forward_decoded(params, spec, x)
    got = forward_decoded(params, spec, x,
                          conv_fn=make_mm1x1_conv(interpret=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_mm1x1_conv_covers_c2f_split_form():
    """The C2f split layout slices 1x1 weights channel-wise; the fused
    kernel must produce the same forward there too."""
    from zero_latency_yolo_tpu.models import get_spec, init_params
    from zero_latency_yolo_tpu.models.yolov8 import forward_decoded
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    x = jnp.asarray(np.random.default_rng(2).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32))
    want = forward_decoded(params, spec, x, c2f="split")
    got = forward_decoded(params, spec, x, c2f="split",
                          conv_fn=make_mm1x1_conv(interpret=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_engine_conv1x1_flag_matches_stock():
    """tpu.conv1x1="pallas_interpret" threads through the engine step
    builder and produces the same detections as the stock engine."""
    from zero_latency_yolo_tpu.config import ServerConfig
    from zero_latency_yolo_tpu.models import get_spec, init_params
    from zero_latency_yolo_tpu.runtime.engine import (
        InferenceEngine, InferenceRequest)
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)

    def reqs():
        return [InferenceRequest(client_id=i + 1, frame_id=i, timestamp=0,
                                 width=96, height=64,
                                 data=np.random.default_rng(i).integers(
                                     0, 256, (64, 96, 3), dtype=np.uint8))
                for i in range(2)]

    def cfg(extra):
        return ServerConfig.from_dict({
            "model_path": "/nonexistent.npz",
            "detection": {"model_width": 64, "model_height": 64},
            "tpu": {"variant": "yolov8p", "num_classes": 4,
                    "dtype": "float32", "batch_buckets": [2],
                    "frame_buckets": [[96, 96]], "pre_nms_topk": 64,
                    **extra},
        })

    res = InferenceEngine(
        cfg({"conv1x1": "pallas_interpret"}), params=params).infer_batch(reqs())
    res2 = InferenceEngine(cfg({}), params=params).infer_batch(reqs())
    assert len(res) == 2
    for a, b in zip(res, res2):
        assert len(a.detections) == len(b.detections)
        for da, db in zip(a.detections, b.detections):
            assert da.x == pytest.approx(db.x, abs=1e-4)


def test_engine_rejects_both_pallas_conv_fns():
    from zero_latency_yolo_tpu.config import ServerConfig
    from zero_latency_yolo_tpu.models import get_spec, init_params
    from zero_latency_yolo_tpu.runtime.engine import InferenceEngine
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent.npz",
        "detection": {"model_width": 64, "model_height": 64},
        "tpu": {"variant": "yolov8p", "num_classes": 4, "dtype": "float32",
                "batch_buckets": [2], "frame_buckets": [[96, 96]],
                "act": "pallas_interpret",
                "conv1x1": "pallas_interpret"},
    })
    with pytest.raises(ValueError, match="mutually exclusive"):
        InferenceEngine(cfg, params=params)
