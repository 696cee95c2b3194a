"""Cross-framework numerical parity: JAX (NHWC, folded BN) vs torch (NCHW, live BN).

This is the stand-in for the BASELINE "boxes within 1e-3 of ONNX Runtime" gate:
the CI image ships no onnxruntime, so parity is checked against an
independently written torch implementation of the same architecture. The two
stacks share only the parameter pytree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zero_latency_yolo_tpu.models import (
    ModelSpec, anchors_for, fold_batchnorm, forward_decoded, get_spec,
    init_params,
)
from zero_latency_yolo_tpu.models.torch_ref import forward_decoded_torch
from zero_latency_yolo_tpu.models.weights import flatten

SIZE = 128  # small but covers all three strides (128/32 = 4)


@pytest.fixture(scope="module")
def setup():
    spec = get_spec("yolov8n", num_classes=4)
    params_raw = init_params(jax.random.PRNGKey(0), spec, folded=False)
    params_np = jax.tree.map(np.asarray, params_raw)
    x = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (2, SIZE, SIZE, 3)),
        dtype=np.float32)
    return spec, params_raw, params_np, x


def test_anchor_layout(setup):
    spec = setup[0]
    anchors, strides = anchors_for(spec, 416, 416)
    assert anchors.shape == (3549, 2) and strides.shape == (3549, 1)
    assert anchors[0].tolist() == [0.5, 0.5]
    assert strides[0, 0] == 8 and strides[-1, 0] == 32
    assert spec.num_anchors(416, 416) == 3549


def test_output_shape(setup):
    spec, params_raw, _, x = setup
    folded = fold_batchnorm(params_raw)
    out = forward_decoded(folded, spec, jnp.asarray(x))
    a = spec.num_anchors(SIZE, SIZE)
    assert out.shape == (2, a, 4 + spec.num_classes)


def test_jax_vs_torch_parity_f32(setup):
    spec, params_raw, params_np, x = setup
    folded = fold_batchnorm(params_raw)
    out_jax = np.asarray(forward_decoded(folded, spec, jnp.asarray(x)))
    out_torch = forward_decoded_torch(params_np, spec, x)
    # Boxes compared in normalized units (the wire format is normalized).
    box_diff = np.abs(out_jax[..., :4] - out_torch[..., :4]) / SIZE
    prob_diff = np.abs(out_jax[..., 4:] - out_torch[..., 4:])
    assert box_diff.max() < 1e-3, f"box diff {box_diff.max():.2e}"
    assert prob_diff.max() < 1e-3, f"prob diff {prob_diff.max():.2e}"


def test_bn_folding_is_exact(setup):
    spec, params_raw, _, x = setup
    # Folding must not change the function (beyond float assoc error).
    folded = fold_batchnorm(params_raw)
    flat = flatten(jax.tree.map(np.asarray, folded))
    assert all("bn" not in k for k in flat)
    out1 = np.asarray(forward_decoded(folded, spec, jnp.asarray(x)))
    out2 = np.asarray(forward_decoded(fold_batchnorm(folded), spec, jnp.asarray(x)))
    np.testing.assert_allclose(out1, out2, rtol=0, atol=0)


def test_bf16_close_to_f32(setup):
    spec, params_raw, _, x = setup
    folded = fold_batchnorm(params_raw)
    f32 = np.asarray(forward_decoded(folded, spec, jnp.asarray(x), dtype=jnp.float32))
    bf16 = np.asarray(forward_decoded(folded, spec, jnp.asarray(x), dtype=jnp.bfloat16))
    # bf16 tolerance is looser; serving accuracy is validated at the NMS level.
    assert np.abs(f32[..., 4:] - bf16[..., 4:]).max() < 0.05
    assert (np.abs(f32[..., :4] - bf16[..., :4]) / SIZE).max() < 0.05


def test_variant_specs():
    assert get_spec("yolov8n").backbone_channels == (64, 128, 256)
    assert get_spec("yolov8s").backbone_channels == (128, 256, 512)
    assert get_spec("yolov8m").backbone_channels == (192, 384, 576)
    with pytest.raises(ValueError):
        get_spec("yolov9z")
