"""int8 backbone quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from zero_latency_yolo_tpu.models import fold_batchnorm, forward_decoded, get_spec, init_params
from zero_latency_yolo_tpu.models.weights import flatten
from zero_latency_yolo_tpu.ops.quant import dequantize_params, quantize_params

SIZE = 64


def test_quantize_roundtrip_error_bounded():
    spec = get_spec("yolov8n", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    q = quantize_params(params)
    dq = dequantize_params(q)
    for key, orig in flatten(jax.tree.map(np.asarray, params)).items():
        got = flatten(jax.tree.map(np.asarray, dq))[key]
        if orig.ndim == 4 and not key.startswith(("m22", "m0")):
            # per-channel int8: worst-case error half a quantization step
            step = np.abs(orig).max(axis=(0, 1, 2)) / 127.0
            assert (np.abs(got - orig) <= step / 2 + 1e-7).all(), key
        else:
            np.testing.assert_array_equal(got, orig)


def test_head_and_stem_not_quantized():
    spec = get_spec("yolov8n", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    q = quantize_params(params)
    flat = flatten(jax.tree.map(np.asarray, q))
    assert not any(k.startswith("m22") and "w_q" in k for k in flat)
    assert "m0/w" in flat and "m0/w_q" not in flat
    assert "m1/w_q" in flat and "m1/w_scale" in flat
    assert flat["m1/w_q"].dtype == np.int8


def test_static_calibration_matches_dynamic():
    from zero_latency_yolo_tpu.ops.quant import calibrate_activations
    spec = get_spec("yolov8p", 4)
    params = fold_batchnorm(init_params(jax.random.PRNGKey(0), spec, folded=False))
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, SIZE, SIZE, 3))
    q_dyn = quantize_params(params)
    dyn = np.asarray(forward_decoded(q_dyn, spec, x))
    q_static = quantize_params(params)
    n = calibrate_activations(q_static, spec, np.asarray(x))
    assert n > 10  # all backbone convs calibrated
    flat = flatten(jax.tree.map(np.asarray, q_static))
    assert any(k.endswith("x_scale") for k in flat)
    static = np.asarray(forward_decoded(q_static, spec, x))
    # Static scales calibrated on the same distribution stay close to the
    # dynamic-quant outputs.
    assert np.abs(dyn[..., 4:] - static[..., 4:]).mean() < 0.03
    assert np.isfinite(static).all()


def test_int8_forward_close_to_f32():
    spec = get_spec("yolov8n", 4)
    params = fold_batchnorm(init_params(jax.random.PRNGKey(0), spec, folded=False))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, SIZE, SIZE, 3))
    ref = np.asarray(forward_decoded(params, spec, x))
    q = quantize_params(params)
    got = np.asarray(forward_decoded(q, spec, x))
    # int8 is lossy; probabilities must stay well-correlated and boxes sane.
    prob_err = np.abs(ref[..., 4:] - got[..., 4:])
    assert prob_err.mean() < 0.05, prob_err.mean()
    box_err = np.abs(ref[..., :4] - got[..., :4]) / SIZE
    assert np.median(box_err) < 0.05
