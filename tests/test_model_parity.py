"""Cross-framework numerical parity: JAX (NHWC, folded BN) vs torch (NCHW, live BN).

This is the stand-in for the BASELINE "boxes within 1e-3 of ONNX Runtime" gate:
the CI image ships no onnxruntime, so parity is checked against an
independently written torch implementation of the same architecture. The two
stacks share only the parameter pytree.
"""

import os

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


# ---------------------------------------------------------------------------
# Real-weights gates at deployment size (416). The artifact is a converged
# yolov8n trained in-repo (train/loop.py synthetic task, mAP 0.97 at step
# 2500) — realistic weight/activation statistics that random init does not
# produce: BN folding from trained running stats, saturated logits, feature
# absmax in the hundreds. Random-init parity demonstrably under-stressed
# bf16 (the bf16 raw-output delta with these weights is ~0.7 in probability,
# yet detection-level outputs match — hence the set-matched NMS-level gate).
# ---------------------------------------------------------------------------

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Two converged in-repo artifacts: trained at 128, and fine-tuned at the
# deployment size (416, mAP 0.88 on its task).
ARTIFACTS = (os.path.join(_REPO, "artifacts", "yolov8n_trained.npz"),
             os.path.join(_REPO, "artifacts", "yolov8n_trained_416.npz"))
DEPLOY_SIZE = 416


@pytest.fixture(scope="module", params=[os.path.basename(a) for a in ARTIFACTS])
def trained(request):
    path = next(a for a in ARTIFACTS
                if os.path.basename(a) == request.param)
    if not os.path.exists(path):
        pytest.skip("trained artifact missing")
    from zero_latency_yolo_tpu.models.weights import load_params
    from zero_latency_yolo_tpu.ops.preprocess import letterbox_batch
    from zero_latency_yolo_tpu.runtime.simulator import synthetic_frame
    spec = get_spec("yolov8n", num_classes=4)
    params = load_params(path)
    frame = synthetic_frame(800, 600, seed=4)
    x = np.asarray(letterbox_batch(
        jnp.asarray(frame[None]), jnp.asarray([600], jnp.int32),
        jnp.asarray([800], jnp.int32), DEPLOY_SIZE))
    return spec, params, x


def test_real_weights_parity_416_f32(trained):
    """The 1e-3 cross-framework gate at deployment size with trained weights
    (measured: box 3.7e-5, prob 1.6e-4 — pinned with margin)."""
    spec, params, x = trained
    out_jax = np.asarray(forward_decoded(params, spec, jnp.asarray(x)))
    out_torch = forward_decoded_torch(jax.tree.map(np.asarray, params), spec, x)
    box_diff = np.abs(out_jax[..., :4] - out_torch[..., :4]) / DEPLOY_SIZE
    prob_diff = np.abs(out_jax[..., 4:] - out_torch[..., 4:])
    assert box_diff.max() < 1e-3, f"box diff {box_diff.max():.2e}"
    assert prob_diff.max() < 1e-3, f"prob diff {prob_diff.max():.2e}"
    # The gate must not be vacuous: the trained model fires on this frame.
    assert (out_jax[..., 4:] > 0.5).any()


def test_real_weights_bf16_detection_level():
    """bf16 serving vs f32, compared where it matters: post-NMS detections.
    Raw bf16 activations drift several percent through a sharp trained
    network (rank swaps among near-equal scores), but every detection must
    set-match an f32 twin: same class, high IoU, conf within 0.03."""
    from zero_latency_yolo_tpu.models.weights import load_params
    from zero_latency_yolo_tpu.ops import nms as nms_ops
    from zero_latency_yolo_tpu.train.loop import synthetic_batches
    if not os.path.exists(ARTIFACTS[0]):
        pytest.skip("trained artifact missing")
    spec = get_spec("yolov8n", num_classes=4)
    params = load_params(ARTIFACTS[0])
    # In-distribution input (the task the artifact was trained on): OOD
    # frames drive the overfit model into saturated full-frame
    # hallucinations whose NMS outcome is inherently unstable in any dtype.
    x, _targets = next(synthetic_batches(1, DEPLOY_SIZE, seed=777))

    def detections(dtype):
        pred = forward_decoded(params, spec, jnp.asarray(x), dtype=dtype)
        b = pred.shape[0]
        out = nms_ops.postprocess_batch(
            pred, jnp.ones((4,), jnp.float32), jnp.float32(0.5),
            jnp.float32(0.45), jnp.ones((b,), jnp.float32),
            jnp.zeros((b, 2), jnp.float32),
            jnp.full((b, 2), float(DEPLOY_SIZE), jnp.float32))
        n = int(np.asarray(out["count"])[0])
        return (np.asarray(out["boxes"])[0, :n],
                np.asarray(out["scores"])[0, :n],
                np.asarray(out["classes"])[0, :n])

    def iou(a, b):  # cxcywh, normalized
        ax0, ay0 = a[0] - a[2] / 2, a[1] - a[3] / 2
        ax1, ay1 = a[0] + a[2] / 2, a[1] + a[3] / 2
        bx0, by0 = b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2
        bx1, by1 = b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2
        iw = np.maximum(np.minimum(ax1, bx1) - np.maximum(ax0, bx0), 0)
        ih = np.maximum(np.minimum(ay1, by1) - np.maximum(ay0, by0), 0)
        inter = iw * ih
        return inter / (a[2] * a[3] + b[:, 2] * b[:, 3] - inter + 1e-9)

    fb, fs, fc = detections(jnp.float32)
    bb, bs, bc = detections(jnp.bfloat16)
    assert len(fb) > 0, "gate vacuous: no detections"
    assert len(fb) == len(bb), f"count mismatch {len(fb)} vs {len(bb)}"
    used = set()
    for i in range(len(fb)):
        overlap = iou(fb[i], bb)
        overlap[list(used)] = -1.0
        j = int(np.argmax(overlap))
        # bf16 can flip NMS ties between twin anchors (~1-2 px box shift);
        # the surviving detection must still be the same object.
        assert overlap[j] > 0.85, f"det {i}: best bf16 IoU {overlap[j]:.3f}"
        assert bc[j] == fc[i]
        assert abs(bs[j] - fs[i]) < 0.03
        used.add(j)


def test_real_weights_bf16_ap_gate_416():
    """Serving-quality gate on the deployment-size artifact: bf16 must stay
    within 0.05 mAP / 0.08 recall of f32 on in-distribution data (measured:
    f32 mAP 0.986 vs bf16 0.95 — the cost of bf16 on a sharp fine-tune,
    pinned so regressions in the conv/tail precision strategy surface)."""
    import jax.numpy as jnp
    from zero_latency_yolo_tpu.models.weights import load_params
    from zero_latency_yolo_tpu.train.eval import evaluate
    from zero_latency_yolo_tpu.train.loop import synthetic_batches
    if not os.path.exists(ARTIFACTS[1]):
        pytest.skip("416 artifact missing")
    spec = get_spec("yolov8n", num_classes=4)
    params = load_params(ARTIFACTS[1])
    images, targets = next(synthetic_batches(8, DEPLOY_SIZE, seed=777))
    mf = evaluate(params, spec, images, targets, conf_thresh=0.25, batch=4,
                  dtype=jnp.float32)
    mb = evaluate(params, spec, images, targets, conf_thresh=0.25, batch=4,
                  dtype=jnp.bfloat16)
    assert mf["mAP"] > 0.9, f"gate vacuous: f32 mAP {mf['mAP']:.3f}"
    assert mb["mAP"] > 0.9, f"bf16 mAP {mb['mAP']:.3f}"
    assert abs(mf["mAP"] - mb["mAP"]) < 0.05
    assert abs(mf["recall"] - mb["recall"]) < 0.08


def test_variant_specs():
    assert get_spec("yolov8n").backbone_channels == (64, 128, 256)
    assert get_spec("yolov8s").backbone_channels == (128, 256, 512)
    assert get_spec("yolov8m").backbone_channels == (192, 384, 576)
    with pytest.raises(ValueError):
        get_spec("yolov9z")


def test_parametric_variant_torch_parity():
    """Parametric scaling holds cross-framework: a custom-width spec runs
    through BOTH independent implementations within the same 1e-3 gate
    (guards the scaling math — _make_divisible/ch() — not just one stack)."""
    spec = get_spec("yolov8-d0.33-w0.125-mc256", num_classes=4)
    params_raw = init_params(jax.random.PRNGKey(2), spec, folded=False)
    params_np = jax.tree.map(np.asarray, params_raw)
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3)),
                   dtype=np.float32)
    folded = fold_batchnorm(params_raw)
    out_jax = np.asarray(forward_decoded(folded, spec, jnp.asarray(x)))
    out_torch = forward_decoded_torch(params_np, spec, x)
    assert (np.abs(out_jax[..., :4] - out_torch[..., :4]) / 64).max() < 1e-3
    assert np.abs(out_jax[..., 4:] - out_torch[..., 4:]).max() < 1e-3
