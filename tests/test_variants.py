"""Model-family spec/shape checks (init only — forwards are covered by the
pico/nano tests; large variants compile too slowly for single-core CI)."""

import jax
import numpy as np
import pytest

from zero_latency_yolo_tpu.models import VARIANTS, get_spec, init_params
from zero_latency_yolo_tpu.models.weights import flatten


@pytest.mark.parametrize("variant,p3", [
    ("yolov8p", 32), ("yolov8n", 64), ("yolov8s", 128),
    ("yolov8m", 192), ("yolov8l", 256), ("yolov8x", 320),
])
def test_backbone_widths(variant, p3):
    spec = get_spec(variant, 80)
    assert spec.backbone_channels[0] == p3


@pytest.mark.parametrize("variant", ["yolov8p", "yolov8s"])
def test_param_shapes_consistent(variant):
    spec = get_spec(variant, num_classes=7)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    flat = flatten(jax.tree.map(np.asarray, params))
    # Stem takes RGB.
    assert flat["m0/w"].shape[:3] == (3, 3, 3)
    # Detect head tips: 4*reg_max box bins and nc class logits per level.
    for lvl in range(3):
        assert flat[f"m22/cv2/{lvl}/2/w"].shape[-1] == 64
        assert flat[f"m22/cv3/{lvl}/2/w"].shape[-1] == 7
    # Head inputs match backbone channels.
    chs = spec.backbone_channels
    for lvl, c in enumerate(chs):
        assert flat[f"m22/cv2/{lvl}/0/w"].shape[2] == c


def test_depth_scaling():
    # n-scale: C2f repeats 1/2/2/1; l-scale: 3/6/6/3.
    n = init_params(jax.random.PRNGKey(0), get_spec("yolov8n", 4), folded=True)
    assert len(n["m2"]["m"]) == 1 and len(n["m4"]["m"]) == 2
    spec_l = get_spec("yolov8l", 4)
    assert round(3 * spec_l.depth) == 3 and round(6 * spec_l.depth) == 6


def test_anchor_counts_by_size():
    spec = get_spec("yolov8n", 4)
    assert spec.num_anchors(416, 416) == 3549
    assert spec.num_anchors(640, 640) == 8400
    assert spec.num_anchors(64, 64) == 84


def test_concurrent_traces_are_isolated():
    """Serving (accum_f32=True, bf16 tails) and training (accum_f32=False,
    f32 tails) traces running on separate threads must not contaminate each
    other — the flag is threaded through explicitly, with no module-global
    trace switch."""
    import threading

    import jax.numpy as jnp

    from zero_latency_yolo_tpu.models import forward_raw

    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    x = np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)

    def run(flag):
        fn = jax.jit(lambda p, xx: forward_raw(
            p, spec, xx, dtype=jnp.bfloat16, accum_f32=flag)[0])
        return np.asarray(fn(params, jnp.asarray(x)))

    ref = {flag: run(flag) for flag in (True, False)}
    got = {}
    threads = [threading.Thread(target=lambda f=f: got.update({f: run(f)}))
               for f in (True, False)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for flag in (True, False):
        np.testing.assert_array_equal(got[flag], ref[flag])


def test_c2f_split_matches_baseline():
    """tpu.c2f="split" is an exact rewrite: cv1 as two half-width convs and
    cv2 as a sum of per-piece 1x1 contractions on weight slices — same math
    as the slice/concat form up to partial-sum rounding."""
    import jax.numpy as jnp
    from zero_latency_yolo_tpu.models import forward_decoded

    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(3), spec, folded=True)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))

    base = np.asarray(jax.jit(
        lambda p, xx: forward_decoded(p, spec, xx, dtype=jnp.float32)
    )(params, x))
    split = np.asarray(jax.jit(
        lambda p, xx: forward_decoded(p, spec, xx, dtype=jnp.float32,
                                      c2f="split"))(params, x))
    np.testing.assert_allclose(split, base, rtol=1e-4, atol=1e-4)

    # bf16 serving path engages the split form too; detection-level closeness.
    b16 = np.asarray(jax.jit(
        lambda p, xx: forward_decoded(p, spec, xx, dtype=jnp.bfloat16)
    )(params, x))
    b16_split = np.asarray(jax.jit(
        lambda p, xx: forward_decoded(p, spec, xx, dtype=jnp.bfloat16,
                                      c2f="split"))(params, x))
    np.testing.assert_allclose(b16_split, b16, rtol=3e-2, atol=3e-2)


def test_c2f_split_falls_back_on_unfolded_params():
    """Unfolded (BN) checkpoints can't slice fused weights — the split form
    must fall back to the slice/concat path, bit-identically."""
    import jax.numpy as jnp
    from zero_latency_yolo_tpu.models import forward_decoded

    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(4), spec, folded=False)
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    base = np.asarray(jax.jit(
        lambda p, xx: forward_decoded(p, spec, xx, dtype=jnp.float32)
    )(params, x))
    split = np.asarray(jax.jit(
        lambda p, xx: forward_decoded(p, spec, xx, dtype=jnp.float32,
                                      c2f="split"))(params, x))
    np.testing.assert_array_equal(split, base)


def test_s2d_stem_and_dot1x1_match_baseline():
    """The serving-layout experiments are exact rewrites: s2d stem over s2d
    input and dot_general 1x1 convs must reproduce the baseline forward."""
    import jax.numpy as jnp
    from zero_latency_yolo_tpu.models import forward_decoded
    from zero_latency_yolo_tpu.ops.preprocess import (
        letterbox_batch_mxu, letterbox_batch_mxu_s2d)

    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(2), spec, folded=True)
    rng = np.random.default_rng(5)
    frames = jnp.asarray(rng.integers(0, 256, (2, 72, 96, 3), np.uint8))
    hs = jnp.asarray([64, 72], jnp.int32)
    ws = jnp.asarray([96, 88], jnp.int32)
    size = 64

    x = letterbox_batch_mxu(frames, hs, ws, size)
    base = np.asarray(jax.jit(
        lambda p, xx: forward_decoded(p, spec, xx, dtype=jnp.float32)
    )(params, x))

    xz = letterbox_batch_mxu_s2d(frames, hs, ws, size)
    s2d = np.asarray(jax.jit(
        lambda p, xx: forward_decoded(p, spec, xx, dtype=jnp.float32,
                                      stem="s2d"))(params, xz))
    np.testing.assert_allclose(s2d, base, rtol=1e-4, atol=1e-4)

    # dot1x1 engages on the bf16 fast path; compare bf16-vs-bf16.
    b16 = np.asarray(jax.jit(
        lambda p, xx: forward_decoded(p, spec, xx, dtype=jnp.bfloat16)
    )(params, x))
    b16_dot = np.asarray(jax.jit(
        lambda p, xx: forward_decoded(p, spec, xx, dtype=jnp.bfloat16,
                                      dot1x1=True))(params, x))
    np.testing.assert_allclose(b16_dot, b16, rtol=2e-2, atol=2e-2)


def test_parametric_variant_spec():
    """Custom (depth, width) scaling: "yolov8-d<D>-w<W>[-mc<C>]" — the same
    surface the named sizes are points on."""
    spec = get_spec("yolov8-d0.33-w0.25", 4)
    named = get_spec("yolov8n", 4)
    assert spec.backbone_channels == named.backbone_channels
    assert spec.depth == named.depth
    narrow = get_spec("yolov8-d0.33-w0.20", 4)
    assert narrow.backbone_channels[0] < named.backbone_channels[0]
    custom_mc = get_spec("yolov8-d0.33-w0.50-mc512", 4)
    assert custom_mc.max_channels == 512
    for bad in ("yolov8-w0.25", "yolov8-d0.33-w0", "yolov8-d3.0-w0.25",
                "yolov8q", "yolov8-d0.33-w0.25-mcx", "yolov8-d0.33-w0.25-mc0"):
        with pytest.raises(ValueError):
            get_spec(bad, 4)


def test_parametric_variant_forward_and_engine():
    """A custom-width pico-class variant inits, forwards, and serves through
    the engine exactly like a named one."""
    import jax.numpy as jnp
    from zero_latency_yolo_tpu.config import ServerConfig
    from zero_latency_yolo_tpu.models.yolov8 import forward_decoded
    from zero_latency_yolo_tpu.runtime.engine import (
        InferenceEngine, InferenceRequest)
    variant = "yolov8-d0.33-w0.125-mc256"  # pico widths, custom route
    spec = get_spec(variant, 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 64, 64, 3)).astype(np.float32))
    pred = forward_decoded(params, spec, x)
    assert pred.shape == (1, spec.num_anchors(64, 64), 4 + 4)
    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent.npz",
        "detection": {"model_width": 64, "model_height": 64},
        "tpu": {"variant": variant, "num_classes": 4, "dtype": "float32",
                "batch_buckets": [1], "frame_buckets": [[96, 96]],
                "pre_nms_topk": 64},
    })
    eng = InferenceEngine(cfg, params=params)
    res = eng.infer_batch([InferenceRequest(
        client_id=1, frame_id=0, timestamp=0, width=96, height=64,
        data=np.random.default_rng(1).integers(0, 256, (64, 96, 3),
                                               dtype=np.uint8))])
    assert len(res) == 1
