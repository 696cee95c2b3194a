"""YOLOv8 detection family (n/s/m/l/x) as a functional JAX model, TPU-first.

This replaces the reference's ONNX-Runtime session (reference:
src/inference/onnx_engine.cpp:957-1062 loads an exported YOLOv8n .onnx) with a
native JAX implementation:

- NHWC activations / HWIO kernels (TPU-native convolution layout).
- BatchNorm folded into conv weights at load time; inference applies
  conv + bias + SiLU only, letting XLA fuse the elementwise tail into the
  convolution.
- Parameters are a plain nested-dict pytree keyed by the ultralytics layer
  indices ("m0".."m22") so checkpoints convert mechanically.
- `forward_raw` returns per-level (B, H, W, 4*reg_max + nc) maps; the
  DFL decode + sigmoid live in `decode_outputs` below so they can fuse
  with NMS in one jitted program (ops/nms.py consumes the decoded form).
- All shapes static; compute dtype selectable (bfloat16 on TPU, float32 for
  parity tests) with float32 MXU accumulation.

Architecture (ultralytics yolov8.yaml): stem + C2f stages + SPPF backbone,
PAN-FPN neck, decoupled anchor-free detect head with DFL (reg_max=16),
strides (8, 16, 32).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, Any]

# variant -> (depth_multiple, width_multiple, max_channels)
VARIANTS = {
    # pico: a reduced test/edge variant of this framework (not an
    # ultralytics size) — fast CPU compiles for CI and tiny deployments.
    "yolov8p": (0.33, 0.125, 256),
    "yolov8n": (0.33, 0.25, 1024),
    "yolov8s": (0.33, 0.50, 1024),
    "yolov8m": (0.67, 0.75, 768),
    "yolov8l": (1.00, 1.00, 512),
    "yolov8x": (1.00, 1.25, 512),
}

_BASE_CH = (64, 128, 256, 512, 1024)
BN_EPS = 1e-3  # ultralytics BatchNorm2d eps


def _make_divisible(x: float, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


def _depth(n: int, d: float) -> int:
    return max(round(n * d), 1)


@dataclass(frozen=True)
class ModelSpec:
    variant: str
    num_classes: int
    depth: float
    width: float
    max_channels: int
    reg_max: int = 16
    strides: Tuple[int, ...] = (8, 16, 32)

    # Derived channel widths -------------------------------------------------
    def ch(self, base: int) -> int:
        return _make_divisible(min(base, self.max_channels) * self.width)

    @property
    def backbone_channels(self) -> Tuple[int, int, int]:
        """(P3, P4, P5) channels feeding the detect head."""
        return (self.ch(256), self.ch(512), self.ch(1024))

    @property
    def no(self) -> int:
        """Per-anchor output width: 4*reg_max box bins + nc class logits."""
        return 4 * self.reg_max + self.num_classes

    def num_anchors(self, h: int, w: int) -> int:
        return sum((h // s) * (w // s) for s in self.strides)


# Parametric scaling: "yolov8-d{depth}-w{width}[-mc{max_channels}]", e.g.
# "yolov8-d0.33-w0.125". The named sizes are points on this same (d, w, mc)
# surface (ultralytics scales models the same way via yaml 'scales'). The
# reference deploys whatever export is dropped into models/
# (/root/reference/start.sh:113-149); this is the rebuild's equivalent
# freedom for model sizing. MEASURED on v5e (BENCH_NOTES "width ladder"):
# keep widths on the power-of-two fractions (0.125, 0.25, 0.5...) — those
# keep every channel count lane-aligned; intermediate widths (0.15, 0.20)
# produce 8-multiple-but-unaligned channels that tile so badly the step
# gets SLOWER than the wider baseline despite 36-64% fewer MACs.
_CUSTOM_VARIANT_RE = re.compile(
    r"^yolov8-d(\d*\.?\d+)-w(\d*\.?\d+)(?:-mc(\d+))?$")


def get_spec(variant: str = "yolov8n", num_classes: int = 4) -> ModelSpec:
    if variant in VARIANTS:
        d, w, mc = VARIANTS[variant]
    else:
        m = _CUSTOM_VARIANT_RE.match(variant)
        if m is None:
            raise ValueError(
                f"unknown variant {variant!r}; choose from {sorted(VARIANTS)} "
                "or a parametric 'yolov8-d<depth>-w<width>[-mc<max_channels>]'")
        d, w = float(m.group(1)), float(m.group(2))
        mc = int(m.group(3)) if m.group(3) else 1024
        if not (0.0 < d <= 2.0 and 0.0 < w <= 2.0):
            raise ValueError(
                f"parametric variant {variant!r}: depth/width multiples must "
                "be in (0, 2]")
        if mc < 8:
            # A degenerate cap (e.g. mc0) would zero channel widths and
            # crash deep in parameter init instead of here.
            raise ValueError(
                f"parametric variant {variant!r}: max_channels must be >= 8")
    return ModelSpec(variant=variant, num_classes=num_classes,
                     depth=d, width=w, max_channels=mc)


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------

def _init_conv(rng, cin: int, cout: int, k: int, folded: bool, bias: bool = False) -> Params:
    """He-normal conv init (NumPy host RNG: ~100 layer inits would otherwise
    trigger ~100 per-shape XLA compiles). folded=True emits inference form
    (w + b); folded=False emits training form (w + bn stats)."""
    std = math.sqrt(2.0 / (cin * k * k))
    w = (rng.standard_normal((k, k, cin, cout)) * std).astype(np.float32)
    p: Params = {"w": w}
    if folded or bias:
        p["b"] = np.zeros((cout,), np.float32)
    if not folded and not bias:
        p["bn"] = {
            "gamma": np.ones((cout,), np.float32),
            "beta": np.zeros((cout,), np.float32),
            "mean": np.zeros((cout,), np.float32),
            # Non-trivial running_var so BN folding is exercised by tests.
            "var": np.abs(rng.standard_normal(cout)).astype(np.float32)
            * 0.5 + 0.5,
        }
    return p


def _init_bottleneck(rng, c: int, folded: bool) -> Params:
    return {"cv1": _init_conv(rng, c, c, 3, folded),
            "cv2": _init_conv(rng, c, c, 3, folded)}


def _init_c2f(rng, cin: int, cout: int, n: int, folded: bool) -> Params:
    c = cout // 2
    return {
        "cv1": _init_conv(rng, cin, 2 * c, 1, folded),
        "cv2": _init_conv(rng, (2 + n) * c, cout, 1, folded),
        "m": [_init_bottleneck(rng, c, folded) for _ in range(n)],
    }


def _init_sppf(rng, cin: int, cout: int, folded: bool) -> Params:
    c = cin // 2
    return {"cv1": _init_conv(rng, cin, c, 1, folded),
            "cv2": _init_conv(rng, 4 * c, cout, 1, folded)}


def _init_detect(rng, spec: ModelSpec, folded: bool) -> Params:
    chs = spec.backbone_channels
    c2 = max(16, chs[0] // 4, 4 * spec.reg_max)
    c3 = max(chs[0], min(spec.num_classes, 100))
    cv2, cv3 = [], []
    for cin in chs:
        cv2.append([
            _init_conv(rng, cin, c2, 3, folded),
            _init_conv(rng, c2, c2, 3, folded),
            _init_conv(rng, c2, 4 * spec.reg_max, 1, folded=True, bias=True),
        ])
        cv3.append([
            _init_conv(rng, cin, c3, 3, folded),
            _init_conv(rng, c3, c3, 3, folded),
            _init_conv(rng, c3, spec.num_classes, 1, folded=True, bias=True),
        ])
    return {"cv2": cv2, "cv3": cv3}


def init_params(key, spec: ModelSpec, folded: bool = True,
                device: bool = True) -> Params:
    """Random-initialized parameter pytree (layer keys match ultralytics
    indices). `key` may be a jax PRNG key or an int seed; initialization runs
    on host NumPy (deterministic, no per-shape XLA compiles). device=False
    returns the NumPy tree untransferred — shape introspection on the
    model-watcher thread must not put H2D traffic on a second device lane
    (a whole model through the relayed TPU is seconds of transfer, and a
    second lane concurrent with the batcher wedges the relay)."""
    if isinstance(key, int):
        seed = key
    else:
        seed = int(np.asarray(jax.random.key_data(key)).ravel()[-1])
    rng = np.random.default_rng(seed)
    ch, d = spec.ch, spec.depth
    p: Params = {}
    p["m0"] = _init_conv(rng, 3, ch(64), 3, folded)
    p["m1"] = _init_conv(rng, ch(64), ch(128), 3, folded)
    p["m2"] = _init_c2f(rng, ch(128), ch(128), _depth(3, d), folded)
    p["m3"] = _init_conv(rng, ch(128), ch(256), 3, folded)
    p["m4"] = _init_c2f(rng, ch(256), ch(256), _depth(6, d), folded)
    p["m5"] = _init_conv(rng, ch(256), ch(512), 3, folded)
    p["m6"] = _init_c2f(rng, ch(512), ch(512), _depth(6, d), folded)
    p["m7"] = _init_conv(rng, ch(512), ch(1024), 3, folded)
    p["m8"] = _init_c2f(rng, ch(1024), ch(1024), _depth(3, d), folded)
    p["m9"] = _init_sppf(rng, ch(1024), ch(1024), folded)
    # PAN-FPN neck
    p["m12"] = _init_c2f(rng, ch(1024) + ch(512), ch(512), _depth(3, d), folded)
    p["m15"] = _init_c2f(rng, ch(512) + ch(256), ch(256), _depth(3, d), folded)
    p["m16"] = _init_conv(rng, ch(256), ch(256), 3, folded)
    p["m18"] = _init_c2f(rng, ch(256) + ch(512), ch(512), _depth(3, d), folded)
    p["m19"] = _init_conv(rng, ch(512), ch(512), 3, folded)
    p["m21"] = _init_c2f(rng, ch(512) + ch(1024), ch(1024), _depth(3, d), folded)
    p["m22"] = _init_detect(rng, spec, folded)
    if device:
        p = jax.tree.map(jnp.asarray, p)
    return p


# ---------------------------------------------------------------------------
# BatchNorm folding
# ---------------------------------------------------------------------------

def fold_batchnorm(params: Params, eps: float = BN_EPS) -> Params:
    """Fold {w, bn} conv blocks into {w, b}: exact algebra, applied once at load.

    W'[...o] = W[...o] * gamma[o] / sqrt(var[o]+eps)
    b'[o]    = beta[o] - gamma[o] * mean[o] / sqrt(var[o]+eps)
    """
    def fold(node):
        if isinstance(node, dict):
            if "bn" in node and "w" in node:
                bn = node["bn"]
                scale = bn["gamma"] / jnp.sqrt(bn["var"] + eps)
                # A pre-existing conv bias folds as (b - mean)*scale + beta
                # (ultralytics convs are bias-free, but a converted
                # checkpoint carrying both must not silently lose it).
                b0 = node.get("b", 0.0)
                return {"w": node["w"] * scale,
                        "b": bn["beta"] + (b0 - bn["mean"]) * scale}
            return {k: fold(v) for k, v in node.items()}
        if isinstance(node, list):
            return [fold(v) for v in node]
        return node
    return fold(params)


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(p: Params, x: jnp.ndarray, stride: int = 1, act: bool = True,
          dtype=jnp.float32, accum_f32: bool = True,
          dot1x1: bool = False) -> jnp.ndarray:
    """Conv + bias + SiLU. `SAME` padding for k1/k3 s1; YOLO k3 s2 uses p=1.

    accum_f32=True selects the serving fast path (conv + tails entirely in
    the compute dtype; the MXU accumulates f32 internally either way).
    Training uses accum_f32=False: compute-dtype conv with an f32 tail, the
    autodiff-safe form. Threaded explicitly from forward_raw — there is
    deliberately NO module-global trace switch (the batcher thread compiles
    serve steps lazily while train code may trace elsewhere).

    dot1x1=True routes k=1 s=1 convs through dot_general (bit-identical
    contraction) — a serving experiment probing whether XLA:TPU fuses the
    bias+SiLU tail into dot output fusions where it can't for convolutions.

    Dispatches to the int8 path when the block carries quantized weights
    (ops/quant.py): per-tensor activation quant, int8 MXU conv with int32
    accumulation, dequant into the f32 tail.
    """
    if "w_q" in p:
        w_q = p["w_q"]
        k = w_q.shape[0]
        pad = (k - 1) // 2
        x32 = x.astype(jnp.float32)
        if "x_scale" in p:
            # Static calibrated activation scale (ops/quant.py) — no
            # per-batch reduction on the hot path.
            x_scale = p["x_scale"].astype(jnp.float32)
        else:
            x_amax = jnp.maximum(jnp.max(jnp.abs(x32)), 1e-8)
            x_scale = x_amax / 127.0
        x_q = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)
        y = lax.conv_general_dilated(
            x_q, w_q, window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)), dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (x_scale * p["w_scale"].astype(jnp.float32))
        if "b" in p:
            y = y + p["b"].astype(jnp.float32)
        if act:
            y = jax.nn.silu(y)
        return y.astype(dtype)
    w = p["w"].astype(dtype)
    k = w.shape[0]
    pad = (k - 1) // 2
    if accum_f32 and dtype != jnp.float32:
        # Serving fast path: conv, bias and SiLU all in the compute dtype
        # (the MXU still accumulates f32 internally). Measured ~19% faster
        # than widening to f32 tails at batch 64 on v5e, with ~1.5e-4 output
        # difference — far inside the 1e-3 parity gate.
        if dot1x1 and k == 1 and stride == 1:
            y = lax.dot_general(x, w[0, 0], (((3,), (0,)), ((), ())))
        else:
            y = lax.conv_general_dilated(
                x, w, window_strides=(stride, stride),
                padding=((pad, pad), (pad, pad)),
                dimension_numbers=_DN,
            )
        if "b" in p:
            y = y + p["b"].astype(dtype)
        if "bn" in p:
            bn = p["bn"]
            scale = (bn["gamma"] * lax.rsqrt(bn["var"] + BN_EPS)).astype(dtype)
            y = (y - bn["mean"].astype(dtype)) * scale + bn["beta"].astype(dtype)
        if act:
            y = jax.nn.silu(y)
        return y
    # Training / f32 path: output stays in the compute dtype (a widened
    # preferred_element_type would break the conv transpose rule under
    # autodiff); the f32 tail still fuses.
    y = lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=_DN,
    ).astype(jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    if "bn" in p:
        # Unfolded checkpoints: BN with running stats (eval-mode / frozen-BN
        # fine-tuning). Serving always runs on folded params.
        bn = p["bn"]
        scale = bn["gamma"] * lax.rsqrt(bn["var"] + BN_EPS)
        y = (y - bn["mean"]) * scale + bn["beta"]
    if act:
        y = jax.nn.silu(y)
    return y.astype(dtype)


def _bottleneck(p: Params, x: jnp.ndarray, shortcut: bool, cv) -> jnp.ndarray:
    y = cv(p["cv2"], cv(p["cv1"], x))
    return x + y if shortcut else y


def _c2f(p: Params, x: jnp.ndarray, shortcut: bool, cv,
         split: bool = False) -> jnp.ndarray:
    """C2f block. split=True (tpu.c2f="split", serving-layout experiment)
    avoids the channel slice and concat: cv1 runs as two half-width convs and
    cv2 as a sum of per-piece 1x1 convs — identical contractions on weight
    slices, so the math matches up to bf16 partial-sum rounding. Falls back
    to the slice/concat form for unfolded (bn) or int8 (w_q) params."""
    cv1, cv2 = p["cv1"], p["cv2"]

    def plain(q):
        return "bn" not in q and "w_q" not in q and "b" in q

    if split and plain(cv1):
        w, b = cv1["w"], cv1["b"]
        c = w.shape[-1] // 2
        ys = [cv({"w": w[..., :c], "b": b[:c]}, x),
              cv({"w": w[..., c:], "b": b[c:]}, x)]
    else:
        y = cv(cv1, x)
        c = y.shape[-1] // 2
        ys = [y[..., :c], y[..., c:]]
    for mp in p["m"]:
        ys.append(_bottleneck(mp, ys[-1], shortcut, cv))
    if split and plain(cv2) and cv2["w"].shape[0] == 1:
        w2 = cv2["w"]
        acc = None
        for i, yi in enumerate(ys):
            part = cv({"w": w2[:, :, i * c:(i + 1) * c]}, yi, act=False)
            acc = part if acc is None else acc + part
        acc = acc + cv2["b"].astype(acc.dtype)
        return jax.nn.silu(acc)
    return cv(cv2, jnp.concatenate(ys, axis=-1))


def _maxpool5(x: jnp.ndarray) -> jnp.ndarray:
    """5x5 stride-1 SAME max pool as an elementwise max of shifted views.

    Equivalent to lax.reduce_window(..., lax.max, (1,5,5,1)); written this way
    because reduce_window fails to linearize under jit(grad(...)) in current
    JAX, and SPPF maps are small enough that the fused maximum chain is cheap.
    Separable: 5x1 then 1x5 (8 maximums instead of 24).
    """
    neg = jnp.array(-jnp.inf, x.dtype)
    h, w = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)), constant_values=neg)
    y = xp[:, 0:h]
    for i in range(1, 5):
        y = jnp.maximum(y, xp[:, i:i + h])
    yp = jnp.pad(y, ((0, 0), (0, 0), (2, 2), (0, 0)), constant_values=neg)
    out = yp[:, :, 0:w]
    for j in range(1, 5):
        out = jnp.maximum(out, yp[:, :, j:j + w])
    return out


def _sppf(p: Params, x: jnp.ndarray, cv) -> jnp.ndarray:
    y = cv(p["cv1"], x)
    pools = [y]
    for _ in range(3):
        pools.append(_maxpool5(pools[-1]))
    return cv(p["cv2"], jnp.concatenate(pools, axis=-1))


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def _stem_s2d_weights(w: jnp.ndarray) -> jnp.ndarray:
    """Scatter the k3 s2 stem kernel (3, 3, 3, Co) into the equivalent
    k2 s1 kernel (2, 2, 12, Co) over space-to-depth input.

    With z[p, q, a*6+b*3+c] = x[2p+a, 2q+b, c] (a, b in {0,1}), the stride-2
    tap x[2i+di-1] maps to kernel position/offset (kp, a) = (0,1), (1,0),
    (1,1) for di = 0, 1, 2 — position (0, 0) never contributes and stays
    zero. The conv then runs at half spatial size with a 48-deep contraction
    instead of 27 taps over a 3-channel input (better MXU occupancy on the
    largest feature map).
    """
    co = w.shape[-1]
    w2 = jnp.zeros((2, 2, 12, co), w.dtype)
    taps = ((0, 1, 0), (1, 0, 1), (1, 1, 2))  # (kernel pos, offset, orig tap)
    for kp, a, di in taps:
        for kq, b, dj in taps:
            ch = a * 6 + b * 3
            w2 = w2.at[kp, kq, ch:ch + 3].set(w[di, dj])
    return w2


def _stem_s2d(p: Params, x: jnp.ndarray, dtype, accum_f32: bool) -> jnp.ndarray:
    """Stem conv over space-to-depth input (B, S/2, S/2, 12) — exact
    equivalent of _conv(m0, letterboxed, stride=2). Asymmetric (1, 0) pad
    reproduces the original SAME pad-1 border zeros. Folded params only:
    unlike _conv this path has no BN branch, so an unfolded (or
    converted, b+bn-carrying) stem would either KeyError mid-trace or
    silently skip the BN transform — fail loudly instead (review r5)."""
    if "bn" in p or "b" not in p:
        raise ValueError(
            "stem='s2d' requires BN-folded stem params (w + b, no bn "
            "block) — run fold_batchnorm() on the checkpoint first")
    w2 = _stem_s2d_weights(p["w"]).astype(dtype)
    xp = x.astype(dtype)
    if accum_f32 and dtype != jnp.float32:
        y = lax.conv_general_dilated(
            xp, w2, window_strides=(1, 1), padding=((1, 0), (1, 0)),
            dimension_numbers=_DN)
        y = y + p["b"].astype(dtype)
        return jax.nn.silu(y)
    y = lax.conv_general_dilated(
        xp, w2, window_strides=(1, 1), padding=((1, 0), (1, 0)),
        dimension_numbers=_DN).astype(jnp.float32)
    y = y + p["b"].astype(jnp.float32)
    return jax.nn.silu(y).astype(dtype)


def apply_backbone(params: Params, x: jnp.ndarray, dtype=jnp.float32,
                   accum_f32: bool = True, conv_fn=None,
                   stem: str = "conv", dot1x1: bool = False,
                   c2f: str = "slice"
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Backbone + neck. x: (B, H, W, 3) float in [0,1] — or, with
    stem="s2d", the space-to-depth form (B, H/2, W/2, 12) produced by
    preprocess.letterbox_batch_mxu_s2d. Returns (P3, P4, P5).

    conv_fn: optional _conv replacement (same signature) — the injection
    hook quant calibration uses to record per-conv input ranges without
    mutating module state.
    """
    cv = partial(conv_fn or _conv, dtype=dtype, accum_f32=accum_f32,
                 dot1x1=dot1x1)
    c2 = partial(_c2f, split=(c2f == "split"))
    x = x.astype(dtype)
    if stem == "s2d":
        if "w_q" in params["m0"]:
            raise ValueError("s2d stem incompatible with quantized m0")
        x = _stem_s2d(params["m0"], x, dtype, accum_f32)
    else:
        x = cv(params["m0"], x, stride=2)
    x = cv(params["m1"], x, stride=2)
    x = c2(params["m2"], x, True, cv)
    x = cv(params["m3"], x, stride=2)
    p3_in = c2(params["m4"], x, True, cv)                 # idx 4
    x = cv(params["m5"], p3_in, stride=2)
    p4_in = c2(params["m6"], x, True, cv)                 # idx 6
    x = cv(params["m7"], p4_in, stride=2)
    x = c2(params["m8"], x, True, cv)
    p5_in = _sppf(params["m9"], x, cv)                    # idx 9

    # Top-down
    x = jnp.concatenate([_upsample2x(p5_in), p4_in], axis=-1)   # 10, 11
    n12 = c2(params["m12"], x, False, cv)
    x = jnp.concatenate([_upsample2x(n12), p3_in], axis=-1)     # 13, 14
    p3 = c2(params["m15"], x, False, cv)
    # Bottom-up
    x = jnp.concatenate([cv(params["m16"], p3, stride=2), n12], axis=-1)  # 16, 17
    p4 = c2(params["m18"], x, False, cv)
    x = jnp.concatenate([cv(params["m19"], p4, stride=2), p5_in], axis=-1)  # 19, 20
    p5 = c2(params["m21"], x, False, cv)
    return p3, p4, p5


def forward_raw(params: Params, spec: ModelSpec, x: jnp.ndarray,
                dtype=jnp.float32, accum_f32: bool = True,
                conv_fn=None, stem: str = "conv",
                dot1x1: bool = False, c2f: str = "slice") -> List[jnp.ndarray]:
    """Full forward. Returns per-level (B, Hi, Wi, 4*reg_max + nc) maps in f32.

    accum_f32: True for serving (fused f32 MXU accumulation, ~1.75x),
    False for training (autodiff-safe). Threaded explicitly — concurrent
    traces with different settings are safe (no module-global state).
    conv_fn: optional _conv replacement (see apply_backbone).
    stem/dot1x1/c2f: serving-layout experiments (see _stem_s2d/_conv/_c2f).
    """
    cv = partial(conv_fn or _conv, dtype=dtype, accum_f32=accum_f32,
                 dot1x1=dot1x1)
    feats = apply_backbone(params, x, dtype=dtype, accum_f32=accum_f32,
                           conv_fn=conv_fn, stem=stem, dot1x1=dot1x1,
                           c2f=c2f)
    det = params["m22"]
    outs = []
    for level, f in enumerate(feats):
        box = f
        for i, bp in enumerate(det["cv2"][level]):
            box = cv(bp, box, act=(i < 2))
        cls = f
        for i, cp in enumerate(det["cv3"][level]):
            cls = cv(cp, cls, act=(i < 2))
        outs.append(jnp.concatenate(
            [box.astype(jnp.float32), cls.astype(jnp.float32)], axis=-1))
    return outs


# ---------------------------------------------------------------------------
# Decode (DFL + anchor-free box recovery). The serving path jits
# decode_outputs together with the backbone and NMS into one program.
# ---------------------------------------------------------------------------

def anchors_for(spec: ModelSpec, h: int, w: int, offset: float = 0.5
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Anchor centers (A, 2) in feature-grid units and per-anchor stride (A, 1)."""
    pts, strides = [], []
    for s in spec.strides:
        gh, gw = h // s, w // s
        xs = np.arange(gw, dtype=np.float32) + offset
        ys = np.arange(gh, dtype=np.float32) + offset
        gx, gy = np.meshgrid(xs, ys)
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
        strides.append(np.full((gh * gw, 1), s, dtype=np.float32))
    return np.concatenate(pts, 0), np.concatenate(strides, 0)


def decode_output_levels(spec: ModelSpec, outs: Sequence[jnp.ndarray]
                         ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Per-level decode: lists of boxes (B, A_l, 4) and probs (B, A_l, nc).

    The level-separated form feeds ops/nms.postprocess_batch_levels, which
    selects pre-NMS candidates per level BEFORE any cross-level concat —
    the full-anchor (B, 3549, ...) concats in `decode_outputs` cost ~0.3
    ms/step of pure layout copies at batch 16 (XPlane, v5e).
    """
    reg_max, nc = spec.reg_max, spec.num_classes
    b = outs[0].shape[0]
    # Decode PER LEVEL in the conv output layout, then flatten: the (B, A, C)
    # flatten forces a layout transpose, and doing it on the raw 4*reg_max+nc
    # (=68) channel maps cost ~0.5 ms/step of pure copy at batch 64 (XPlane:
    # copy.200/201). Decoding first shrinks the transposed tensor to 4+nc
    # channels (~8.5x fewer bytes). Anchor order (level-major raster) and
    # math are identical to the flatten-first form.
    bin_idx = jnp.arange(reg_max, dtype=jnp.float32)
    boxes_l, probs_l = [], []
    for o, s in zip(outs, spec.strides):
        gh, gw = o.shape[1], o.shape[2]
        bins = o[..., :4 * reg_max].reshape(b, gh, gw, 4, reg_max)
        dist = jnp.sum(jax.nn.softmax(bins, axis=-1) * bin_idx,
                       axis=-1)  # (B, gh, gw, 4) ltrb in grid units
        xs = (jnp.arange(gw, dtype=jnp.float32) + 0.5)[None, None, :]
        ys = (jnp.arange(gh, dtype=jnp.float32) + 0.5)[None, :, None]
        ax = jnp.broadcast_to(xs, (b, gh, gw))
        ay = jnp.broadcast_to(ys, (b, gh, gw))
        lt, rb = dist[..., :2], dist[..., 2:]
        anc = jnp.stack([ax, ay], axis=-1)
        x1y1 = anc - lt
        x2y2 = anc + rb
        cxy = (x1y1 + x2y2) / 2.0
        wh = x2y2 - x1y1
        boxes_l.append((jnp.concatenate([cxy, wh], axis=-1) * float(s))
                       .reshape(b, gh * gw, 4))
        probs_l.append(jax.nn.sigmoid(o[..., 4 * reg_max:])
                       .reshape(b, gh * gw, nc))
    return boxes_l, probs_l


def decode_outputs(spec: ModelSpec,
                   outs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Decode raw level maps to (B, A, 4 + nc): xywh in input pixels + class probs.

    Matches the ONNX-exported YOLOv8 head: DFL softmax expectation over reg_max
    bins -> ltrb distances, dist2bbox around anchor centers, × stride; class
    scores are sigmoid probabilities.
    """
    boxes_l, probs_l = decode_output_levels(spec, outs)
    return jnp.concatenate([jnp.concatenate(boxes_l, axis=1),
                            jnp.concatenate(probs_l, axis=1)], axis=-1)


def forward_decoded(params: Params, spec: ModelSpec, x: jnp.ndarray,
                    dtype=jnp.float32, accum_f32: bool = True,
                    stem: str = "conv", dot1x1: bool = False,
                    conv_fn=None, c2f: str = "slice") -> jnp.ndarray:
    """(B, A, 4+nc) decoded output — the ONNX `output0` equivalent (transposed)."""
    outs = forward_raw(params, spec, x, dtype=dtype, accum_f32=accum_f32,
                       stem=stem, dot1x1=dot1x1, conv_fn=conv_fn, c2f=c2f)
    return decode_outputs(spec, outs)


def forward_decoded_levels(params: Params, spec: ModelSpec, x: jnp.ndarray,
                           dtype=jnp.float32, accum_f32: bool = True,
                           stem: str = "conv", dot1x1: bool = False,
                           conv_fn=None, c2f: str = "slice"
                           ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Level-separated decoded output (boxes_l, probs_l) — feeds the
    per-level candidate selection (ops/nms.postprocess_batch_levels)."""
    outs = forward_raw(params, spec, x, dtype=dtype, accum_f32=accum_f32,
                       stem=stem, dot1x1=dot1x1, conv_fn=conv_fn, c2f=c2f)
    return decode_output_levels(spec, outs)
