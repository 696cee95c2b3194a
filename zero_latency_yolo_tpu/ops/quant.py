"""int8 weight quantization for the conv backbone (BASELINE config 5).

AQT-style static symmetric per-output-channel weight quantization; activations
are quantized dynamically per tensor inside the jitted step. The int8 x int8
convolution accumulates in int32 on the MXU (v5e int8 peak is ~2x bf16) and
dequantizes into the f32 bias/SiLU tail.

The detect head (m22) and the stem (m0, 3 input channels, negligible FLOPs,
accuracy-sensitive) stay in bf16; only backbone/neck convs quantize.

The quantized parameterization replaces a conv's {w, b} with
{w_q int8 (H,W,I,O), w_scale f32 (O,), b f32}; models/yolov8._conv dispatches
on the presence of "w_q".
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

Params = Dict[str, Any]

SKIP_KEYS = ("m22", "m0")  # head + stem stay high precision


def quantize_conv(p: Params) -> Params:
    """{w, b} -> {w_q, w_scale, b}; per-output-channel symmetric int8."""
    w = jnp.asarray(p["w"], jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True)  # (1,1,1,O)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out: Params = {"w_q": w_q, "w_scale": scale[0, 0, 0]}
    if "b" in p:
        out["b"] = jnp.asarray(p["b"], jnp.float32)
    return out


def quantize_params(params: Params) -> Params:
    """Quantize all folded conv blocks except SKIP_KEYS subtrees."""
    def walk(node, top: str):
        if isinstance(node, dict):
            if "w" in node and "bn" not in node and node["w"].ndim == 4:
                if top in SKIP_KEYS:
                    return node
                return quantize_conv(node)
            return {k: walk(v, top if top else k) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, top) for v in node]
        return node

    return {k: walk(v, k) for k, v in params.items()}


def calibrate_activations(qparams: Params, spec, sample_inputs,
                          dtype=None, margin: float = 1.1) -> int:
    """Record per-conv input abs-max on calibration data and attach static
    activation scales, removing the dynamic per-conv reduction from the
    serving step (measured: dynamic quant made int8 *slower* than bf16).

    qparams: quantized pytree (quantize_params output) — mutated in place:
    each int8 conv block gains an "x_scale" scalar.
    sample_inputs: (B, S, S, 3) float inputs (post-letterbox).
    Runs the forward eagerly (no jit) with a recording conv wrapper keyed by
    block identity. Returns the number of calibrated convs.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ..models import yolov8 as _y

    # Collect per-conv input maxima *functionally*: the recording wrapper
    # appends tracers during the single jit trace and the wrapped function
    # returns them, so calibration runs as one compiled program (eager per-op
    # dispatch would be unusable through a remote TPU link). Injected via
    # forward_raw's conv_fn hook — no module-global mutation, so concurrent
    # traces elsewhere are unaffected.
    block_ids = []
    maxima = []

    def recording_conv(p, x, stride=1, act=True, dtype=jnp.float32, **kw):
        if "w_q" in p:
            block_ids.append(id(p))
            maxima.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
        return _y._conv(p, x, stride=stride, act=act, dtype=dtype, **kw)

    def calib_fn(x):
        block_ids.clear()
        maxima.clear()
        _y.forward_raw(qparams, spec, x, dtype=dtype or jnp.float32,
                       conv_fn=recording_conv)
        return tuple(maxima)

    vals = jax.jit(calib_fn)(jnp.asarray(sample_inputs))
    seen: Dict[int, float] = {
        bid: float(v) for bid, v in zip(block_ids, np.asarray(vals))}

    count = 0

    def attach(node):
        nonlocal count
        if isinstance(node, dict):
            if "w_q" in node and id(node) in seen:
                node["x_scale"] = jnp.float32(
                    max(seen[id(node)], 1e-6) * margin / 127.0)
                count += 1
                return
            for v in node.values():
                attach(v)
        elif isinstance(node, list):
            for v in node:
                attach(v)

    attach(qparams)
    return count


def dequantize_params(params: Params) -> Params:
    """Inverse (for testing): {w_q, w_scale, b} -> {w, b}."""
    def walk(node):
        if isinstance(node, dict):
            if "w_q" in node:
                out = {"w": node["w_q"].astype(jnp.float32) * node["w_scale"]}
                if "b" in node:
                    out["b"] = node["b"]
                return out
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node
    return walk(params)
