"""Pallas TPU kernel for the conv bias+SiLU epilogue at FULL VPU lanes.

The round-2 XPlane trace (docs/BENCH_NOTES) shows the SiLU tails after each
conv running as standalone XLA elementwise fusions that inherit the conv
output layout: with channel widths 16-64 (most of YOLOv8n) the 128-wide
lane dimension is mostly empty, and the tails cost 2.26 ms/step at batch 64
— 29% of the step (reference stage being beaten:
src/inference/onnx_engine.cpp:574-586, where the activation is fused by
ONNX Runtime on CPU).

This kernel views the SAME activation bytes as (M, 128) — a free reshape,
since the channel dim is minor and every YOLOv8 channel width <= 128
divides 128 — so each vector op uses all 128 lanes regardless of C. The
bias is pre-tiled to the 128-lane pattern (128/C whole channel vectors per
row). One HBM read + one write, compute-dense.

MEASURED NEGATIVE RESULT on v5e (round 3, docs/BENCH_NOTES): the kernel
itself compiles and is correct on-chip (the simple-kernel Pallas path now
works through the relay; only larger programs like the NMS kernel still
hit the remote-compile 500), but the full model REGRESSES 2-4x with it
(batch 32 step 6.44 -> 13.5 ms): ~60 standalone custom calls defeat XLA's
cross-op fusion and pay an extra HBM round trip per conv that the inlined
(lane-starved but fused) XLA tails do not. Beating the SiLU tails needs
the epilogue fused INTO the conv's output write, which Pallas cannot
express without reimplementing the convolution. Kept opt-in
(tpu.act="pallas") as the documented negative result; "auto" stays the
XLA tails. Correctness exercised in interpreter mode on CPU CI
(tests/test_act_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _bias_silu_kernel(y_ref, b_ref, o_ref):
    # f32 register math regardless of the storage dtype: Mosaic's bf16
    # sigmoid lowering emits an f32->bf16 'vector.broadcast' it then
    # rejects (element-type verification), and f32 tails are also the
    # numerically safer form. Loads/stores stay in the storage dtype.
    z = y_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = (z * (1.0 / (1.0 + jnp.exp(-z)))).astype(o_ref.dtype)


def _pick_rows(m: int) -> int:
    """Largest power-of-two block height <= 512 dividing m. TPU lowering
    requires the second-minor block dim to be a multiple of 8 (sublanes);
    returns 0 when none fits (caller falls back to the XLA tail)."""
    for r in (512, 256, 128, 64, 32, 16, 8):
        if m % r == 0:
            return r
    return 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bias_silu(y: jnp.ndarray, b: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """silu(y + b) over (B, H, W, C) with full 128-lane tiles.

    Falls back to the plain XLA form when the flat view can't fill lanes
    exactly (C > 128 or 128 % C != 0) — those layers have full lanes in the
    XLA fusions anyway.
    """
    bsz, h, w, c = y.shape
    total = bsz * h * w * c
    if c > 128 or 128 % c != 0 or total % 128 != 0:
        z = y + b.astype(y.dtype)
        return jax.nn.silu(z)
    m = total // 128
    rows = _pick_rows(m)
    if rows == 0:
        z = y + b.astype(y.dtype)
        return jax.nn.silu(z)
    # Bias pre-broadcast to the FULL block shape on the host side: a
    # (1, 128) bias block needs a sublane broadcast inside the kernel,
    # which Mosaic rejects for packed dtypes on TPU ('vector.broadcast'
    # verification error for bf16). Equal-shape elementwise lowers clean;
    # the block is at most 512x128 (128 KB bf16) in VMEM.
    btile = jnp.broadcast_to(jnp.tile(b.astype(y.dtype), 128 // c),
                             (rows, 128))
    flat = y.reshape(m, 128)
    out = pl.pallas_call(
        _bias_silu_kernel,
        grid=(m // rows,),
        in_specs=[pl.BlockSpec((rows, 128), lambda i: (i, 0)),
                  pl.BlockSpec((rows, 128), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, 128), y.dtype),
        interpret=interpret,
    )(flat, btile)
    return out.reshape(bsz, h, w, c)


def make_flat_act_conv(interpret: bool = False):
    """_conv replacement (the forward_raw conv_fn hook) routing folded-conv
    bias+SiLU epilogues through the flat Pallas kernel; everything else
    (quantized blocks, unfused BN, act=False tips) falls through to the
    stock implementation."""
    from ..models.yolov8 import _conv

    def cv(p, x, stride=1, act=True, dtype=jnp.float32, accum_f32=True,
           dot1x1=False):
        # Serving fast path only: accum_f32=False is the training/autodiff
        # form whose tail must stay f32 (CLAUDE.md invariant) and whose
        # grad can't flow through a pallas_call with no AD rule.
        if (not act or not accum_f32 or "w_q" in p or "bn" in p
                or "b" not in p):
            return _conv(p, x, stride=stride, act=act, dtype=dtype,
                         accum_f32=accum_f32, dot1x1=dot1x1)
        bare = {k: v for k, v in p.items() if k != "b"}
        y = _conv(bare, x, stride=stride, act=False, dtype=dtype,
                  accum_f32=accum_f32, dot1x1=dot1x1)
        return fused_bias_silu(y, b=p["b"], interpret=interpret)

    return cv
