"""Pallas TPU kernel: 1x1 conv AS A MATMUL with the bias+SiLU epilogue
fused in the same kernel (opt-in tpu.conv1x1="pallas").

Why this shape of the lever: the batch-32 XPlane trace at HEAD
(docs/BENCH_NOTES round-3 final) shows elementwise tails at 1.86 ms of a
5.65 ms step (32%) — each conv's bias+SiLU runs as a separate XLA fusion
that re-reads the conv output from HBM. The epilogue-only Pallas kernel
(ops/act_pallas.py) measured 2-4x WORSE because ~60 standalone custom
calls fence XLA's cross-op fusion while still paying the extra HBM round
trip. The fix that note prescribes is fusing the epilogue INTO the conv's
output write — which for the k=1 s=1 convs (C2f cv1/cv2, SPPF cv1/cv2,
detect-head tips: roughly half of YOLOv8's convs) means reimplementing
the conv as the matmul it is:

    y[m, n] = silu( sum_k x[m, k] w[k, n] + b[n] ),   m = (b, h, w) flat

One kernel = one HBM read of x, one write of y; the MXU contraction and
the VPU epilogue share the f32 accumulator in VMEM (registers), so the
SiLU is genuinely free of memory traffic. Non-1x1 convs, quantized
blocks, unfolded BN, and training (autodiff needs the XLA form) all fall
through to the stock path.

MEASURED NEGATIVE RESULT on v5e (round 3, docs/BENCH_NOTES "conv1x1"
section): the kernel compiles through the relay, runs on-chip, and is
exact — and the full serving step REGRESSES with it: batch 16
4.69->5.61 ms (+19%), batch 32 5.66->8.33 ms (+47%), batch 64
7.68->13.7 ms (+79%), drift sentinels within 3%. With the epilogue
genuinely fused, the remaining loss is structural: (a) YOLOv8's 1x1
contractions are small (Cin 16-64 for most C2f blocks), so the (bm, Cin)
operand blocks fill at most half the 128-lane dim the MXU feeds from,
where XLA's conv emitter packs spatial into the tiles; and (b) ~25
custom calls still fence XLA's fusion with their NEIGHBORS (the C2f
concats and adds that previously input-fused into the convs). This
closes the round-3 handoff question — conv+epilogue in ONE kernel was
the last untested form of the SiLU-tail lever, and the XLA tails win.
Kept opt-in (tpu.conv1x1="pallas") as the documented negative result.

Mosaic notes (same constraints as ops/act_pallas.py, learned on v5e):
f32 register math (bf16 sigmoid lowering is rejected), bias pre-broadcast
to the full block shape host-side ((1, N) blocks need an in-kernel
sublane broadcast Mosaic rejects for packed dtypes), block dims that
divide the operand shapes exactly.

Reference stage being beaten: src/inference/onnx_engine.cpp:574-586 (ORT
fuses Conv+SiLU on CPU; this is the TPU equivalent for the 1x1 subset).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _mm_bias_silu_kernel(x_ref, w_ref, b_ref, o_ref):
    acc = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    z = acc + b_ref[...]
    o_ref[...] = (z * (1.0 / (1.0 + jnp.exp(-z)))).astype(o_ref.dtype)


def _mm_bias_kernel(x_ref, w_ref, b_ref, o_ref):
    acc = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (acc + b_ref[...]).astype(o_ref.dtype)


def _pick_bm(m: int) -> int:
    """Largest power-of-two row-block <= 512 dividing m exactly (the
    second-minor block dim must be a sublane multiple; exact division
    avoids masked edge blocks). 0 = ineligible, caller falls back."""
    for r in (512, 256, 128, 64, 32, 16, 8):
        if m % r == 0:
            return r
    return 0


def _eligible_c(c: int) -> bool:
    """Channel counts that tile cleanly onto the 128-lane dim: whole
    multiples of 128, or divisors of 128 >= 8 (16..128 in YOLOv8)."""
    return (c % 128 == 0) or (c >= 8 and 128 % c == 0)


def conv1x1_bias_act(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                     act: bool = True, interpret: bool = False):
    """silu(x @ w + b) (or x @ w + b for act=False) over x (B, H, W, Cin),
    w (Cin, Cout), b (Cout,). Returns None when the shapes don't tile
    cleanly — the caller falls back to the stock conv. Runs inside the
    serving step's jit trace; all branching here is on static shapes."""
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    m = bsz * h * wd
    bm = _pick_bm(m)
    if bm == 0 or not _eligible_c(cin) or not _eligible_c(cout):
        return None
    bn = 128 if cout % 128 == 0 else cout
    flat = x.reshape(m, cin)
    # Bias pre-broadcast to the full (bm, bn) block in f32 (it is added to
    # the f32 accumulator); index map pins every grid step to block (0, j).
    btile = jnp.broadcast_to(b.astype(jnp.float32)[None, :], (bm, cout))
    kernel = _mm_bias_silu_kernel if act else _mm_bias_kernel
    out = pl.pallas_call(
        kernel,
        grid=(m // bm, cout // bn),
        in_specs=[pl.BlockSpec((bm, cin), lambda i, j: (i, 0)),
                  pl.BlockSpec((cin, bn), lambda i, j: (0, j)),
                  pl.BlockSpec((bm, bn), lambda i, j: (0, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, cout), x.dtype),
        interpret=interpret,
    )(flat, w.astype(x.dtype), btile)
    return out.reshape(bsz, h, wd, cout)


def make_mm1x1_conv(interpret: bool = False):
    """_conv replacement (the forward_raw conv_fn hook) routing eligible
    k=1 s=1 folded convs through the fused matmul+bias+SiLU kernel.
    Everything else — k=3, strides, quantized blocks, unfolded BN,
    bias-less tips, the training/autodiff form — falls through to the
    stock implementation."""
    from ..models.yolov8 import _conv

    def cv(p, x, stride=1, act=True, dtype=jnp.float32, accum_f32=True,
           dot1x1=False):
        w = p.get("w")
        if (not accum_f32 or "w_q" in p or "bn" in p or "b" not in p
                or w is None or stride != 1
                or w.shape[0] != 1 or w.shape[1] != 1):
            return _conv(p, x, stride=stride, act=act, dtype=dtype,
                         accum_f32=accum_f32, dot1x1=dot1x1)
        out = conv1x1_bias_act(x.astype(dtype), w[0, 0], p["b"], act=act,
                               interpret=interpret)
        if out is None:
            return _conv(p, x, stride=stride, act=act, dtype=dtype,
                         accum_f32=accum_f32, dot1x1=dot1x1)
        return out

    return cv
