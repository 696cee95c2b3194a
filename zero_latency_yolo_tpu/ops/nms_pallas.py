"""Pallas TPU kernel for the greedy-NMS suppression scan.

The suppression scan is inherently sequential (each kept box suppresses
lower-ranked same-class overlaps), so as plain XLA it becomes a K-step
fori_loop of tiny vector ops — K kernel dispatches worth of loop overhead.
Here the whole scan runs inside one Pallas kernel with the IoU matrix
resident in VMEM:

    inputs:  iou (K, K) f32, same-class (K, K) int8, valid (1, K) int32,
             threshold (1, 1) f32 in SMEM
    output:  keep (1, K) int32 (Mosaic only lowers 32-bit dynamic scalar
             reads, so the scanned keep mask is int32; the bulky (K, K)
             pairwise inputs stay int8/f32)

K = PRE_NMS_TOPK = 256 -> the IoU tile is 256x256 f32 = 256 KB, well inside
the ~16 MB/core VMEM budget; the fori_loop runs on-core with no dispatch
overhead. Batched via grid=(B,).

Falls back to interpreter mode off-TPU so the same code path is exercised in
CPU CI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _suppress_kernel(thresh_ref, iou_ref, same_ref, valid_ref, keep_ref,
                     sup_ref):
    k = iou_ref.shape[-1]
    thresh = thresh_ref[0, 0]
    sup = (iou_ref[0] > thresh) & (same_ref[0] != 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    # Stage into VMEM scratch: the scan below indexes a *ref* dynamically
    # (supported) — dynamic_slice on computed values is not lowerable on TPU.
    sup_ref[:, :] = (sup & (col > row)).astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, keep_vec):
        # Mosaic cannot lower a dynamic scalar read along the lane dim
        # ('index in dimension 2 must be a multiple of 128'), so slot i's
        # aliveness comes from a one-hot reduction over the loop-carried
        # keep vector instead of keep[i]; the suppression row is a dynamic
        # *sublane* slice, which lowers fine.
        alive = jnp.sum(keep_vec * (lane == i).astype(jnp.int32)) != 0
        row_i = sup_ref[pl.ds(i, 1), :]  # (1, k) dynamic ref slice
        kill = (row_i != 0) & alive
        return keep_vec & jnp.where(kill, 0, 1).astype(jnp.int32)

    keep_ref[0] = jax.lax.fori_loop(0, k, body, valid_ref[0])


@functools.partial(jax.jit, static_argnames=("interpret",))
def greedy_nms_mask_pallas(iou: jnp.ndarray, same_class: jnp.ndarray,
                           valid: jnp.ndarray, iou_thresh: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """Batched suppression scan.

    iou:        (B, K, K) f32 pairwise IoU, rows score-sorted descending
    same_class: (B, K, K) bool
    valid:      (B, K) bool (score above confidence threshold)
    returns     (B, K) bool keep mask (exact greedy NMS semantics)
    """
    b, k, _ = iou.shape
    thresh = jnp.broadcast_to(jnp.asarray(iou_thresh, jnp.float32), (1, 1))
    # Mask vectors carry an extra unit dim: TPU block shapes must have their
    # last two dims tile-aligned or equal to the array dims; (1, 1, k) blocks
    # of a (b, 1, k) array satisfy that for any k.
    valid3 = valid.astype(jnp.int32)[:, None, :]
    keep = pl.pallas_call(
        _suppress_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, k, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.int32),
        scratch_shapes=[pltpu.VMEM((k, k), jnp.int32)],
        interpret=interpret,
    )(thresh, iou, same_class.astype(jnp.int8), valid3)
    return keep[:, 0, :] != 0
