"""YOLOv8 detection loss (anchor-free, DFL) — fine-tuning support.

The reference is inference-only (models come from ultralytics' exporter,
start.sh:113-149); this framework adds native fine-tuning so deployed models
(e.g. the 4-class cs16 set) can be trained/adapted on TPU.

Components (following the YOLOv8 formulation):
- **assignment**: center-prior positive selection — an anchor is positive for
  a GT box when its center lies inside the box *and* inside a radius of
  `center_radius × stride` around the GT center, at the level whose stride
  matches the box scale; an anchor claimed by several GTs goes to the
  smallest-area one. (A deliberate, documented simplification of ultralytics'
  task-aligned assigner: fully vectorized, shape-static, jit/pjit-friendly.)
- **cls**: BCE on class logits over all anchors (positives get one-hot).
- **box**: CIoU loss at positive anchors.
- **dfl**: distribution focal loss on the ltrb bin distributions.

All fixed shapes: targets are (B, M, 5) [class, cx, cy, w, h] in [0,1],
padded with class = -1.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.yolov8 import ModelSpec, anchors_for


def _pairwise_ciou(box1: jnp.ndarray, box2: jnp.ndarray) -> jnp.ndarray:
    """CIoU between matched (N, 4) center-format boxes -> (N,)."""
    eps = 1e-9
    b1x1, b1y1 = box1[:, 0] - box1[:, 2] / 2, box1[:, 1] - box1[:, 3] / 2
    b1x2, b1y2 = box1[:, 0] + box1[:, 2] / 2, box1[:, 1] + box1[:, 3] / 2
    b2x1, b2y1 = box2[:, 0] - box2[:, 2] / 2, box2[:, 1] - box2[:, 3] / 2
    b2x2, b2y2 = box2[:, 0] + box2[:, 2] / 2, box2[:, 1] + box2[:, 3] / 2
    iw = jnp.maximum(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0)
    ih = jnp.maximum(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0)
    inter = iw * ih
    union = box1[:, 2] * box1[:, 3] + box2[:, 2] * box2[:, 3] - inter + eps
    iou = inter / union
    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    c2 = cw ** 2 + ch ** 2 + eps
    rho2 = ((box1[:, 0] - box2[:, 0]) ** 2 + (box1[:, 1] - box2[:, 1]) ** 2)
    v = (4 / np.pi ** 2) * (jnp.arctan(box2[:, 2] / (box2[:, 3] + eps)) -
                            jnp.arctan(box1[:, 2] / (box1[:, 3] + eps))) ** 2
    alpha = v / (v - iou + 1 + eps)
    alpha = jax.lax.stop_gradient(alpha)
    return iou - rho2 / c2 - alpha * v


def detection_loss(spec: ModelSpec, outs: Sequence[jnp.ndarray],
                   targets: jnp.ndarray, input_hw: Tuple[int, int],
                   center_radius: float = 2.5,
                   w_box: float = 7.5, w_cls: float = 0.5, w_dfl: float = 1.5
                   ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Detection loss over raw per-level maps.

    outs:    list of (B, Hi, Wi, 4*reg_max + nc) from forward_raw
    targets: (B, M, 5) [class, cx, cy, w, h] normalized, class=-1 padding
    """
    reg_max, nc = spec.reg_max, spec.num_classes
    h_in, w_in = input_hw
    b = outs[0].shape[0]
    flat = jnp.concatenate(
        [o.reshape(b, -1, 4 * reg_max + nc) for o in outs], axis=1)
    box_logits = flat[..., :4 * reg_max]            # (B, A, 64)
    cls_logits = flat[..., 4 * reg_max:]            # (B, A, nc)
    anchors_np, strides_np = anchors_for(spec, h_in, w_in)
    anchors = jnp.asarray(anchors_np)               # (A, 2) grid units
    strides = jnp.asarray(strides_np)[:, 0]         # (A,)
    a = anchors.shape[0]
    anchor_px = anchors * strides[:, None]          # centers in input px

    gt_cls = targets[..., 0]                        # (B, M)
    gt_box_px = targets[..., 1:] * jnp.array(
        [w_in, h_in, w_in, h_in], jnp.float32)      # (B, M, 4) cxcywh px
    gt_valid = gt_cls >= 0                          # (B, M)

    # ---------------- assignment: (B, A, M) positive mask ----------------
    ax = anchor_px[None, :, None, 0]
    ay = anchor_px[None, :, None, 1]
    gx = gt_box_px[:, None, :, 0]
    gy = gt_box_px[:, None, :, 1]
    gw = gt_box_px[:, None, :, 2]
    gh = gt_box_px[:, None, :, 3]
    inside = ((ax > gx - gw / 2) & (ax < gx + gw / 2) &
              (ay > gy - gh / 2) & (ay < gy + gh / 2))
    radius = center_radius * strides[None, :, None]
    near = (jnp.abs(ax - gx) < radius) & (jnp.abs(ay - gy) < radius)
    pos = inside & near & gt_valid[:, None, :]      # (B, A, M)

    # Resolve conflicts: anchor goes to the smallest-area GT claiming it.
    area = (gw * gh)
    area = jnp.where(pos, area, jnp.inf)
    best_gt = jnp.argmin(area, axis=-1)             # (B, A)
    is_pos = jnp.any(pos, axis=-1)                  # (B, A)

    m_box = jax.vmap(lambda g, idx: g[idx])(gt_box_px, best_gt)  # (B, A, 4)
    m_cls = jax.vmap(lambda g, idx: g[idx])(gt_cls, best_gt)     # (B, A)

    num_pos = jnp.maximum(jnp.sum(is_pos.astype(jnp.float32)), 1.0)

    # ----------------------------- cls loss ------------------------------
    one_hot = jax.nn.one_hot(m_cls.astype(jnp.int32), nc) * is_pos[..., None]
    cls_loss = jnp.sum(
        _bce_logits(cls_logits, one_hot)) / num_pos

    # ----------------------------- box loss ------------------------------
    # Decode predicted boxes at positives (DFL expectation, px units).
    probs = jax.nn.softmax(box_logits.reshape(b, a, 4, reg_max), axis=-1)
    dist = jnp.sum(probs * jnp.arange(reg_max, dtype=jnp.float32), axis=-1)
    lt, rb = dist[..., :2], dist[..., 2:]
    x1y1 = anchors[None] - lt
    x2y2 = anchors[None] + rb
    pred_box_px = jnp.concatenate(
        [(x1y1 + x2y2) / 2, x2y2 - x1y1], axis=-1) * strides[None, :, None]
    w_pos = is_pos.astype(jnp.float32)
    ciou = _pairwise_ciou(pred_box_px.reshape(-1, 4), m_box.reshape(-1, 4))
    box_loss = jnp.sum((1.0 - ciou) * w_pos.reshape(-1)) / num_pos

    # ----------------------------- dfl loss ------------------------------
    # Target ltrb distances in grid units, clipped to [0, reg_max-1].
    gxy = m_box[..., :2] / strides[None, :, None]
    gwh = m_box[..., 2:] / strides[None, :, None]
    tlt = anchors[None] - (gxy - gwh / 2)
    trb = (gxy + gwh / 2) - anchors[None]
    tdist = jnp.clip(jnp.concatenate([tlt, trb], axis=-1), 0, reg_max - 1 - 1e-3)
    tl = jnp.floor(tdist)
    wr = tdist - tl
    wl = 1.0 - wr
    logp = jax.nn.log_softmax(box_logits.reshape(b, a, 4, reg_max), axis=-1)
    tl_i = tl.astype(jnp.int32)
    lp_l = jnp.take_along_axis(logp, tl_i[..., None], axis=-1)[..., 0]
    lp_r = jnp.take_along_axis(
        logp, jnp.minimum(tl_i + 1, reg_max - 1)[..., None], axis=-1)[..., 0]
    dfl = -(wl * lp_l + wr * lp_r)                  # (B, A, 4)
    dfl_loss = jnp.sum(jnp.mean(dfl, axis=-1) * w_pos) / num_pos

    total = w_box * box_loss + w_cls * cls_loss + w_dfl * dfl_loss
    return total, {"box": box_loss, "cls": cls_loss, "dfl": dfl_loss,
                   "num_pos": num_pos}


def _bce_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
