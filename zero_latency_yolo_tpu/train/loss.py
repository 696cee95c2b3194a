"""YOLOv8 detection loss (anchor-free, DFL) — fine-tuning support.

The reference is inference-only (models come from ultralytics' exporter,
start.sh:113-149); this framework adds native fine-tuning so deployed models
(e.g. the 4-class cs16 set) can be trained/adapted on TPU.

Components (following the YOLOv8 formulation):
- **assignment** (two selectable schemes, both fully vectorized,
  shape-static, jit/pjit-friendly):
  - `"tal"`: task-aligned assignment — alignment metric
    t = p_cls^alpha * IoU^beta between each anchor's prediction and each GT,
    top-k candidates per GT among anchors whose center lies inside the box,
    conflicts to the highest-t GT, and *soft* classification targets
    t_norm = t / max_t * max_IoU (the standard YOLOv8 assigner).
  - `"center"` (default): center-prior selection — anchor positive when its center is
    inside the box and within `center_radius × stride` of the GT center;
    conflicts to the smallest-area GT; hard one-hot cls targets.
- **cls**: BCE on class logits over all anchors.
- **box**: CIoU loss at positive anchors (TAL: weighted by t_norm).
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


def _iou_matrix(pred_px: jnp.ndarray, gt_px: jnp.ndarray) -> jnp.ndarray:
    """Plain IoU between all (B, A, 4) predictions and (B, M, 4) GTs, both
    center-format px -> (B, A, M). Used by the TAL alignment metric."""
    eps = 1e-9
    p = pred_px[:, :, None, :]                      # (B, A, 1, 4)
    g = gt_px[:, None, :, :]                        # (B, 1, M, 4)
    px1, py1 = p[..., 0] - p[..., 2] / 2, p[..., 1] - p[..., 3] / 2
    px2, py2 = p[..., 0] + p[..., 2] / 2, p[..., 1] + p[..., 3] / 2
    gx1, gy1 = g[..., 0] - g[..., 2] / 2, g[..., 1] - g[..., 3] / 2
    gx2, gy2 = g[..., 0] + g[..., 2] / 2, g[..., 1] + g[..., 3] / 2
    iw = jnp.maximum(jnp.minimum(px2, gx2) - jnp.maximum(px1, gx1), 0)
    ih = jnp.maximum(jnp.minimum(py2, gy2) - jnp.maximum(py1, gy1), 0)
    inter = iw * ih
    union = (p[..., 2] * p[..., 3] + g[..., 2] * g[..., 3] - inter + eps)
    return inter / union


def detection_loss(spec: ModelSpec, outs: Sequence[jnp.ndarray],
                   targets: jnp.ndarray, input_hw: Tuple[int, int],
                   center_radius: float = 2.5,
                   w_box: float = 7.5, w_cls: float = 0.5, w_dfl: float = 1.5,
                   assigner: str = "center", tal_topk: int = 10,
                   tal_alpha: float = 0.5, tal_beta: float = 6.0
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

    # Decode predicted boxes everywhere (DFL expectation, px units) — used
    # by the box loss and, under TAL, by the alignment metric.
    probs = jax.nn.softmax(box_logits.reshape(b, a, 4, reg_max), axis=-1)
    dist = jnp.sum(probs * jnp.arange(reg_max, dtype=jnp.float32), axis=-1)
    lt, rb = dist[..., :2], dist[..., 2:]
    x1y1 = anchors[None] - lt
    x2y2 = anchors[None] + rb
    pred_box_px = jnp.concatenate(
        [(x1y1 + x2y2) / 2, x2y2 - x1y1], axis=-1) * strides[None, :, None]

    # ---------------- assignment: (B, A, M) positive mask ----------------
    ax = anchor_px[None, :, None, 0]
    ay = anchor_px[None, :, None, 1]
    gx = gt_box_px[:, None, :, 0]
    gy = gt_box_px[:, None, :, 1]
    gw = gt_box_px[:, None, :, 2]
    gh = gt_box_px[:, None, :, 3]
    inside = ((ax > gx - gw / 2) & (ax < gx + gw / 2) &
              (ay > gy - gh / 2) & (ay < gy + gh / 2))

    if assigner == "tal":
        # Task-aligned assignment (the YOLOv8 assigner): alignment metric
        # t = p_cls^alpha * IoU^beta over prediction/GT pairs, top-k anchors
        # per GT among in-box candidates, conflicts to the highest-t GT,
        # soft cls targets t / max_t * max_IoU. Assignment quantities carry
        # no gradient.
        cand = inside & gt_valid[:, None, :]        # (B, A, M)
        cls_prob = jax.nn.sigmoid(
            jax.lax.stop_gradient(cls_logits))      # (B, A, nc)
        gt_idx = jnp.maximum(gt_cls, 0).astype(jnp.int32)  # (B, M)
        p_at_gt = jnp.take_along_axis(
            cls_prob, gt_idx[:, None, :], axis=-1)  # (B, A, M)
        iou = _iou_matrix(jax.lax.stop_gradient(pred_box_px), gt_box_px)
        iou = jnp.maximum(iou, 0.0)
        metric = (p_at_gt ** tal_alpha) * (iou ** tal_beta)
        metric = jnp.where(cand, metric, 0.0)
        # Top-k per GT by threshold against the k-th largest value — static
        # shapes, no scatter; ties may admit a few extra anchors (harmless).
        k = min(tal_topk, a)
        topv = jax.lax.top_k(
            jnp.transpose(metric, (0, 2, 1)), k)[0]  # (B, M, k)
        kth = jnp.transpose(topv[..., -1:], (0, 2, 1))  # (B, 1, M)
        pos = cand & (metric >= kth) & (metric > 1e-12)
        # Conflicts: anchor claimed by several GTs goes to the highest-t one.
        m_masked = jnp.where(pos, metric, -1.0)
        best_gt = jnp.argmax(m_masked, axis=-1)     # (B, A)
        is_pos = jnp.any(pos, axis=-1)              # (B, A)
        # Soft target scores: normalize per GT so its best anchor's target
        # equals that GT's best IoU — over the POST-conflict assignment
        # (ultralytics semantics): a GT whose best anchor was stolen by
        # another GT must normalize by its surviving anchors' values, or
        # crowded-scene GTs train with deflated cls/box targets.
        owner = (jax.nn.one_hot(best_gt, pos.shape[-1], dtype=jnp.bool_)
                 & is_pos[..., None])
        final = pos & owner                          # (B, A, M)
        pos_metric = jnp.where(final, metric, 0.0)
        max_t = jnp.max(pos_metric, axis=1)         # (B, M)
        max_iou = jnp.max(jnp.where(final, iou, 0.0), axis=1)  # (B, M)
        norm = max_iou / (max_t + 1e-9)             # (B, M)
        t_at_anchor = jnp.take_along_axis(
            pos_metric, best_gt[..., None], axis=-1)[..., 0]  # (B, A)
        n_at_anchor = jnp.take_along_axis(norm, best_gt, axis=1)  # (B, A)
        score = jnp.where(is_pos, t_at_anchor * n_at_anchor, 0.0)  # (B, A)
    elif assigner == "center":
        radius = center_radius * strides[None, :, None]
        near = (jnp.abs(ax - gx) < radius) & (jnp.abs(ay - gy) < radius)
        pos = inside & near & gt_valid[:, None, :]  # (B, A, M)
        # Resolve conflicts: anchor goes to the smallest-area GT claiming it.
        area = jnp.where(pos, gw * gh, jnp.inf)
        best_gt = jnp.argmin(area, axis=-1)         # (B, A)
        is_pos = jnp.any(pos, axis=-1)              # (B, A)
        score = is_pos.astype(jnp.float32)
    else:
        raise ValueError(f"unknown assigner {assigner!r}")

    m_box = jnp.take_along_axis(gt_box_px, best_gt[..., None],
                                axis=1)                          # (B, A, 4)
    m_cls = jnp.take_along_axis(gt_cls, best_gt, axis=1)         # (B, A)

    num_pos = jnp.maximum(jnp.sum(is_pos.astype(jnp.float32)), 1.0)
    # Loss normalizer: sum of target scores (TAL) == num_pos for "center".
    score = jax.lax.stop_gradient(score)
    score_sum = jnp.maximum(jnp.sum(score), 1.0)

    # ----------------------------- cls loss ------------------------------
    one_hot = jax.nn.one_hot(m_cls.astype(jnp.int32), nc) * score[..., None]
    cls_loss = jnp.sum(
        _bce_logits(cls_logits, one_hot)) / score_sum

    # ----------------------------- box loss ------------------------------
    w_pos = score
    ciou = _pairwise_ciou(pred_box_px.reshape(-1, 4), m_box.reshape(-1, 4))
    box_loss = jnp.sum((1.0 - ciou) * w_pos.reshape(-1)) / score_sum

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
    dfl_loss = jnp.sum(jnp.mean(dfl, axis=-1) * w_pos) / score_sum

    total = w_box * box_loss + w_cls * cls_loss + w_dfl * dfl_loss
    return total, {"box": box_loss, "cls": cls_loss, "dfl": dfl_loss,
                   "num_pos": num_pos}


def _bce_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def distill_loss(spec: ModelSpec, teacher_outs: Sequence[jnp.ndarray],
                 student_outs: Sequence[jnp.ndarray],
                 temp: float = 2.0, w_cls: float = 1.0, w_box: float = 1.0
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Response-based knowledge distillation over raw per-level head maps.

    The teacher and student share head geometry (reg_max, nc, strides) but
    may differ in width/depth — both emit (B, Hi, Wi, 4*reg_max + nc), so
    the flattened anchor axes align one-to-one. Two terms:

    - **cls**: soft-target BCE at temperature `temp` over ALL anchors (the
      dense-detector form of Hinton logit matching: per-class binary KL up
      to the constant teacher entropy). Background anchors participate —
      the teacher's confidence *suppression* is half of what it knows.
    - **box**: localization distillation (LD, Zheng et al. 2022,
      PAPERS.md): KL between teacher and student DFL bin distributions per
      box side, weighted by the teacher's per-anchor quality
      q = max_c sigmoid(t_cls) — box distributions only carry signal where
      the teacher sees an object.

    Both terms carry the standard temp**2 gradient rescale. Teacher maps
    must already be stop_gradient'ed by the caller (make_train_step does).
    """
    reg_max, nc = spec.reg_max, spec.num_classes
    b = student_outs[0].shape[0]
    eps = 1e-9
    flat_s = jnp.concatenate(
        [o.reshape(b, -1, 4 * reg_max + nc) for o in student_outs], axis=1)
    flat_t = jnp.concatenate(
        [o.reshape(b, -1, 4 * reg_max + nc) for o in teacher_outs], axis=1)
    if flat_s.shape != flat_t.shape:
        raise ValueError(
            f"teacher/student head shapes disagree: {flat_t.shape} vs "
            f"{flat_s.shape} (reg_max/nc/strides must match)")
    a = flat_s.shape[1]
    s_box = flat_s[..., :4 * reg_max].reshape(b, a, 4, reg_max)
    s_cls = flat_s[..., 4 * reg_max:]
    t_box = flat_t[..., :4 * reg_max].reshape(b, a, 4, reg_max)
    t_cls = flat_t[..., 4 * reg_max:]

    # cls: tempered soft targets, mean over anchors x classes.
    p_t = jax.nn.sigmoid(t_cls / temp)
    kd_cls = jnp.mean(_bce_logits(s_cls / temp, p_t)) * temp ** 2

    # box: tempered KL over the reg_max bins, teacher-quality weighted.
    q = jnp.max(jax.nn.sigmoid(t_cls), axis=-1)          # (B, A)
    q_sum = jnp.maximum(jnp.sum(q), 1.0)
    p_tb = jax.nn.softmax(t_box / temp, axis=-1)
    lp_s = jax.nn.log_softmax(s_box / temp, axis=-1)
    kl = jnp.sum(p_tb * (jnp.log(p_tb + eps) - lp_s), axis=-1)  # (B, A, 4)
    kd_box = jnp.sum(jnp.mean(kl, axis=-1) * q) / q_sum * temp ** 2

    total = w_cls * kd_cls + w_box * kd_box
    return total, {"kd_cls": kd_cls, "kd_box": kd_box}
