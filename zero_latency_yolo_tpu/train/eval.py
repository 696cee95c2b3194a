"""Detection evaluation: AP@IoU for fine-tuned checkpoints.

The reference has no evaluation tooling at all (models arrive pre-trained);
this closes the train->eval->deploy loop: run the deployed inference path
(forward + decode + class-weighted NMS) over an eval set and score AP per
class with greedy IoU matching (VOC-style, all-point interpolation).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.yolov8 import ModelSpec, forward_decoded
from ..ops import nms as nms_ops
from ..utils.geometry import iou_matrix_cxcywh


def average_precision(scored: List[Tuple[float, bool]], n_gt: int) -> float:
    """All-point-interpolated AP from (score, is_true_positive) pairs."""
    if n_gt == 0:
        return 0.0
    scored = sorted(scored, key=lambda s: -s[0])
    tp = np.cumsum([1.0 if hit else 0.0 for _, hit in scored])
    fp = np.cumsum([0.0 if hit else 1.0 for _, hit in scored])
    recall = tp / n_gt
    precision = tp / np.maximum(tp + fp, 1e-9)
    # precision envelope
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    ap = 0.0
    prev_r = 0.0
    for r, p in zip(recall, precision):
        ap += (r - prev_r) * p
        prev_r = r
    return float(ap)


def _greedy_match(order: np.ndarray, iou: Optional[np.ndarray],
                  scores: np.ndarray, iou_thresh: float
                  ) -> List[Tuple[float, bool]]:
    """Greedy score-ordered matching over a precomputed IoU matrix — the
    matrix and sort order are threshold-independent, so the COCO ladder
    re-runs only this loop per rung."""
    n_gt = 0 if iou is None else iou.shape[1]
    taken = np.zeros(n_gt, bool)
    out: List[Tuple[float, bool]] = []
    for i in order:
        hit = False
        if n_gt:
            j = int(np.argmax(np.where(taken, -1.0, iou[i])))
            if not taken[j] and iou[i, j] >= iou_thresh:
                taken[j] = True
                hit = True
        out.append((float(scores[i]), hit))
    return out


def match_detections(pred_boxes: np.ndarray, pred_scores: np.ndarray,
                     gt_boxes: np.ndarray, iou_thresh: float = 0.5
                     ) -> List[Tuple[float, bool]]:
    """Greedy score-ordered matching of one image's single-class detections."""
    order = np.argsort(-pred_scores)
    iou = (iou_matrix_cxcywh(pred_boxes, gt_boxes)
           if len(gt_boxes) else None)
    return _greedy_match(order, iou, pred_scores, iou_thresh)


COCO_IOU_LADDER = tuple(round(0.5 + 0.05 * i, 2) for i in range(10))


@partial(jax.jit, static_argnames=("spec", "size", "dtype", "topk"))
def _eval_forward(params, x, cw, conf, nms, *, spec: ModelSpec, size: int,
                  dtype, topk: Optional[int]):
    """Module-level jitted eval step with params as an ARGUMENT: a closure
    jitted inside evaluate() baked the weights in as compile-time constants
    and recompiled on every call — the compare scripts call evaluate once
    per checkpoint, paying a full (relayed) recompile each time."""
    pred = forward_decoded(params, spec, x, dtype=dtype)
    b = x.shape[0]
    scale = jnp.ones((b,), jnp.float32)
    pad = jnp.zeros((b, 2), jnp.float32)
    wh = jnp.full((b, 2), float(size), jnp.float32)
    kw = {} if topk is None else {"topk": int(topk)}
    return nms_ops.postprocess_batch(pred, cw, conf, nms, scale, pad, wh,
                                     **kw)


def evaluate(params, spec: ModelSpec, images: np.ndarray, targets: np.ndarray,
             conf_thresh: float = 0.25, nms_thresh: float = 0.45,
             iou_thresh: float = 0.5, batch: int = 8,
             class_weights: Optional[np.ndarray] = None,
             dtype=jnp.float32,
             topk: Optional[int] = None) -> Dict[str, float]:
    """AP over an eval set: the primary threshold plus the COCO IoU ladder.

    images:  (N, S, S, 3) float in [0,1] (already letterboxed/square)
    targets: (N, M, 5) [class, cx, cy, w, h] normalized, class=-1 padding
    Returns {"mAP": AP@iou_thresh (back-compat key), "mAP50_95": COCO-style
    mean over IoU 0.50:0.95:0.05, "AP/<cls>": per-class @iou_thresh,
    "recall": ..., "num_gt": ...}. Inference runs ONCE; the extra ladder
    points only re-run the host-side greedy matcher.
    """
    n, s = images.shape[0], images.shape[1]
    nc = spec.num_classes
    cw = jnp.asarray(class_weights if class_weights is not None
                     else np.ones(nc), jnp.float32)

    def run(x):
        return _eval_forward(params, x, cw, jnp.float32(conf_thresh),
                             jnp.float32(nms_thresh), spec=spec, size=int(s),
                             dtype=dtype, topk=topk)

    ladder = tuple(sorted({float(iou_thresh), *COCO_IOU_LADDER}))
    per_class: Dict[float, Dict[int, List[Tuple[float, bool]]]] = {
        t: {c: [] for c in range(nc)} for t in ladder}
    gt_count = {c: 0 for c in range(nc)}
    matched_total = 0
    for i0 in range(0, n, batch):
        chunk = images[i0:i0 + batch]
        pad_n = batch - len(chunk)
        if pad_n:
            chunk = np.concatenate([chunk, np.zeros((pad_n,) + chunk.shape[1:],
                                                    chunk.dtype)])
        out = run(jnp.asarray(chunk))
        boxes = np.asarray(out["boxes"])
        scores = np.asarray(out["scores"])
        classes = np.asarray(out["classes"])
        counts = np.asarray(out["count"])
        for bi in range(len(images[i0:i0 + batch])):
            t = targets[i0 + bi]
            valid = t[:, 0] >= 0
            for c in range(nc):
                gt_c = t[valid & (t[:, 0] == c)][:, 1:]
                gt_count[c] += len(gt_c)
                k = int(counts[bi])
                sel = classes[bi, :k] == c
                pb, ps = boxes[bi, :k][sel], scores[bi, :k][sel]
                order = np.argsort(-ps)
                iou = (iou_matrix_cxcywh(pb, gt_c)
                       if len(gt_c) else None)
                for thr in ladder:
                    res = _greedy_match(order, iou, ps, thr)
                    if thr == iou_thresh:
                        matched_total += sum(1 for _, hit in res if hit)
                    per_class[thr][c].extend(res)

    def _map_at(thr: float) -> Dict[int, float]:
        return {c: average_precision(per_class[thr][c], gt_count[c])
                for c in range(nc) if gt_count[c] > 0}

    aps = _map_at(iou_thresh)
    coco = ([float(np.mean(list(_map_at(t).values())))
             for t in COCO_IOU_LADDER] if any(gt_count.values()) else [])
    total_gt = sum(gt_count.values())
    return {
        "mAP": float(np.mean(list(aps.values()))) if aps else 0.0,
        "mAP50_95": float(np.mean(coco)) if coco else 0.0,
        **{f"AP/{c}": ap for c, ap in aps.items()},
        "recall": matched_total / total_gt if total_gt else 0.0,
        "num_gt": total_gt,
    }
