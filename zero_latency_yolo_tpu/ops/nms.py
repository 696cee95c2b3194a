"""Fused detection postprocess: class weighting, threshold, greedy NMS, un-letterbox.

TPU-native redesign of the reference postprocess + NMS
(src/inference/onnx_engine.cpp:758-878): data-dependent loops become
fixed-shape top-k + an iterative suppression scan, so the whole stage jits
into the same XLA program as the backbone.

Semantics matched to the reference:
- per-anchor argmax class, threshold at conf (onnx_engine.cpp:787-799);
- greedy same-class suppression at IoU > nms_threshold on center-format
  boxes (:837-909), equivalent to per-class greedy NMS by confidence;
- boxes emitted center-format, normalized to *source frame* dims (:802-805).

Upgrades over the reference:
- `class_weights` (config detection.class_weights) actually multiply scores
  before threshold/NMS — the reference parsed but never applied them
  (SURVEY §2.3);
- un-letterboxing maps model-input boxes back through (scale, pad) to source
  pixels before normalizing.

Output is fixed-shape (MAX_DET, ...) per frame + a valid mask: ready for a
single small D2H copy.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_DET = 32       # reference MAX_DETECTION_COUNT (src/common/constants.h:18)
PRE_NMS_TOPK = 256


def _iou_matrix_center(boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of (K, 4) center-format boxes."""
    cx, cy, w, h = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    x1, y1 = cx - w / 2, cy - h / 2
    x2, y2 = cx + w / 2, cy + h / 2
    area = jnp.maximum(w, 0) * jnp.maximum(h, 0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    iw = jnp.maximum(ix2 - ix1, 0)
    ih = jnp.maximum(iy2 - iy1, 0)
    inter = iw * ih
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def _greedy_nms_mask(iou: jnp.ndarray, same_class: jnp.ndarray,
                     valid: jnp.ndarray, iou_thresh: float) -> jnp.ndarray:
    """Sequential greedy suppression over score-sorted slots.

    keep[i] survives iff no higher-ranked kept box of the same class overlaps
    it above the threshold — exact greedy NMS, expressed as a fori_loop of
    vector ops (K steps of O(K) work; K = PRE_NMS_TOPK).
    """
    k = iou.shape[0]
    idx = jnp.arange(k)
    suppress_pair = (iou > iou_thresh) & same_class & (idx[None, :] > idx[:, None])

    def body(i, keep):
        row = suppress_pair[i] & keep[i]
        return keep & ~row

    # unroll: the loop body is tiny, so per-iteration while-loop overhead
    # dominates the scan on TPU; unrolling amortizes it 8x.
    return jax.lax.fori_loop(0, k, body, valid, unroll=8)


def _rank_candidates(boxes: jnp.ndarray, probs: jnp.ndarray,
                     class_weights: jnp.ndarray, conf_thresh, topk: int):
    """Stage-1 core (per frame): weight, threshold, top-k ranking over one
    anchor set — (A, 4) boxes + (A, nc) probs. The SINGLE definition of the
    candidate semantics (class_weights multiply, >= threshold, sentinel
    -1.0, score > 0 = valid); both the concat and perlevel selection paths
    call this so their documented same-kept-set equivalence can't drift."""
    w = probs * class_weights[None, :]
    best_score = jnp.max(w, axis=-1)
    best_class = jnp.argmax(w, axis=-1).astype(jnp.int32)
    ranked = jnp.where(best_score >= conf_thresh, best_score, -1.0)
    top_scores, top_idx = jax.lax.top_k(ranked, topk)
    return boxes[top_idx], top_scores, best_class[top_idx]


def _select_one(pred: jnp.ndarray, class_weights: jnp.ndarray,
                conf_thresh, topk: int):
    """Stage 1 (per frame): weight, threshold, top-k candidate selection."""
    top_boxes, top_scores, top_class = _rank_candidates(
        pred[:, :4], pred[:, 4:], class_weights, conf_thresh, topk)
    return top_boxes, top_scores, top_class, top_scores > 0


def _compact_one(top_boxes, top_scores, top_class, keep,
                 scale, pad_x, pad_y, src_w, src_h) -> Dict[str, jnp.ndarray]:
    """Stage 3 (per frame): compact survivors + un-letterbox + normalize."""
    # Non-kept / overflow entries get slot >= MAX_DET and are dropped by the
    # scatter (mode="drop").
    order = jnp.cumsum(keep.astype(jnp.int32)) - 1
    slot = jnp.where(keep, order, MAX_DET)
    out_boxes = jnp.zeros((MAX_DET, 4), jnp.float32).at[slot].set(
        top_boxes, mode="drop")
    out_scores = jnp.zeros((MAX_DET,), jnp.float32).at[slot].set(
        top_scores, mode="drop")
    out_class = jnp.zeros((MAX_DET,), jnp.int32).at[slot].set(
        top_class, mode="drop")
    n_kept = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), MAX_DET)
    det_valid = jnp.arange(MAX_DET) < n_kept

    # Un-letterbox back to source pixels, normalize to [0,1] of source dims.
    cx = (out_boxes[:, 0] - pad_x) / scale
    cy = (out_boxes[:, 1] - pad_y) / scale
    w = out_boxes[:, 2] / scale
    h = out_boxes[:, 3] / scale
    norm = jnp.stack([
        jnp.clip(cx / src_w, 0.0, 1.0),
        jnp.clip(cy / src_h, 0.0, 1.0),
        jnp.clip(w / src_w, 0.0, 1.0),
        jnp.clip(h / src_h, 0.0, 1.0),
    ], axis=-1)
    norm = jnp.where(det_valid[:, None], norm, 0.0)
    return {
        "boxes": norm,                                   # (MAX_DET, 4) cxcywh [0,1]
        "scores": jnp.where(det_valid, out_scores, 0.0),  # (MAX_DET,)
        "classes": jnp.where(det_valid, out_class, 0),    # (MAX_DET,) int32
        "count": n_kept,                                  # scalar int32
    }


def _nms_and_compact(top_boxes, top_scores, top_class, top_valid,
                     iou_thresh, scale, pad, src_wh,
                     nms_impl: str) -> Dict[str, jnp.ndarray]:
    """Stages 2+3, shared by both selection forms: pairwise IoU, greedy
    suppression, compact + un-letterbox."""
    iou = jax.vmap(_iou_matrix_center)(top_boxes)
    same_class = top_class[:, :, None] == top_class[:, None, :]
    if nms_impl.startswith("pallas"):
        from .nms_pallas import greedy_nms_mask_pallas
        keep = greedy_nms_mask_pallas(
            iou, same_class, top_valid, iou_thresh,
            interpret=(nms_impl == "pallas_interpret"))
    else:
        keep = jax.vmap(
            lambda i, s, v: _greedy_nms_mask(i, s, v, iou_thresh)
        )(iou, same_class, top_valid)

    out = jax.vmap(
        lambda b, sc, c, k, s, pxy, wh: _compact_one(
            b, sc, c, k, s, pxy[0], pxy[1], wh[0], wh[1])
    )(top_boxes, top_scores, top_class, keep, scale, pad, src_wh)
    # Class weights (> 1) boost scores for ranking/threshold, but the score
    # reported on the wire is a confidence — clip so reference-compatible
    # clients never see confidence > 1.
    out["scores"] = jnp.clip(out["scores"], 0.0, 1.0)
    return out


@partial(jax.jit, static_argnums=(7, 8))
def postprocess_batch(pred: jnp.ndarray, class_weights: jnp.ndarray,
                      conf_thresh: jnp.ndarray, iou_thresh: jnp.ndarray,
                      scale: jnp.ndarray, pad: jnp.ndarray,
                      src_wh: jnp.ndarray, topk: int = PRE_NMS_TOPK,
                      nms_impl: str = "xla") -> Dict[str, jnp.ndarray]:
    """Batched postprocess.

    pred:    (B, A, 4+nc) decoded model output (model-input pixel boxes)
    class_weights: (nc,) score multipliers
    conf_thresh / iou_thresh: scalars (runtime values — no recompiles on change)
    scale:   (B,) letterbox scale; pad: (B, 2) = (pad_x, pad_y)
    src_wh:  (B, 2) source frame (w, h) as float
    nms_impl: "xla" (fori_loop scan), "pallas" (VMEM-resident kernel),
              "pallas_interpret" (kernel in interpreter mode, CPU CI)
    """
    topk = min(topk, pred.shape[1])
    top_boxes, top_scores, top_class, top_valid = jax.vmap(
        lambda p: _select_one(p, class_weights, conf_thresh, topk))(pred)
    return _nms_and_compact(top_boxes, top_scores, top_class, top_valid,
                            iou_thresh, scale, pad, src_wh, nms_impl)


@partial(jax.jit, static_argnums=(8, 9))
def postprocess_batch_levels(boxes_l, probs_l, class_weights: jnp.ndarray,
                             conf_thresh: jnp.ndarray, iou_thresh: jnp.ndarray,
                             scale: jnp.ndarray, pad: jnp.ndarray,
                             src_wh: jnp.ndarray, topk: int = PRE_NMS_TOPK,
                             nms_impl: str = "xla") -> Dict[str, jnp.ndarray]:
    """postprocess_batch over level-separated decode (tpu.select="perlevel").

    Candidate selection runs per FPN level BEFORE any cross-level concat:
    top-k(min(topk, A_l)) within each level, then a global top-k over the
    per-level survivors. The kept set is mathematically identical to the
    global top-k over all anchors (the global top-k of a union is contained
    in the union of per-level top-ks); only tie order among equal scores can
    differ. What it buys on TPU: the (B, 3549, 4+nc) concat + full-anchor
    gather — ~0.3 ms/step of layout copies at batch 16 (XPlane, v5e) — is
    replaced by per-level gathers and a (B, ~681) score concat.
    """
    cs, cb, cc = [], [], []
    for bx, pr in zip(boxes_l, probs_l):
        k = min(topk, pr.shape[1])
        b, s, c = jax.vmap(
            lambda bb, pp: _rank_candidates(
                bb, pp, class_weights, conf_thresh, k))(bx, pr)
        cs.append(s)
        cb.append(b)
        cc.append(c)
    scores = jnp.concatenate(cs, axis=1)
    boxes = jnp.concatenate(cb, axis=1)
    classes = jnp.concatenate(cc, axis=1)
    k = min(topk, scores.shape[1])
    top_scores, ti = jax.lax.top_k(scores, k)
    top_boxes = jnp.take_along_axis(boxes, ti[..., None], axis=1)
    top_class = jnp.take_along_axis(classes, ti, axis=1)
    return _nms_and_compact(top_boxes, top_scores, top_class, top_scores > 0,
                            iou_thresh, scale, pad, src_wh, nms_impl)


def pack_outputs(out: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Pack the postprocess dict into ONE f32 array (B, 1 + 6*MAX_DET):
    [count, boxes.flat, scores, classes]. The serving step returns this so a
    batch costs a single small D2H transfer instead of four (at 60+
    batches/sec — and per-readback relay RTT — four transfers are
    measurable). Class ids are small ints, exact in f32."""
    b = out["count"].shape[0]
    return jnp.concatenate([
        out["count"].astype(jnp.float32)[:, None],
        out["boxes"].reshape(b, -1),
        out["scores"],
        out["classes"].astype(jnp.float32),
    ], axis=-1)


def unpack_outputs(arr: np.ndarray) -> Dict[str, np.ndarray]:
    """Host-side inverse of pack_outputs (on the already-read-back array)."""
    b = arr.shape[0]
    boxes_end = 1 + 4 * MAX_DET
    return {
        "count": arr[:, 0].astype(np.int32),
        "boxes": arr[:, 1:boxes_end].reshape(b, MAX_DET, 4),
        "scores": arr[:, boxes_end:boxes_end + MAX_DET],
        "classes": arr[:, boxes_end + MAX_DET:boxes_end + 2 * MAX_DET]
        .astype(np.int32),
    }


# ---------------------------------------------------------------------------
# NumPy reference (test oracle)
# ---------------------------------------------------------------------------

def nms_reference(pred: np.ndarray, class_weights: np.ndarray,
                  conf_thresh: float, iou_thresh: float) -> list:
    """Straightforward per-class greedy NMS in NumPy, mirroring the reference
    C++ (sort by confidence, same-class IoU suppression). Returns a list of
    (box_cxcywh_model_px, score, class_id), score-descending."""
    probs = pred[:, 4:] * class_weights[None, :]
    best = probs.max(axis=1)
    cls = probs.argmax(axis=1)
    sel = best >= conf_thresh
    boxes, scores, classes = pred[sel, :4], best[sel], cls[sel]
    order = np.argsort(-scores, kind="stable")
    boxes, scores, classes = boxes[order], scores[order], classes[order]
    kept = []
    suppressed = np.zeros(len(scores), dtype=bool)
    for i in range(len(scores)):
        if suppressed[i]:
            continue
        # Weighted scores rank/threshold; the REPORTED score clips to 1.0
        # (it goes on the wire as a confidence) — matching postprocess_batch.
        kept.append((boxes[i], float(min(scores[i], 1.0)), int(classes[i])))
        for j in range(i + 1, len(scores)):
            if suppressed[j] or classes[j] != classes[i]:
                continue
            if _iou_center_np(boxes[i], boxes[j]) > iou_thresh:
                suppressed[j] = True
    return kept


def _iou_center_np(a: np.ndarray, b: np.ndarray) -> float:
    ax1, ay1 = a[0] - a[2] / 2, a[1] - a[3] / 2
    ax2, ay2 = a[0] + a[2] / 2, a[1] + a[3] / 2
    bx1, by1 = b[0] - b[2] / 2, b[1] - b[3] / 2
    bx2, by2 = b[0] + b[2] / 2, b[1] + b[3] / 2
    iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    ih = max(0.0, min(ay2, by2) - max(ay1, by1))
    inter = iw * ih
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / max(union, 1e-9)
