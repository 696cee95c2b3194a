"""Independent PyTorch (CPU, NCHW) reference implementation of the YOLOv8 head.

Used only by the parity harness: the image ships no onnxruntime, so the
"matches ONNX Runtime within 1e-3" gate (BASELINE.json) is realized as
JAX-vs-torch cross-framework parity, with the two implementations written
independently (NHWC lax.conv vs NCHW F.conv2d, different op orders).

Consumes the same parameter pytree as models/yolov8.py (numpy leaves),
transposing kernels HWIO -> OIHW on the fly.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import numpy as np
import torch
import torch.nn.functional as F

from .yolov8 import ModelSpec, anchors_for


def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x)).float()


def _conv(p: Dict[str, Any], x: torch.Tensor, stride: int = 1, act: bool = True) -> torch.Tensor:
    w = _t(p["w"]).permute(3, 2, 0, 1).contiguous()  # HWIO -> OIHW
    b = _t(p["b"]) if "b" in p else None
    k = w.shape[-1]
    y = F.conv2d(x, w, b, stride=stride, padding=(k - 1) // 2)
    if "bn" in p:
        bn = p["bn"]
        y = F.batch_norm(y, _t(bn["mean"]), _t(bn["var"]), _t(bn["gamma"]),
                         _t(bn["beta"]), training=False, eps=1e-3)
    return F.silu(y) if act else y


def _bottleneck(p, x, shortcut: bool) -> torch.Tensor:
    y = _conv(p["cv2"], _conv(p["cv1"], x))
    return x + y if shortcut else y


def _c2f(p, x, shortcut: bool) -> torch.Tensor:
    y = _conv(p["cv1"], x)
    a, b = y.chunk(2, dim=1)
    ys = [a, b]
    for mp in p["m"]:
        ys.append(_bottleneck(mp, ys[-1], shortcut))
    return _conv(p["cv2"], torch.cat(ys, dim=1))


def _sppf(p, x) -> torch.Tensor:
    y = _conv(p["cv1"], x)
    p1 = F.max_pool2d(y, 5, stride=1, padding=2)
    p2 = F.max_pool2d(p1, 5, stride=1, padding=2)
    p3 = F.max_pool2d(p2, 5, stride=1, padding=2)
    return _conv(p["cv2"], torch.cat([y, p1, p2, p3], dim=1))


@torch.no_grad()
def forward_decoded_torch(params: Dict[str, Any], spec: ModelSpec,
                          x_nhwc: np.ndarray) -> np.ndarray:
    """Full forward + decode. Input (B, H, W, 3) float; output (B, A, 4+nc)."""
    x = torch.from_numpy(np.asarray(x_nhwc)).float().permute(0, 3, 1, 2).contiguous()
    h_in, w_in = x.shape[2], x.shape[3]

    x0 = _conv(params["m0"], x, stride=2)
    x1 = _conv(params["m1"], x0, stride=2)
    x2 = _c2f(params["m2"], x1, True)
    x3 = _conv(params["m3"], x2, stride=2)
    x4 = _c2f(params["m4"], x3, True)
    x5 = _conv(params["m5"], x4, stride=2)
    x6 = _c2f(params["m6"], x5, True)
    x7 = _conv(params["m7"], x6, stride=2)
    x8 = _c2f(params["m8"], x7, True)
    x9 = _sppf(params["m9"], x8)

    u10 = F.interpolate(x9, scale_factor=2.0, mode="nearest")
    n12 = _c2f(params["m12"], torch.cat([u10, x6], dim=1), False)
    u13 = F.interpolate(n12, scale_factor=2.0, mode="nearest")
    p3 = _c2f(params["m15"], torch.cat([u13, x4], dim=1), False)
    d16 = _conv(params["m16"], p3, stride=2)
    p4 = _c2f(params["m18"], torch.cat([d16, n12], dim=1), False)
    d19 = _conv(params["m19"], p4, stride=2)
    p5 = _c2f(params["m21"], torch.cat([d19, x9], dim=1), False)

    det = params["m22"]
    outs: List[torch.Tensor] = []
    for level, f in enumerate((p3, p4, p5)):
        box = f
        for i, bp in enumerate(det["cv2"][level]):
            box = _conv(bp, box, act=(i < 2))
        cls = f
        for i, cp in enumerate(det["cv3"][level]):
            cls = _conv(cp, cls, act=(i < 2))
        out = torch.cat([box, cls], dim=1)           # (B, 64+nc, h, w)
        outs.append(out.flatten(2))                   # (B, 64+nc, A_i)

    flat = torch.cat(outs, dim=2)                     # (B, 64+nc, A)
    reg_max, nc = spec.reg_max, spec.num_classes
    b, _, a = flat.shape
    box_bins = flat[:, :4 * reg_max].reshape(b, 4, reg_max, a)
    dist = (box_bins.softmax(dim=2) *
            torch.arange(reg_max, dtype=torch.float32)[None, None, :, None]).sum(2)
    anchors, strides = anchors_for(spec, h_in, w_in)
    anchors_t = torch.from_numpy(anchors.T[None])     # (1, 2, A)
    strides_t = torch.from_numpy(strides.T[None])     # (1, 1, A)
    x1y1 = anchors_t - dist[:, :2]
    x2y2 = anchors_t + dist[:, 2:]
    boxes = torch.cat([(x1y1 + x2y2) / 2, x2y2 - x1y1], dim=1) * strides_t
    probs = flat[:, 4 * reg_max:].sigmoid()
    return torch.cat([boxes, probs], dim=1).permute(0, 2, 1).numpy()
