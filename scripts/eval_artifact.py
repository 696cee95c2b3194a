#!/usr/bin/env python
"""Evaluate a weight artifact: AP@0.5 / recall on a dataset or the held-out
synthetic seed.

The variant is introspected from the file (models/weights.py landmark
shapes), so the only required argument is the artifact:

    python scripts/eval_artifact.py --weights artifacts/yolov8n_trained_416.npz
    python scripts/eval_artifact.py --weights my.onnx --data datasets/val

Prints one JSON line. Forces CPU by default (the sitecustomize ignores
JAX_PLATFORMS; evaluation must not fight the TPU relay).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True, help=".npz/.pt/.onnx artifact")
    ap.add_argument("--data", default=None,
                    help="YOLO-convention eval directory; default is the "
                         "held-out synthetic seed (777, the committed "
                         "artifact gates)")
    ap.add_argument("--size", type=int, default=416)
    # 64 is the measured floor for comparable numbers: 8-image evals invert
    # the shipped-artifact ranking (docs/BENCH_NOTES artifact table).
    ap.add_argument("--images", type=int, default=64,
                    help="synthetic eval-set size / dataset limit (0 = all)")
    ap.add_argument("--task", default="blob",
                    choices=("blob", "crowded", "ood1", "ood2", "ood3"),
                    help="synthetic eval domain when --data is not given: "
                         "blob = the training task's distribution (the "
                         "historical numbers), crowded = dense occlusion "
                         "task, ood1-3 = the held-out out-of-distribution "
                         "domain (train/ood.py; textured/cluttered scenes, "
                         "photometric + JPEG degradation, small/occluded "
                         "boxes) at increasing severity")
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--nms", type=float, default=0.45)
    ap.add_argument("--iou", type=float, default=0.5)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--topk", type=int, default=0,
                    help="pre-NMS top-k (0 = library default 256); A/B the\n"
                         "serving configs' truncation at eval conf")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from zero_latency_yolo_tpu.models.weights import (
        infer_spec_from_params, load_artifact,
    )
    from zero_latency_yolo_tpu.train.eval import evaluate
    from zero_latency_yolo_tpu.train.loop import synthetic_batches

    if args.images < 0:
        # A negative limit with --data would silently slice away the LAST
        # N pairs (pairs[:-N]) and report metrics on a truncated set
        # (review r5).
        raise SystemExit("--images must be >= 0")
    if args.images <= 0 and not args.data:
        # "0 = all" is a --data semantics; for the synthetic/ood/crowded
        # generators it would flow in as batch=0 and produce an empty eval
        # set with degenerate metrics (ADVICE r4).
        raise SystemExit("--images 0 ('all') requires --data; synthetic "
                         "tasks need an explicit count (>= 64 for "
                         "comparable numbers — BENCH_NOTES artifact table)")

    try:
        params = load_artifact(args.weights)
    except ValueError as e:
        raise SystemExit(str(e))
    spec = infer_spec_from_params(params)

    if args.data:
        from zero_latency_yolo_tpu.train.data import load_yolo_dir
        raw, targets = load_yolo_dir(args.data, args.size,
                                     num_classes=spec.num_classes,
                                     limit=args.images or None)
        images = raw.astype(np.float32) / 255
    elif args.task.startswith("ood"):
        from zero_latency_yolo_tpu.train.ood import ood_batches
        images, targets = next(ood_batches(args.images, args.size, seed=777,
                                           level=int(args.task[3])))
    elif args.task == "crowded":
        from zero_latency_yolo_tpu.train.loop import crowded_batches
        images, targets = next(crowded_batches(args.images, args.size,
                                               seed=777))
    else:
        images, targets = next(synthetic_batches(args.images, args.size,
                                                 seed=777))

    t0 = time.perf_counter()
    metrics = evaluate(params, spec, images, targets, conf_thresh=args.conf,
                       nms_thresh=args.nms, iou_thresh=args.iou,
                       batch=args.batch, topk=args.topk or None)
    print(json.dumps({
        "weights": args.weights, "variant": spec.variant,
        "num_classes": spec.num_classes, "size": args.size,
        "images": int(len(images)),
        "data": args.data or f"{args.task}-777",
        "mAP": round(metrics["mAP"], 4),
        "mAP50_95": round(metrics["mAP50_95"], 4),
        "recall": round(metrics["recall"], 4),
        "eval_s": round(time.perf_counter() - t0, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
