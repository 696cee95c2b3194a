"""Assigner comparison: center-prior vs task-aligned (TAL) on a synthetic task.

Trains one model per assigner with identical data/optimizer/seed and reports
AP@0.5 on a held-out seed. The blob task (--task blob) has unambiguous,
mostly isolated boxes; the crowded task (--task crowded) has dense
overlapping instances with occlusion-aware labels — the regime TAL's
model-aligned soft assignment was designed for (see docs/BENCH_NOTES).

    python scripts/assigner_compare.py --task crowded --steps 1500

Prints one JSON line per assigner. Forces CPU (training comparisons must not
fight the TPU relay; the sitecustomize ignores JAX_PLATFORMS, so the
platform is forced via jax.config before any device use).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="crowded", choices=("blob", "crowded"))
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--eval-images", type=int, default=64)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from zero_latency_yolo_tpu.models import get_spec
    from zero_latency_yolo_tpu.models.yolov8 import fold_batchnorm
    from zero_latency_yolo_tpu.train.eval import evaluate
    from zero_latency_yolo_tpu.train.loop import (
        crowded_batches, synthetic_batches, train)

    gen = crowded_batches if args.task == "crowded" else synthetic_batches
    # Held-out eval set: a seed the training stream never uses.
    eval_it = gen(args.eval_images, args.size, seed=991)
    eval_images, eval_targets = next(eval_it)

    spec = get_spec("yolov8p", 4)
    for assigner in ("center", "tal"):
        t0 = time.perf_counter()
        state = train(variant="yolov8p", num_classes=4, size=args.size,
                      batch=args.batch, steps=args.steps, lr=args.lr,
                      assigner=assigner, crowded=(args.task == "crowded"),
                      log_every=max(args.steps // 10, 1))
        params = fold_batchnorm(jax.device_get(state.params))
        metrics = evaluate(params, spec, eval_images, eval_targets,
                           batch=args.batch)
        row = {"task": args.task, "assigner": assigner, "steps": args.steps,
               "mAP": round(metrics["mAP"], 4),
               "recall": round(metrics["recall"], 4),
               "train_s": round(time.perf_counter() - t0, 1)}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    sys.exit(main())
