"""Width-vs-accuracy probe for the parametric variants, on synthetic data.

The on-chip width ladder (docs/BENCH_NOTES) shows the aligned half-width
point (w0.125 -> 32/64/128 head channels) cuts the serving step 16% at
batch 32 / 27% at batch 64 — the gate-relevant candidate IF accuracy
holds. No real dataset ships in-image (zero egress), so this trains the
candidate widths on the synthetic crowded task with identical
data/optimizer/seed and reports held-out AP@0.5 — directional evidence
only; the real-dataset comparison stays a ROADMAP item.

    python scripts/width_accuracy.py --steps 1200

Prints one JSON line per width. Forces CPU (training comparisons must not
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
    ap.add_argument("--widths", default="0.25,0.125")
    ap.add_argument("--task", default="crowded", choices=("blob", "crowded"))
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--eval-images", type=int, default=64)
    ap.add_argument("--mc", type=int, default=256,
                    help="max_channels; 256 keeps 64px training tractable "
                         "on CPU while preserving the relative width cut")
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

    for width in (float(w) for w in args.widths.split(",")):
        variant = f"yolov8-d0.33-w{width}-mc{args.mc}"
        spec = get_spec(variant, 4)
        t0 = time.perf_counter()
        state = train(variant=variant, num_classes=4, size=args.size,
                      batch=args.batch, steps=args.steps, lr=args.lr,
                      crowded=(args.task == "crowded"),
                      log_every=max(args.steps // 10, 1))
        params = fold_batchnorm(jax.device_get(state.params))
        metrics = evaluate(params, spec, eval_images, eval_targets,
                           batch=args.batch)
        row = {"task": args.task, "width": width,
               "head_channels": list(spec.backbone_channels),
               "steps": args.steps,
               "mAP": round(metrics["mAP"], 4),
               "recall": round(metrics["recall"], 4),
               "train_s": round(time.perf_counter() - t0, 1)}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    sys.exit(main())
