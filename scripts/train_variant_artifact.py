"""Produce a deployable .npz artifact for any (named or parametric) variant.

Recipe = the one that produced artifacts/yolov8n_trained_416.npz: train from
scratch on the synthetic task at a small size (cheap shape), fine-tune at
the deployment size, fold BN into conv biases, evaluate AP@0.5 on the
held-out seed, save the folded serving params.

    python scripts/train_variant_artifact.py \
        --variant yolov8-d0.33-w0.125 --out artifacts/yolov8hw_trained_416.npz

Prints one JSON line with the eval metrics. Forces CPU (training must not
fight the TPU relay; the sitecustomize ignores JAX_PLATFORMS, so the
platform is forced via jax.config before any device use).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--classes", type=int, default=4)
    ap.add_argument("--stage1-size", type=int, default=64)
    ap.add_argument("--stage1-steps", type=int, default=1200)
    ap.add_argument("--stage1-lr", type=float, default=2e-3)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--multiscale", default="",
                    help="comma list of stage-2 sizes to round-robin "
                         "(e.g. '416,320') — train for the adaptive "
                         "serve ladder; --size stays the eval size")
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--schedule", default="const",
                    choices=("const", "cosine"),
                    help="lr schedule for BOTH stages (cosine = "
                         "warmup-cosine; warmup is 3%% of each stage)")
    ap.add_argument("--batch", type=int, default=8)
    # 8-image evals mislead: the committed artifacts rank DIFFERENTLY at 8
    # vs 64 images (docs/BENCH_NOTES artifact table) — 64 is the floor for
    # comparable numbers, still seconds of eval time.
    ap.add_argument("--eval-images", type=int, default=64)
    ap.add_argument("--data", default=None,
                    help="YOLO-convention train directory (images/ + "
                         "labels/*.txt); default is the synthetic task")
    ap.add_argument("--val-data", default=None,
                    help="YOLO-convention eval directory (defaults to "
                         "--data when given)")
    ap.add_argument("--mosaic", type=float, default=0.0,
                    help="mosaic augmentation probability (both stages)")
    ap.add_argument("--photometric", type=float, default=0.0,
                    help="photometric augmentation strength (both stages; "
                         "the OOD-robustness lever, BENCH_NOTES OOD section)")
    ap.add_argument("--clutter", type=float, default=0.0,
                    help="distractor-clutter augmentation strength (both "
                         "stages; the OOD clutter-axis lever)")
    ap.add_argument("--distill-from", default=None,
                    help="teacher artifact for knowledge distillation "
                         "(both stages; geometry introspected from file)")
    ap.add_argument("--distill-weight", type=float, default=1.0)
    ap.add_argument("--distill-box-weight", type=float, default=1.0)
    ap.add_argument("--distill-temp", type=float, default=2.0)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from zero_latency_yolo_tpu.models import get_spec
    from zero_latency_yolo_tpu.models.weights import save_params
    from zero_latency_yolo_tpu.models.yolov8 import fold_batchnorm
    from zero_latency_yolo_tpu.train.eval import evaluate
    from zero_latency_yolo_tpu.train.loop import synthetic_batches, train

    spec = get_spec(args.variant, args.classes)
    kd = dict(distill_from=args.distill_from,
              distill_weight=args.distill_weight,
              distill_box_weight=args.distill_box_weight,
              distill_temp=args.distill_temp,
              mosaic=args.mosaic, photometric=args.photometric,
              clutter=args.clutter)
    t0 = time.perf_counter()
    state = train(variant=args.variant, num_classes=args.classes,
                  size=args.stage1_size, batch=args.batch,
                  steps=args.stage1_steps, lr=args.stage1_lr, data=args.data,
                  schedule=args.schedule,
                  warmup_steps=args.stage1_steps * 3 // 100,
                  log_every=max(args.stage1_steps // 10, 1), **kd)
    with tempfile.TemporaryDirectory() as td:
        warm = os.path.join(td, "stage1.npz")
        save_params(jax.device_get(state.params), warm)
        state = train(variant=args.variant, num_classes=args.classes,
                      size=args.size, batch=args.batch, steps=args.steps,
                      lr=args.lr, init_from=warm, data=args.data,
                      multiscale=([int(s) for s in
                                   args.multiscale.split(",")]
                                  if args.multiscale else None),
                      schedule=args.schedule,
                      warmup_steps=args.steps * 3 // 100,
                      log_every=max(args.steps // 10, 1), **kd)

    folded = fold_batchnorm(jax.device_get(state.params))
    val = args.val_data or args.data
    if val:
        from zero_latency_yolo_tpu.train.data import load_yolo_dir
        import numpy as np
        raw, targets = load_yolo_dir(val, args.size, num_classes=args.classes,
                                     limit=args.eval_images or None)
        images = raw.astype(np.float32) / 255
    else:
        # Held-out eval at deployment size: seed 777 matches the committed
        # artifact gates (tests/test_model_parity.py).
        images, targets = next(synthetic_batches(args.eval_images, args.size,
                                                 seed=777))
    metrics = evaluate(folded, spec, images, targets, conf_thresh=0.25,
                       batch=min(4, args.batch))
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    save_params(folded, args.out)
    print(json.dumps({
        "variant": args.variant, "out": args.out, "size": args.size,
        "mAP": round(metrics["mAP"], 4), "recall": round(metrics["recall"], 4),
        "train_s": round(time.perf_counter() - t0, 1),
        **({"distill_from": args.distill_from} if args.distill_from else {}),
    }))


if __name__ == "__main__":
    sys.exit(main())
