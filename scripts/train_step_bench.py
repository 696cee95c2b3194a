#!/usr/bin/env python
"""Measure the jitted TRAIN step on the current device (chip or CPU).

The serving step has committed chip ladders (artifacts/*_step_ladder.json);
this is the training-side twin: ms/step, steps/s and img/s for a batch
ladder of the SPMD train step (single device by default; --mesh-data /
--mesh-model build a mesh — e.g. on the virtual 8-device CPU mesh). The
reference has no training at all (SURVEY §5.4: inference-only), so these
numbers document capability the rebuild ADDS; they also size real
fine-tunes (artifact recipe ETA = steps x step_ms).

Relay-safe: uses the RTT-cancelling pipeline method (utils/bench_util) —
train steps chain donated state, so a pipeline of N steps is the natural
dispatch and the single readback is the last step's loss scalar.

    python scripts/train_step_bench.py                       # chip, yolov8n@416
    python scripts/train_step_bench.py --platform cpu --variant yolov8p \
        --size 64 --batches 2 --pipeline 3,9                 # CI smoke

Prints ONE JSON line.
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
    ap.add_argument("--variant", default="yolov8n")
    ap.add_argument("--classes", type=int, default=4)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--assigner", default="center", choices=("tal", "center"))
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--distill-from", default=None,
                    help="also time the distilled step against this teacher")
    ap.add_argument("--mesh-data", type=int, default=1)
    ap.add_argument("--mesh-model", type=int, default=1)
    ap.add_argument("--pipeline", default="10,50",
                    help="two pipeline lengths for the RTT-cancelling "
                         "difference (n1,n2)")
    ap.add_argument("--platform", default="",
                    help="force a JAX platform (e.g. cpu); the sitecustomize "
                         "ignores JAX_PLATFORMS")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    import jax.numpy as jnp
    import optax
    from zero_latency_yolo_tpu.models import get_spec, init_params
    from zero_latency_yolo_tpu.train.loop import synthetic_batches
    from zero_latency_yolo_tpu.train.step import (init_train_state,
                                                  make_train_step)
    from zero_latency_yolo_tpu.utils.bench_util import pipeline_step_seconds

    n1, n2 = (int(x) for x in args.pipeline.split(","))
    spec = get_spec(args.variant, args.classes)
    tx = optax.adamw(1e-3, weight_decay=1e-4)

    mesh = None
    if args.mesh_data * args.mesh_model > 1:
        from zero_latency_yolo_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(data=args.mesh_data, model=args.mesh_model)

    t_params = t_spec = None
    if args.distill_from:
        from zero_latency_yolo_tpu.models.weights import (
            infer_spec_from_params, load_params)
        t_params = load_params(args.distill_from)
        t_spec = infer_spec_from_params(t_params)
        # Same gate as train/loop.py: fail with the clear message here, not
        # with an opaque reshape error inside distill_loss after a full trace.
        if (t_spec.num_classes, t_spec.reg_max) != (spec.num_classes,
                                                    spec.reg_max):
            raise SystemExit(
                f"--distill-from {args.distill_from} has "
                f"nc={t_spec.num_classes}, reg_max={t_spec.reg_max}; "
                f"student needs nc={spec.num_classes}, reg_max={spec.reg_max}")

    step_fn = make_train_step(spec, tx, (args.size, args.size), mesh=mesh,
                              ema_decay=0.9998 if args.ema else 0.0,
                              assigner=args.assigner, teacher_spec=t_spec)
    if mesh is not None and t_params is not None:
        t_params = step_fn.shard_teacher(t_params)

    rows = []
    for batch in (int(b) for b in args.batches.split(",")):
        images_np, targets_np = next(synthetic_batches(batch, args.size))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from zero_latency_yolo_tpu.parallel.mesh import DATA_AXIS
            images = jax.device_put(images_np, NamedSharding(
                mesh, P(DATA_AXIS, None, None, None)))
            targets = jax.device_put(targets_np, NamedSharding(
                mesh, P(DATA_AXIS, None, None)))
        else:
            images = jnp.asarray(images_np)
            targets = jnp.asarray(targets_np)

        # Fresh state per batch size (the step donates it); init is NumPy
        # under the hood (models/yolov8.py _init_conv), no compile storm.
        state_box = [init_train_state(
            init_params(jax.random.PRNGKey(0), spec, folded=False), tx,
            ema=args.ema)]
        if mesh is not None:
            state_box[0] = step_fn.shard_state(state_box[0])

        def run_once():
            if t_params is not None:
                state_box[0], metrics = step_fn(state_box[0], images,
                                                targets, t_params)
            else:
                state_box[0], metrics = step_fn(state_box[0], images, targets)
            return metrics["loss"]

        step_s, rtt_s = pipeline_step_seconds(run_once, n1=n1, n2=n2,
                                              repeats=2)
        rows.append({"batch": batch,
                     "step_ms": round(step_s * 1e3, 3),
                     "steps_per_s": round(1.0 / step_s, 2),
                     "img_per_s": round(batch / step_s, 1),
                     "rtt_ms": round(rtt_s * 1e3, 1),
                     "final_loss": round(float(np.asarray(run_once())), 4)})

    print(json.dumps({
        "metric": "train_step", "variant": args.variant, "size": args.size,
        "assigner": args.assigner, "ema": bool(args.ema),
        "distill_from": args.distill_from,
        "mesh": f"{args.mesh_data}x{args.mesh_model}" if mesh else None,
        "device": str(jax.devices()[0]),
        "rows": rows,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
