#!/usr/bin/env python
"""Export a trained .npz artifact as an ultralytics-convention .onnx.

The reference's deployment flow consumes exactly this artifact shape
(src/inference/onnx_engine.cpp:957-1062): fused Conv+BN initializers named
`model.<idx>...`, input `images`, output `output0` = (1, 4+nc, A) decoded
px boxes + sigmoid class scores. Artifacts fine-tuned by this framework can
therefore be deployed on ANY ONNX Runtime stack — including the reference
server itself.

    python scripts/export_onnx.py --weights artifacts/yolov8n_trained_416.npz \
        --variant yolov8n --size 416 --out models/yolov8n_416.onnx

Prints one JSON line with the round-trip parity check (the exported file is
read back through models/weights.from_onnx and compared to the source
params; max|diff| must be 0 — the export is a layout transpose, not a
requantization).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True, help="source .npz artifact")
    ap.add_argument("--variant", default=None,
                    help="override the variant introspected from the file")
    ap.add_argument("--classes", type=int, default=None)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--out", required=True, help="output .onnx path")
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax
    if args.platform:
        # The sitecustomize force-registers the TPU relay and ignores
        # JAX_PLATFORMS; an unfolded checkpoint's fold_batchnorm would
        # otherwise dispatch through the relay (~1 s per readback).
        jax.config.update("jax_platforms", args.platform)

    from zero_latency_yolo_tpu.models import get_spec
    from zero_latency_yolo_tpu.models.ultra import export_deployment_onnx
    from zero_latency_yolo_tpu.models.weights import (
        flatten, from_onnx, infer_spec_from_params, load_params,
    )
    from zero_latency_yolo_tpu.models.yolov8 import fold_batchnorm

    params = load_params(args.weights)
    introspected = infer_spec_from_params(params)  # the file's own geometry
    if args.variant:
        spec = get_spec(args.variant,
                        args.classes if args.classes is not None
                        else introspected.num_classes)
    else:
        spec = introspected
        if args.classes is not None and args.classes != spec.num_classes:
            raise SystemExit(
                f"--classes {args.classes} contradicts the file's "
                f"introspected {spec.num_classes} classes (pass --variant "
                "too if you mean to force a different spec)")
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    export_deployment_onnx(params, spec, args.out, args.size)

    # Round-trip gate: the export must read back bit-identical (vs the
    # folded form — the exporter folds BN exactly as the serving path does).
    if any("/bn/" in k for k in flatten(params)):
        params = fold_batchnorm(params)
    back = flatten(from_onnx(args.out))
    src = flatten(params)
    if set(back) != set(src):
        raise SystemExit(f"round-trip key mismatch: "
                         f"{sorted(set(src) ^ set(back))[:5]}")
    max_diff = max(float(np.abs(back[k].astype(np.float32) -
                                src[k].astype(np.float32)).max())
                   for k in src)
    print(json.dumps({
        "out": args.out, "variant": spec.variant, "size": args.size,
        "bytes": os.path.getsize(args.out),
        "roundtrip_max_diff": max_diff,
    }))
    return 0 if max_diff == 0.0 else 1


if __name__ == "__main__":
    sys.exit(main())
