#!/usr/bin/env python
"""Spatial multi-frame packing PROXY A/B (the last untried MFU lever class).

Hypothesis (VERDICT r4 weak-#3): the serving step is VPU-lane-bound at
416 because deep-layer spatial planes (13x13 at stride 32) underfill the
8x128 lanes; tiling 2x2 frames into one 2S x 2S plane quadruples
per-dispatch spatial work at identical total FLOPs and could fill lanes.

This proxy times ONLY the conv stack + decode (forward_decoded) at
equal-pixel pairs — (B, S) vs (B/4, 2S) — before any un-tiling machinery
is built.  If the packed shape is not meaningfully faster per-frame, the
full packing path (boundary handling, grid offsets, box un-tiling) is
moot and the MFU question closes with a measured negative.

Reference analog: the batching intent of
/root/reference/src/inference/onnx_engine.cpp:320-369.

Emits one JSON object: {"pairs": [...], "device": ...}.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if {"-h", "--help"} & set(sys.argv[1:]):
        print(__doc__)
        return
    import jax
    if os.environ.get("ZLT_BENCH_SMOKE") == "1":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    import jax.numpy as jnp
    from zero_latency_yolo_tpu.models.yolov8 import (
        forward_decoded, get_spec, init_params)
    from zero_latency_yolo_tpu.utils.bench_util import pipeline_step_seconds

    smoke = os.environ.get("ZLT_BENCH_SMOKE") == "1"
    # (variant, batch, size) pairs: each row measured at (B, S) and
    # (B//4, 2S) — equal pixels, equal conv FLOPs.
    if smoke:
        rows = [("yolov8p", 8, 64)]
    else:
        rows = [
            ("yolov8n", 64, 416),
            ("yolov8n", 32, 416),
            ("yolov8n", 64, 320),
            ("yolov8s", 16, 640),
        ]
    env_rows = os.environ.get("ZLT_PACK_ROWS")
    if env_rows:
        rows = [(v, int(b), int(s)) for v, b, s in
                (r.split(":") for r in env_rows.split(","))]

    out = {"pairs": [], "device": str(jax.devices()[0])}
    rng = np.random.default_rng(0)
    for variant, batch, size in rows:
        spec = get_spec(variant, 4)
        params = init_params(jax.random.PRNGKey(0), spec, folded=True)
        params = jax.device_put(params)
        row = {"variant": variant, "batch": batch, "size": size}
        for label, (b, s) in (("flat", (batch, size)),
                              ("packed", (batch // 4, size * 2))):
            x_np = rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32)
            x = jax.device_put(jnp.asarray(x_np))
            fwd = jax.jit(lambda p, xx: forward_decoded(
                p, spec, xx, dtype=jnp.bfloat16))
            step_s, rtt_s = pipeline_step_seconds(
                lambda: fwd(params, x), n1=6, n2=24)
            row[label + "_ms"] = round(step_s * 1e3, 3)
            row[label + "_rtt_ms"] = round(rtt_s * 1e3, 1)
            print(f"  {variant} {label} ({b},{s}): {step_s*1e3:.3f} ms",
                  file=sys.stderr, flush=True)
        row["packed_speedup"] = round(row["flat_ms"] / row["packed_ms"], 3)
        out["pairs"].append(row)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
