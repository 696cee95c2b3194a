#!/usr/bin/env python
"""TPU serving-layout sweep: baseline vs dot1x1 vs s2d stem (VERDICT #3).

RTT-cancelling pipeline method (see bench.py): dispatch N steps
back-to-back, read back only the last packed output, difference two
pipeline lengths so the constant relay RTT cancels.

  python scripts/perf_sweep.py [--batch 64] [--size 416] [--trace VARIANT]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(engine, batch, bh, bw, h, w, rng):
    import jax
    import jax.numpy as jnp
    frames = rng.integers(0, 256, (batch, bh, bw, 3), dtype=np.uint8)
    heights = jnp.full((batch,), h, jnp.int32)
    widths = jnp.full((batch,), w, jnp.int32)
    step = engine.get_step(batch, (bh, bw))
    cw, conf, iou = engine._class_weights, engine._conf, engine._iou
    p = engine._params
    cache = jnp.asarray(frames)
    slots = jnp.arange(batch, dtype=jnp.int32)

    @jax.jit
    def run_once(c=cache, s=slots):
        return step(p, c[s], heights, widths, cw, conf, iou)

    np.asarray(run_once())  # compile + settle

    def pipeline(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = run_once()
        np.asarray(out)
        return time.perf_counter() - t0

    pipeline(3)
    n1, n2 = 10, 50
    t1 = min(pipeline(n1) for _ in range(2))
    t2 = min(pipeline(n2) for _ in range(2))
    step_s = max((t2 - t1) / (n2 - n1), 1e-6)
    return step_s, run_once


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--variant", default="yolov8n")
    ap.add_argument("--trace", default="",
                    help="also XPlane-trace this sweep variant (e.g. s2d)")
    ap.add_argument("--trace-dir", default="/tmp/zlt_trace")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    from zero_latency_yolo_tpu.config import ServerConfig
    from zero_latency_yolo_tpu.models import get_spec, init_params
    from zero_latency_yolo_tpu.runtime.engine import InferenceEngine

    bh, bw, h, w = 608, 800, 600, 800
    spec = get_spec(args.variant, 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    rng = np.random.default_rng(0)

    sweeps = {
        "baseline": {},
        "dot1x1": {"dot1x1": True},
        "s2d": {"stem": "s2d"},
        "s2d+dot1x1": {"stem": "s2d", "dot1x1": True},
    }
    results = {}
    for name, over in sweeps.items():
        cfg = ServerConfig.from_dict({
            "confidence_threshold": 0.5,
            "detection": {"model_width": args.size,
                          "model_height": args.size},
            "tpu": {"variant": args.variant, "num_classes": 4,
                    "dtype": "bfloat16", "batch_buckets": [args.batch],
                    "frame_buckets": [[bh, bw]], **over},
        })
        try:
            eng = InferenceEngine(cfg, params=params,
                                  preprocess_mode="letterbox_mxu")
            step_s, run_once = measure(eng, args.batch, bh, bw, h, w, rng)
            fps = args.batch / step_s
            results[name] = {"step_ms": round(step_s * 1e3, 3),
                             "fps": round(fps, 1)}
            print(f"# {name}: {fps:.0f} fps, step={step_s*1e3:.2f} ms",
                  file=sys.stderr)
            if args.trace and name == args.trace:
                jax.profiler.start_trace(args.trace_dir)
                for _ in range(30):
                    out = run_once()
                np.asarray(out)
                jax.profiler.stop_trace()
                print(f"# trace written to {args.trace_dir}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"# {name} FAILED: {e}", file=sys.stderr)
    print(json.dumps({"metric": "layout_sweep", "batch": args.batch,
                      "size": args.size, "device": str(jax.devices()[0]),
                      "results": results}))


if __name__ == "__main__":
    main()
