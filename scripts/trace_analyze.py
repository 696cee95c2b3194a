#!/usr/bin/env python
"""XPlane trace + device-op breakdown for the fused serve step.

Traces N steps of the full serving program (letterbox -> model -> NMS,
packed output) on the current device, then aggregates per-op device time
from the Chrome-trace JSON the profiler writes. Prints a category rollup
(convolution / elementwise fusion / copy / other) and the top ops — the
measurement behind the SiLU-tail findings in docs/BENCH_NOTES.md.

  python scripts/trace_analyze.py [--batch 64] [--size 416] [--steps 20]
                                  [--stem conv] [--dot1x1]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_trace(args, trace_dir):
    import jax
    import jax.numpy as jnp
    from zero_latency_yolo_tpu.config import ServerConfig
    from zero_latency_yolo_tpu.models import get_spec, init_params
    from zero_latency_yolo_tpu.runtime.engine import InferenceEngine

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    bh, bw, h, w = 608, 800, 600, 800
    cfg = ServerConfig.from_dict({
        "confidence_threshold": 0.5,
        "detection": {"model_width": args.size, "model_height": args.size},
        "tpu": {"variant": args.variant, "num_classes": 4, "dtype": "bfloat16",
                "batch_buckets": [args.batch], "frame_buckets": [[bh, bw]],
                "stem": args.stem, "dot1x1": args.dot1x1},
    })
    spec = get_spec(args.variant, 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    eng = InferenceEngine(cfg, params=params, preprocess_mode="letterbox_mxu")
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (args.batch, bh, bw, 3),
                                      dtype=np.uint8))
    heights = jnp.full((args.batch,), h, jnp.int32)
    widths = jnp.full((args.batch,), w, jnp.int32)
    step = eng.get_step(args.batch, (bh, bw))
    slots = jnp.arange(args.batch, dtype=jnp.int32)

    @jax.jit
    def run_once():
        return step(eng._params, frames[slots], heights, widths,
                    eng._class_weights, eng._conf, eng._iou)

    np.asarray(run_once())  # compile
    jax.profiler.start_trace(trace_dir)
    out = None
    for _ in range(args.steps):
        out = run_once()
    np.asarray(out)
    jax.profiler.stop_trace()


def categorize(name: str) -> str:
    """XLA:TPU trace-name heuristics: anonymous `fusion.N` events are the
    conv/dot compute fusions; *named* elementwise fusions
    (divide_multiply_fusion etc.) are the standalone VPU tails that failed
    to fuse into them."""
    low = name.lower()
    if any(k in low for k in ("divide", "multiply", "subtract", "logistic",
                              "exp", "tanh", "maximum", "select", "add_f",
                              "convert")) and "fusion" in low:
        return "elementwise-tail"
    if low.startswith(("fusion", "convolution", "dot", "while", "loop")):
        return "compute-fusion(conv/dot/scan)"
    if any(k in low for k in ("copy", "transpose", "bitcast", "reshape",
                              "pad", "concatenate", "slice", "gather",
                              "dynamic", "iota", "broadcast")):
        return "copy/layout"
    return "other"


def analyze(trace_dir, steps):
    paths = glob.glob(os.path.join(trace_dir, "plugins", "profile", "*",
                                   "*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Device lanes: pid names containing "TPU"/"/device:" — fall back to all
    # complete events with args.  Host python lanes are excluded by name.
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "Device" in n or "XLA" in n.upper()}
    per_op = collections.Counter()
    per_cat = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        # Umbrella module events span the whole step and would double-count.
        if name.startswith(("Infeed", "Outfeed", "jit_", "pjit")):
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        per_op[name] += dur
        per_cat[categorize(name)] += dur
        total += dur
    print(f"\ndevice lanes: "
          f"{[pid_names[p] for p in device_pids]}")
    print(f"total device time: {total/1e3:.2f} ms over {steps} steps "
          f"=> {total/1e3/steps:.3f} ms/step")
    print("\nper category (ms/step):")
    for cat, dur in per_cat.most_common():
        print(f"  {cat:22s} {dur/1e3/steps:8.3f}  ({100*dur/total:4.1f}%)")
    print("\ntop 18 ops (ms/step):")
    for name, dur in per_op.most_common(18):
        print(f"  {dur/1e3/steps:8.3f}  {name[:100]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--variant", default="yolov8n")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--stem", default="conv")
    ap.add_argument("--dot1x1", action="store_true")
    ap.add_argument("--trace-dir", default="/tmp/zlt_trace_r2")
    ap.add_argument("--analyze-only", action="store_true")
    args = ap.parse_args()
    if not args.analyze_only:
        import shutil
        shutil.rmtree(args.trace_dir, ignore_errors=True)
        run_trace(args, args.trace_dir)
    analyze(args.trace_dir, args.steps)


if __name__ == "__main__":
    main()
