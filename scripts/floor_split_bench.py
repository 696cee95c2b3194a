#!/usr/bin/env python
"""Measure the floored-split serving cycle on-chip: one batch cycle that
dispatches a small floored group at its rung PLUS the rest of the fleet at
the downshifted rung, vs the unsplit single-rung cycle.

The OPERATIONS.md capacity note derives split cost by ADDING the two
rungs' committed ladder steps (the dispatch lane is serial); this measures
the actual back-to-back pair through the cached serving executable so the
additive model carries a number, not an assumption.

Emits one JSON object {"rows": [...]} — step times per cycle shape.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE = os.environ.get("ZLT_BENCH_SMOKE") == "1"


def main() -> None:
    if {"-h", "--help"} & set(sys.argv[1:]):
        print(__doc__)
        return
    import jax
    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    import jax.numpy as jnp
    from zero_latency_yolo_tpu.config import ServerConfig
    from zero_latency_yolo_tpu.models.yolov8 import get_spec, init_params
    from zero_latency_yolo_tpu.runtime.engine import InferenceEngine
    from zero_latency_yolo_tpu.utils.bench_util import pipeline_step_seconds

    variant = "yolov8p" if SMOKE else "yolov8n"
    size = 64 if SMOKE else 416
    rung = 32 if SMOKE else 320
    bh, bw = (96, 96) if SMOKE else (608, 800)
    h, w = (64, 96) if SMOKE else (600, 800)
    batches = [1, 2] if SMOKE else [2, 4, 8, 56, 60, 62, 64]

    cfg = ServerConfig.from_dict({
        "confidence_threshold": 0.5, "nms_threshold": 0.45,
        "detection": {"model_width": size, "model_height": size},
        "tpu": {"variant": variant, "num_classes": 4, "dtype": "bfloat16",
                "batch_buckets": sorted(set(batches)),
                "pre_nms_topk": 64 if SMOKE else 128,
                "frame_buckets": [[bh, bw]],
                "serve_sizes": [size, rung]},
    })
    spec = get_spec(variant, 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    eng = InferenceEngine(cfg, params=params, preprocess_mode="letterbox_mxu")
    rng = np.random.default_rng(0)

    cap = max(batches)
    frames = rng.integers(0, 256, (cap, bh, bw, 3), dtype=np.uint8)
    cache = jnp.asarray(frames)
    p, cw = eng._params, eng._class_weights
    conf, iou = eng._conf, eng._iou

    def shw_for(b):
        return jnp.asarray(np.stack([
            np.arange(b, dtype=np.int32) % cap,
            np.full((b,), h, np.int32), np.full((b,), w, np.int32)]))

    def cycle(pairs):
        """One serving cycle: dispatch each (batch, size) group
        back-to-back on the serial lane, read the LAST output (what the
        batcher's complete-previous policy amortizes to)."""
        steps = [(eng.get_step_cached(b, (bh, bw), sz), shw_for(b))
                 for b, sz in pairs]

        def run_once():
            out = None
            for step, shw in steps:
                out = step(p, cache, shw, cw, conf, iou)
            return out
        return pipeline_step_seconds(run_once, n1=6, n2=24)

    rows = []
    shapes = ([[(1, rung)], [(1, size), (1, rung)]] if SMOKE else [
        [(64, rung)],                      # unsplit full load at the rung
        [(2, size), (62, rung)],           # 2 floored
        [(4, size), (60, rung)],
        [(8, size), (56, rung)],
        [(8, size)], [(64, size)],         # reference single-group points
    ])
    for pairs in shapes:
        label = "+".join(f"b{b}@{sz}" for b, sz in pairs)
        step_s, rtt_s = cycle(pairs)
        rows.append({"cycle": label, "ms": round(step_s * 1e3, 3),
                     "rtt_ms": round(rtt_s * 1e3, 1)})
        print(f"# {label}: {step_s*1e3:.3f} ms", file=sys.stderr, flush=True)
    print(json.dumps({"rows": rows, "variant": variant, "size": size,
                      "rung": rung, "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
