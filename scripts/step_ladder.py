#!/usr/bin/env python
"""Measure the fused serving-step duration across batch buckets on the real
device (RTT-cancelling pipeline method — see bench.py). Emits one JSON line:
  {"ladder": {"2": ms, "4": ms, ...}, "device": ...}

Feeds the synthetic-step profile (tpu.synthetic_step_ms / step profile) that
the host-path loadtest uses to compose a measured end-to-end p99
(docs/BENCH_NOTES round 3)."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if {"-h", "--help"} & set(sys.argv[1:]):
        # Env-var-driven by design (ZLT_LADDER_VARIANT/SIZE/ZLT_LADDER,
        # ZLT_BENCH_SMOKE); --help must not touch the device (a wedged
        # relay would hang the help text).
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
    from zero_latency_yolo_tpu.config import ServerConfig
    from zero_latency_yolo_tpu.models.yolov8 import get_spec, init_params
    from zero_latency_yolo_tpu.runtime.engine import InferenceEngine

    smoke = os.environ.get("ZLT_BENCH_SMOKE") == "1"
    variant = os.environ.get("ZLT_LADDER_VARIANT",
                             "yolov8p" if smoke else "yolov8n")
    size = 64 if smoke else int(os.environ.get("ZLT_LADDER_SIZE", "416"))
    bh, bw = (96, 96) if smoke else (608, 800)
    h, w = (64, 96) if smoke else (600, 800)
    batches = (1, 2) if smoke else tuple(
        int(b) for b in os.environ.get("ZLT_LADDER",
                                       "2,4,8,16,32,64").split(","))

    topk = int(os.environ.get("ZLT_LADDER_TOPK", "256"))
    cfg = ServerConfig.from_dict({
        "confidence_threshold": 0.5, "nms_threshold": 0.45,
        "detection": {"model_width": size, "model_height": size},
        "tpu": {"variant": variant, "num_classes": 4, "dtype": "bfloat16",
                "batch_buckets": sorted(batches),
                "pre_nms_topk": topk,
                "frame_buckets": [[bh, bw]]},
    })
    spec = get_spec(variant, 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    rng = np.random.default_rng(0)

    from zero_latency_yolo_tpu.utils.bench_util import measure_cached_step

    ladder = {}
    for batch in batches:
        try:
            engine = InferenceEngine(cfg, params=params,
                                     preprocess_mode="letterbox_mxu")
            frames = rng.integers(0, 256, (batch, bh, bw, 3), dtype=np.uint8)
            # The EXACT serving program (get_step_cached + packed shw — the
            # shared harness, not a hand-rolled near-twin): the ladder
            # feeds synthetic_step_profile, which claims to replay the
            # real serving-step durations.
            step_s, _rtt = measure_cached_step(engine, batch, (bh, bw),
                                               h, w, frames=frames)
            step_ms = step_s * 1e3
            ladder[str(batch)] = round(step_ms, 3)
            print(f"# batch={batch}: step={step_ms:.2f} ms "
                  f"({batch/step_ms*1e3:.0f} fps)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# batch={batch} FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)
    out = {"ladder": ladder, "variant": variant, "size": size,
           "device": str(jax.devices()[0])}
    if topk != 256:
        out["pre_nms_topk"] = topk
    print(json.dumps(out))


if __name__ == "__main__":
    main()
