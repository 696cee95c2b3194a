"""A/B tpu.conv1x1 on-chip: stock XLA convs vs the fused Pallas
matmul+bias+SiLU kernel for the k=1 s=1 convs (ops/conv1x1_pallas.py).

Measures the EXACT serving executable (get_step_cached + packed shw, the
program the ContinuousBatcher dispatches), interleaved per batch so both
rows share one relay-session window; a repeat of the baseline row closes
each batch as a drift sentinel (chip numbers vary ~20% across sessions).

Targets the round-3 trace finding (docs/BENCH_NOTES.md): 1.86 ms/step of
elementwise SiLU tails at batch 32 (32% of the step). The epilogue-only
kernel lost 2-4x to fusion fencing; this one replaces the conv itself.

Usage: python scripts/conv1x1_compare.py [--batches 16,32,64]
       ZLT_BENCH_SMOKE=1 python scripts/conv1x1_compare.py   # CPU mechanics
Writes one JSON object to stdout; progress rows to stderr.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE = os.environ.get("ZLT_BENCH_SMOKE") == "1"

COMBOS = ("xla", "pallas", "xla-repeat")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="2" if SMOKE else "16,32,64")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    import jax
    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — older jax without these flags
        pass
    from zero_latency_yolo_tpu.config import ServerConfig
    from zero_latency_yolo_tpu.models.yolov8 import get_spec, init_params
    from zero_latency_yolo_tpu.runtime.engine import InferenceEngine
    from zero_latency_yolo_tpu.utils.bench_util import measure_cached_step

    variant = "yolov8p" if SMOKE else "yolov8n"
    size = 64 if SMOKE else 416
    bh, bw = (96, 96) if SMOKE else (608, 800)
    h, w = (64, 96) if SMOKE else (600, 800)

    spec = get_spec(variant, 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    rng = np.random.default_rng(0)

    engines = {}
    for conv1x1 in ("xla", "pallas_interpret" if SMOKE else "pallas"):
        cfg = ServerConfig.from_dict({
            "confidence_threshold": 0.5,
            "nms_threshold": 0.45,
            "detection": {"model_width": size, "model_height": size},
            "tpu": {"variant": variant, "num_classes": 4, "dtype": "bfloat16",
                    "batch_buckets": sorted(set(batches)),
                    "frame_buckets": [[bh, bw]],
                    "conv1x1": conv1x1},
        })
        engines[conv1x1.split("_")[0]] = InferenceEngine(
            cfg, params=params, preprocess_mode="letterbox_mxu")

    out = {"rows": []}
    for batch in batches:
        frames = rng.integers(0, 256, (batch, bh, bw, 3), dtype=np.uint8)
        for tag in COMBOS:
            impl = tag.split("-")[0]
            try:
                step_s, rtt_s = measure_cached_step(
                    engines[impl], batch, (bh, bw), h, w, frames=frames)
                row = {"batch": batch, "conv1x1": impl, "tag": tag,
                       "step_ms": round(step_s * 1e3, 3),
                       "fps": round(batch / step_s, 1),
                       "relay_rtt_ms": round(rtt_s * 1e3, 1)}
                out["rows"].append(row)
                print(f"# b{batch} {tag}: {row['step_ms']} ms "
                      f"({row['fps']} fps, rtt {row['relay_rtt_ms']} ms)",
                      file=sys.stderr)
            except Exception as e:  # noqa: BLE001 — one combo must not kill the sweep
                print(f"# b{batch} {tag} FAILED: {type(e).__name__}: {e}",
                      file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
