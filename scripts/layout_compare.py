"""A/B the serving-layout flags on-chip: tpu.select=perlevel, tpu.c2f=split.

Measures the EXACT serving executable (get_step_cached + packed shw, the
program the ContinuousBatcher dispatches) for every (select, c2f) combo,
interleaved per batch so all rows of a batch share one relay-session window
(chip-side numbers vary ~20% across sessions — CLAUDE.md). A repeat of the
baseline row closes each batch to expose in-window drift.

Targets the round-3 trace finding (docs/BENCH_NOTES.md): ~0.9 ms/step of
NMS-adjacent layout copies at batch 64 — the full-anchor (B, 3549, .) concat
+ gather that select=perlevel removes, and the C2f slice/concat that
c2f=split removes.

Usage: python scripts/layout_compare.py [--batches 32,64,128]
       ZLT_BENCH_SMOKE=1 python scripts/layout_compare.py   # CPU mechanics
Writes one JSON object to stdout; progress rows to stderr.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE = os.environ.get("ZLT_BENCH_SMOKE") == "1"

COMBOS = (
    ("concat", "slice"),     # shipping default (baseline)
    ("perlevel", "slice"),
    ("concat", "split"),
    ("perlevel", "split"),
    ("concat", "slice", "repeat"),  # drift sentinel
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="2" if SMOKE else "32,64,128")
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

    variant = os.environ.get("ZLT_LC_VARIANT",
                             "yolov8p" if SMOKE else "yolov8n")
    size = 64 if SMOKE else int(os.environ.get("ZLT_LC_SIZE", "416"))
    topk = int(os.environ.get("ZLT_LC_TOPK", "256"))
    bh, bw = (96, 96) if SMOKE else (608, 800)
    h, w = (64, 96) if SMOKE else (600, 800)

    spec = get_spec(variant, 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    rng = np.random.default_rng(0)

    engines = {}
    for combo in COMBOS:
        select, c2f = combo[0], combo[1]
        if (select, c2f) in engines:
            continue
        cfg = ServerConfig.from_dict({
            "confidence_threshold": 0.5,
            "nms_threshold": 0.45,
            "detection": {"model_width": size, "model_height": size},
            "tpu": {"variant": variant, "num_classes": 4, "dtype": "bfloat16",
                    "batch_buckets": sorted(set(batches)),
                    "frame_buckets": [[bh, bw]],
                    "pre_nms_topk": topk,
                    "select": select, "c2f": c2f},
        })
        engines[(select, c2f)] = InferenceEngine(
            cfg, params=params, preprocess_mode="letterbox_mxu")

    out = {"rows": [], "variant": variant, "size": size,
           "pre_nms_topk": topk}
    for batch in batches:
        frames = rng.integers(0, 256, (batch, bh, bw, 3), dtype=np.uint8)
        for combo in COMBOS:
            select, c2f = combo[0], combo[1]
            tag = "+".join(combo)
            try:
                step_s, rtt_s = measure_cached_step(
                    engines[(select, c2f)], batch, (bh, bw), h, w,
                    frames=frames)
                row = {"batch": batch, "select": select, "c2f": c2f,
                       "tag": tag, "step_ms": round(step_s * 1e3, 3),
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
