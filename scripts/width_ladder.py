"""Serving-cost ladder over parametric model widths, on-chip.

The full-load single-chip p99 gate needs a ~35-40% step cut (docs/
BENCH_NOTES "gate physics"); the Pallas family of tail levers is closed as
measured negatives, so the remaining lever is the model itself. This
measures the EXACT serving executable (get_step_cached + packed shw) for
yolov8n (w0.25) against narrower parametric variants at the p99- and
fps-relevant batches, interleaved per batch with a baseline repeat as
drift sentinel. Serving cost only — the accuracy side of a width choice
needs the training stack + a real dataset (ROADMAP round-4 note).

Width points snap through _make_divisible(+8): 0.25 -> (16,32,64,128,256)
head-path channels, 0.20 -> (16,32,56,104,208), 0.15 -> (16,24,40,80,160).

Usage: python scripts/width_ladder.py [--batches 32,64] [--widths 0.25,0.20,0.15]
       ZLT_BENCH_SMOKE=1 python scripts/width_ladder.py   # CPU mechanics
Writes one JSON object to stdout; progress rows to stderr.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE = os.environ.get("ZLT_BENCH_SMOKE") == "1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="2" if SMOKE else "32,64")
    ap.add_argument("--widths", default="0.125,0.10" if SMOKE
                    else "0.25,0.20,0.15")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]
    widths = [float(w) for w in args.widths.split(",")]

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

    size = 64 if SMOKE else 416
    bh, bw = (96, 96) if SMOKE else (608, 800)
    h, w = (64, 96) if SMOKE else (600, 800)
    mc = 256 if SMOKE else 1024
    base_w = widths[0]

    def variant_name(width: float) -> str:
        if not SMOKE and width == 0.25:
            return "yolov8n"  # the named point: reuses cached programs
        return f"yolov8-d0.33-w{width}-mc{mc}"

    engines = {}
    for width in widths:
        variant = variant_name(width)
        spec = get_spec(variant, 4)
        params = init_params(jax.random.PRNGKey(0), spec, folded=True)
        cfg = ServerConfig.from_dict({
            "confidence_threshold": 0.5,
            "nms_threshold": 0.45,
            "detection": {"model_width": size, "model_height": size},
            "tpu": {"variant": variant, "num_classes": 4, "dtype": "bfloat16",
                    "batch_buckets": sorted(set(batches)),
                    "frame_buckets": [[bh, bw]]},
        })
        engines[width] = InferenceEngine(cfg, params=params,
                                         preprocess_mode="letterbox_mxu")
        print(f"# w{width}: head channels {spec.backbone_channels}",
              file=sys.stderr)

    out = {"rows": []}
    for batch in batches:
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 256, (batch, bh, bw, 3), dtype=np.uint8)
        for width, tag in [(wd, f"w{wd}") for wd in widths] + [
                (base_w, f"w{base_w}-repeat")]:
            try:
                step_s, rtt_s = measure_cached_step(
                    engines[width], batch, (bh, bw), h, w, frames=frames)
                row = {"batch": batch, "width": width, "tag": tag,
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
