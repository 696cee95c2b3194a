#!/usr/bin/env python
"""Measure SPMD serving's scheduling overhead on the virtual CPU mesh
(VERDICT r3 #4 — the missing datum under the dp=2 gate closure).

The dp2 gate row (`dp2_share_32x60_416`) replays single-device lane physics
at half load; the REAL `tpu.mesh_data=2` engine adds sharded device_put,
multi-device dispatch, and readback assembly that the replay cannot
contain. This script measures that delta directly, CPU-mesh-relative:

  arm A  single-device engine, the production ContinuousBatcher, paced
         load of S streams at R fps, max_batch B
  arm B  tpu.mesh_data=2 engine on a 2-device virtual mesh. Two modes:
         --mode equal-per-shard (default): 2S streams, max_batch 2B —
         equal per-DEVICE compute, the real-hardware shape, but on a
         1-core virtual mesh the second shard's compute SERIALIZES and
         inflates the delta. --mode equal-total: same S streams and
         max_batch B as arm A (sharded B/2 per device) — total compute
         matches on the shared core, so the delta isolates sharding
         dispatch + assembly cost (the mode the r4 conclusion uses).

Both arms serve REAL pico compute (yolov8p @96, f32) through the exact
server path: batcher thread -> infer_batch -> packed readback -> result
conversion. Reported per arm: detect avg/p99 (submit->result), engine
pipeline avg/p99, served fps, batch-size histogram mean. The B-A delta in
per-batch host cost is the SPMD scheduling overhead (absolute numbers are
CPU-mesh-relative; the RATIO/delta is the datum).

Interleaved A/B/A/B reps cancel host drift (CLAUDE.md measurement rule).
Emits one JSON line.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

# The virtual mesh must exist before jax initializes its backend.
_NDEV = 2
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + f" --xla_force_host_platform_device_count={_NDEV}").strip()
else:
    _m = re.search(r"--xla_force_host_platform_device_count=(\d+)", _flags)
    if _m is not None and int(_m.group(1)) < _NDEV:
        os.environ["XLA_FLAGS"] = _flags.replace(
            _m.group(0), f"--xla_force_host_platform_device_count={_NDEV}")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def build_engine(path: str, mesh_data: int, batch: int):
    from zero_latency_yolo_tpu.config import ServerConfig
    from zero_latency_yolo_tpu.runtime.engine import InferenceEngine
    cfg = ServerConfig.from_dict({
        "model_path": path,
        "confidence_threshold": 0.1,
        "detection": {"model_width": 96, "model_height": 96},
        "tpu": {"variant": "yolov8p", "num_classes": 4, "dtype": "float32",
                "pre_nms_topk": 64,
                "batch_buckets": sorted({batch, max(batch // 2, 1)}),
                "frame_buckets": [[96, 96]],
                "mesh_data": mesh_data},
    })
    return InferenceEngine(cfg)


def run_arm(engine, streams: int, fps: float, max_batch: int,
            duration_s: float, frames: np.ndarray) -> dict:
    from zero_latency_yolo_tpu.runtime.engine import InferenceRequest
    from zero_latency_yolo_tpu.runtime.scheduler import ContinuousBatcher

    lat = []
    done = []

    def on_result(results):
        now = time.perf_counter()
        for r in results:
            # recv_t carries the request's enqueue_t through the batcher:
            # now - recv_t is the server's detect latency (submit->result).
            lat.append((now - r.recv_t) * 1e3)
        done.append(len(results))

    b = ContinuousBatcher(engine, on_result, max_batch=max_batch,
                          batch_window_ms=1.0)
    b.start()
    try:
        # Warm the serving programs through the batcher before timing: keep
        # submitting until results flow (first dispatch pays XLA compile —
        # seconds to minutes on a contended host).
        deadline = time.perf_counter() + 600.0
        warmed = 0
        while sum(done) < 3 * max_batch and time.perf_counter() < deadline:
            for i in range(max_batch):
                b.submit(InferenceRequest(client_id=i + 1, frame_id=0,
                                          timestamp=0, width=96, height=96,
                                          data=frames[i % len(frames)]))
                warmed += 1
            time.sleep(0.5)
        if not sum(done):
            raise RuntimeError("warmup produced no results in 600 s")
        lat.clear()
        done.clear()

        interval = 1.0 / fps
        t_end = time.perf_counter() + duration_s
        fid = 1
        next_t = time.perf_counter()
        submitted = 0
        while time.perf_counter() < t_end:
            # One pacing tick submits a frame for EVERY stream (the server's
            # per-client cadence collapses to this under uniform load).
            for c in range(streams):
                b.submit(InferenceRequest(client_id=c + 1, frame_id=fid,
                                          timestamp=0, width=96, height=96,
                                          data=frames[(fid + c) % len(frames)]))
                submitted += 1
            fid += 1
            next_t += interval
            dt = next_t - time.perf_counter()
            if dt > 0:
                time.sleep(dt)
        time.sleep(1.0)  # drain
    finally:
        b.stop()
    arr = np.asarray(lat) if lat else np.zeros(1)
    st = engine.status()  # all-string by contract (reference getStatus)
    return {
        "streams": streams, "max_batch": max_batch,
        "offered_fps": round(streams * fps, 1),
        "served_fps": round(sum(done) / duration_s, 1),
        "detect_avg_ms": round(float(arr.mean()), 2),
        "detect_p99_ms": round(float(np.percentile(arr, 99)), 2),
        "pipeline_avg_ms": round(float(st.get("pipeline_avg_ms", 0.0)), 2),
        "pipeline_p99_ms": round(float(st.get("pipeline_p99_ms", 0.0)), 2),
        "results": int(sum(done)),
    }


def main() -> int:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=4,
                    help="single-device arm stream count (dp2 arm gets 2x "
                         "in equal-per-shard mode)")
    ap.add_argument("--fps", type=float, default=30.0)
    ap.add_argument("--batch", type=int, default=4,
                    help="single-device max_batch (dp2 arm gets 2x in "
                         "equal-per-shard mode)")
    ap.add_argument("--mode", default="equal-per-shard",
                    choices=("equal-per-shard", "equal-total"),
                    help="equal-per-shard: dp2 serves 2x streams at 2x "
                         "batch (equal per-DEVICE compute — the real-"
                         "hardware comparison, but on a 1-core virtual "
                         "mesh the second shard's compute serializes and "
                         "inflates the delta). equal-total: both arms "
                         "serve the SAME streams/batch (dp2 shards it "
                         "batch/2 per device) — total compute matches on "
                         "a shared core, so the delta isolates sharding "
                         "dispatch + assembly cost.")
    ap.add_argument("--duration", type=float, default=10.0)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < _NDEV:
        raise SystemExit(f"virtual mesh failed: {len(jax.devices())} devices")

    import tempfile

    from zero_latency_yolo_tpu.models import get_spec, init_params, save_params
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    path = os.path.join(tempfile.mkdtemp(), "m.npz")
    save_params(params, path)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (16, 96, 96, 3), dtype=np.uint8)

    per_shard = args.mode == "equal-per-shard"
    if not per_shard and args.batch % 2:
        # The dp2 engine drops odd buckets (mesh divisibility) and would
        # silently batch at a SMALLER bucket than the single arm,
        # breaking the equal-total premise.
        raise SystemExit("--mode equal-total needs an even --batch "
                         "(the dp2 engine shards it batch/2 per device)")
    dp2_batch = 2 * args.batch if per_shard else args.batch
    dp2_streams = 2 * args.streams if per_shard else args.streams
    single = build_engine(path, 1, args.batch)
    dp2 = build_engine(path, 2, dp2_batch)
    assert dp2.mesh is not None, "dp2 engine did not build a mesh"

    rows = {"single": [], "dp2": []}
    for rep in range(args.reps):
        # Interleaved A/B within one window: host drift cancels.
        rows["single"].append(run_arm(single, args.streams, args.fps,
                                      args.batch, args.duration, frames))
        rows["dp2"].append(run_arm(dp2, dp2_streams, args.fps,
                                   dp2_batch, args.duration, frames))
        print(f"# rep {rep}: single p99 "
              f"{rows['single'][-1]['detect_p99_ms']} ms, dp2 p99 "
              f"{rows['dp2'][-1]['detect_p99_ms']} ms", file=sys.stderr)

    def med(key, arm):
        vals = sorted(r[key] for r in rows[arm])
        return vals[(len(vals) - 1) // 2]

    out = {
        "method": f"interleaved A/B, real pico compute, production "
                  f"batcher, {args.mode}; CPU-mesh-relative",
        "single": {k: med(k, "single") for k in rows["single"][0]},
        "dp2": {k: med(k, "dp2") for k in rows["dp2"][0]},
        "reps": args.reps,
        "detect_avg_delta_ms": round(med("detect_avg_ms", "dp2")
                                     - med("detect_avg_ms", "single"), 2),
        "detect_p99_delta_ms": round(med("detect_p99_ms", "dp2")
                                     - med("detect_p99_ms", "single"), 2),
        "pipeline_avg_delta_ms": round(med("pipeline_avg_ms", "dp2")
                                       - med("pipeline_avg_ms", "single"), 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
