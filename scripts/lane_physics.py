"""Full-rate lane physics: the REAL ContinuousBatcher driven at offered load
over a measured device-step ladder (synthetic-step engine).

This is the harness behind the BENCH_NOTES "gate physics" tables: no
UDP/decode — it isolates the scheduling+queueing behavior the BASELINE
p99 < 8 ms condition depends on (batch-window accumulation, bucket
rounding, inflight pipelining, queueing at rho near 1). The device step is
replayed from a committed per-bucket chip ladder
(artifacts/*_step_ladder.json), so rows are reproducible on any host and
compare ladders (model variants, step-cut what-ifs) under identical lane
physics. Conservative bias: the sleep-based synthetic completion adds
~0.5-1 ms/batch that a real device interrupt doesn't.

Usage:
  python scripts/lane_physics.py artifacts/step_ladder.json \
      artifacts/hw_step_ladder.json [--battery gate]
  python scripts/lane_physics.py LADDER.json --streams 40 --window 1

The default "gate" battery per ladder: full 64x60 load at windows 1/8 ms,
the dp=2 point (32 streams at 1920 fps/chip), and single-chip stream-count
ceiling probes (40/48 streams). One JSON line per row to stdout.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")

from zero_latency_yolo_tpu.config import ServerConfig
from zero_latency_yolo_tpu.runtime.engine import InferenceRequest, create_engine
from zero_latency_yolo_tpu.runtime.scheduler import ContinuousBatcher


def run_row(ladder, label, window_ms, rate, streams, duration,
            buckets=(2, 4, 8, 16, 32, 64), inflight=2,
            adaptive=None, slo_ms=8.0):
    """One measured row: drive the real batcher at `rate` submits/s for
    `duration` s against a synthetic engine replaying `ladder` (bucket->ms),
    return latency stats over the steady-state tail (first 20% discarded).

    adaptive: optional second (smaller-serve-size) ladder — the engine then
    runs the REAL adaptive-resolution policy over per-size synthetic
    ladders (primary at 416, the downshift rung at 320) with the given SLO.
    """
    # Buckets must not exceed the MEASURED ladder's top key (review r5):
    # the synthetic engine replays profile[max] for any over-bucket batch,
    # so a backlog batch of 64 against a ladder that stops at 16 would
    # drain ~4x faster than hardware — optimistically deflating the p99
    # gate rows of record exactly in the recovery tail the gate measures.
    top = max(int(k) for k in ladder)
    buckets = tuple(b for b in buckets if b <= top) or (top,)
    tpu = {"variant": "yolov8n", "num_classes": 4,
           "batch_buckets": list(buckets),
           "frame_buckets": [[64, 64]],
           "batch_window_ms": window_ms, "max_inflight": inflight,
           "synthetic_step_profile": ladder}
    if adaptive is not None:
        tpu.update({
            "synthetic_step_profiles": {"416": ladder, "320": adaptive},
            "serve_sizes": [416, 320],
            "adaptive_slo_ms": slo_ms,
        })
    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent.npz",
        "detection": {"model_width": 416, "model_height": 416},
        "tpu": tpu,
    })
    eng = create_engine(cfg)
    lat = []

    def on_result(results):
        now = time.perf_counter()
        for r in results:
            lat.append((now - r.recv_t) * 1e3)

    b = ContinuousBatcher(eng, on_result, max_batch=max(buckets),
                          batch_window_ms=window_ms, max_inflight=inflight)
    b.start()
    # Same host posture the real server applies post-warmup (tpu.gc_tune):
    # CPython GC pauses stop the batcher too, and this harness exists to
    # measure scheduling+queueing, not the interpreter's collector
    # (measured ~2-3x detect-p99 noise cut — BENCH_NOTES host-tail section).
    from zero_latency_yolo_tpu.utils.gcstats import tune_for_latency
    tune_for_latency()
    from zero_latency_yolo_tpu.utils.stats import cpu_times, steal_pct
    steal0 = cpu_times()
    data = np.zeros((32, 32, 3), np.uint8)
    period = 1.0 / rate
    t_end = time.perf_counter() + duration
    fid = 0
    nxt = time.perf_counter()
    try:
        while time.perf_counter() < t_end:
            now = time.perf_counter()
            if nxt > now:
                time.sleep(nxt - now)
            fid += 1
            b.submit(InferenceRequest(client_id=fid % streams + 1, frame_id=fid,
                                      timestamp=fid, width=32, height=32,
                                      data=data))
            nxt += period
            # The submit loop itself can fall behind on a loaded host; cap
            # catch-up bursting at 250 ms so offered rate stays honest.
            if nxt < time.perf_counter() - 0.25:
                nxt = time.perf_counter()
    finally:
        time.sleep(0.3)
        b.stop()
    a = np.asarray(lat[len(lat) // 5:])
    if a.size == 0:
        # Diagnostic row, not an IndexError traceback (review r5): a row
        # that served NOTHING (bad ladder file, engine thread died) must
        # say so — under bench's per-attempt except it would otherwise
        # silently shrink median_of with no hint why.
        return dict(ladder=label, window_ms=window_ms, offered_fps=rate,
                    streams=streams, served_fps=0.0, detect_avg_ms=None,
                    detect_p50_ms=None, detect_p99_ms=None,
                    dropped=eng.frames_dropped.value,
                    error="no results served",
                    cpu_steal_pct=steal_pct(steal0, cpu_times()))
    row = dict(ladder=label, window_ms=window_ms, offered_fps=rate,
               streams=streams,
               served_fps=round(len(lat) / duration, 1),
               detect_avg_ms=round(float(a.mean()), 2),
               detect_p50_ms=round(float(np.percentile(a, 50)), 2),
               detect_p99_ms=round(float(np.percentile(a, 99)), 2),
               dropped=eng.frames_dropped.value,
               # Hypervisor steal over the row (shared-VM diagnostic: 5-10%
               # steal measurably inflates the tail — BENCH_NOTES).
               cpu_steal_pct=steal_pct(steal0, cpu_times()))
    if adaptive is not None:
        row.update(serve_size=eng._serve_size,
                   downshifts=eng.size_downshifts,
                   upshifts=eng.size_upshifts, slo_ms=slo_ms)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ladders", nargs="+",
                    help="step-ladder JSON files ({'ladder': {bucket: ms}, 'variant': ...})")
    ap.add_argument("--battery", default="gate", choices=["gate", "single"],
                    help="gate: full-load/dp2/ceiling rows; single: one row")
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--fps", type=float, default=60.0, help="per-stream rate")
    ap.add_argument("--window", type=float, default=1.0)
    ap.add_argument("--duration", type=float, default=12.0)
    ap.add_argument("--inflight", type=int, default=2)
    ap.add_argument("--adaptive", default=None, metavar="LADDER_320.json",
                    help="second ladder (the 320 rung): run the REAL "
                         "adaptive-resolution policy over per-size ladders")
    ap.add_argument("--slo", type=float, default=8.0,
                    help="adaptive policy SLO ms (with --adaptive)")
    args = ap.parse_args()

    adaptive = (json.load(open(args.adaptive))["ladder"]
                if args.adaptive else None)
    for path in args.ladders:
        doc = json.load(open(path))
        ladder = doc["ladder"]
        label = doc.get("variant", path)
        if adaptive is not None:
            label += "+adaptive320"
        if args.battery == "single":
            rows = [(args.window, args.streams * args.fps, args.streams)]
        else:
            rows = [
                (1.0, 64 * args.fps, 64),   # full BASELINE load, 1 chip
                (8.0, 64 * args.fps, 64),   # ... with batch-32 pacing window
                (1.0, 32 * args.fps, 32),   # dp=2 per-chip share
                (1.0, 40 * args.fps, 40),   # single-chip ceiling probes
                (1.0, 48 * args.fps, 48),
            ]
        for window, rate, streams in rows:
            print(json.dumps(run_row(ladder, label, window, rate, streams,
                                     args.duration, inflight=args.inflight,
                                     adaptive=adaptive, slo_ms=args.slo)),
                  flush=True)


if __name__ == "__main__":
    main()
