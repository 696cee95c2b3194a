#!/usr/bin/env python
"""Bracket the wire-to-wire serving ceiling on this host (VERDICT r3 #3).

The lane-physics gate rows measure batcher+engine scheduling over the
committed chip ladders; the full WIRE path (UDP datagrams -> native
recvmmsg/CRC -> decode workers -> batcher -> synthetic measured step ->
result sendmmsg) was only ever measured at 8x60. This driver steps the
offered load 8 -> 16 -> 24 ... streams at 60 FPS through scripts/loadtest.py
(real SimClient streams, native transport, synthetic ladder =
artifacts/step_ladder_topk128.json) and records, per rung:

  server detect p99 (datagram arrival -> result ready), host overhead p99,
  served/offered fps, drops, and whether the CLIENT harness saturated first
  (offered < 95% nominal — beyond that the rung measures the harness).

The knee = the last rung holding detect p99 < 8 ms at full offered rate.
Optionally re-runs the ladder against a 2-shard SO_REUSEPORT fleet
(--fleet 2) at the same offered loads to quantify per-process relief.
Emits one JSON line; findings belong in BENCH_NOTES "wire ceiling".
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def load_ladder() -> tuple:
    for name in ("step_ladder_topk128.json", "step_ladder.json"):
        p = os.path.join(REPO, "artifacts", name)
        if os.path.exists(p):
            with open(p) as f:
                return dict(json.load(f)["ladder"]), name
    raise SystemExit("no committed step ladder found")


def run_rung(streams: int, fps: float, duration: float, ladder: dict,
             external: str = "", port: int = 47788,
             web_port: int = 0) -> dict:
    cmd = [sys.executable, os.path.join(HERE, "loadtest.py"),
           "--streams", str(streams), "--fps", str(fps),
           "--duration", str(duration), "--platform", "cpu",
           "--max-inflight", "2", "--window-ms", "1.0",
           "--width", "320", "--height", "240",
           "--bucket-h", "240", "--bucket-w", "320",
           "--port", str(port),
           "--synthetic-profile", json.dumps(ladder)]
    if external:
        # Against a fleet, statusz covers ONE shard only (the shards each
        # have web_port+shard): server-side rows are per-shard, the
        # client-side fields below cover every stream.
        cmd += ["--external", external]
        if web_port:
            cmd += ["--web-port", str(web_port)]
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          timeout=1200, cwd=REPO)
    line = (proc.stdout.strip().splitlines() or [""])[-1]
    try:
        rep = json.loads(line)
    except ValueError:
        raise RuntimeError(
            f"loadtest {streams}x{fps} emitted no report; stderr tail: "
            f"{proc.stderr.strip().splitlines()[-3:]}")
    nominal = streams * fps
    wall = rep.get("duration_s") or duration
    out = {
        "streams": streams,
        "offered_fps": rep.get("offered_fps"),
        "served_fps": rep.get("served_fps"),
        "detect_p99_ms": rep.get("server_detect_p99_ms"),
        "detect_avg_ms": rep.get("server_detect_avg_ms"),
        "host_overhead_p99_ms": rep.get("host_overhead_p99_ms"),
        "frames_dropped": rep.get("frames_dropped"),
        # Client-side truth across ALL streams (the single-vs-fleet
        # comparison axis: against a fleet the server-side rows above
        # cover only the scraped shard).
        "client_e2e_p99_ms": rep.get("client_e2e_p99_ms"),
        "client_served_fps": round((rep.get("client_samples") or 0) / wall,
                                   1),
    }
    if external:
        out["server_rows_scope"] = "one shard"
    if (rep.get("offered_fps") or 0.0) < 0.95 * nominal:
        out["client_saturated"] = True
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fps", type=float, default=60.0)
    ap.add_argument("--duration", type=float, default=15.0)
    ap.add_argument("--start", type=int, default=8)
    ap.add_argument("--step", type=int, default=8)
    ap.add_argument("--max-streams", type=int, default=64)
    ap.add_argument("--fleet", type=int, default=0,
                    help="also run the ladder against an N-shard "
                         "SO_REUSEPORT fleet (same offered loads)")
    ap.add_argument("--slo-ms", type=float, default=8.0)
    args = ap.parse_args()

    ladder, ladder_name = load_ladder()
    rows = []
    streams = args.start
    while streams <= args.max_streams:
        # Per-rung isolation (review r5): one failed rung (timeout, relay
        # hiccup) must not discard every completed row — the sweep's value
        # is the surviving ladder, same salvage stance as bench.py.
        try:
            row = run_rung(streams, args.fps, args.duration, ladder)
        except Exception as e:  # noqa: BLE001
            print(f"# single {streams}x{args.fps:.0f}: rung FAILED "
                  f"({type(e).__name__}: {e}); continuing", file=sys.stderr)
            rows.append({"streams": streams, "error": str(e)})
            streams += args.step
            continue
        rows.append(row)
        print(f"# single {streams}x{args.fps:.0f}: p99 "
              f"{row['detect_p99_ms']} ms, served {row['served_fps']}"
              f"/{row['offered_fps']} fps, drops {row['frames_dropped']}"
              f"{' CLIENT-SATURATED' if row.get('client_saturated') else ''}",
              file=sys.stderr)
        if row.get("client_saturated"):
            break  # past here the harness, not the server, is measured
        streams += args.step

    fleet_rows = []
    if args.fleet > 1:
        import tempfile
        tmp = tempfile.mkdtemp(prefix="zlt-wire-fleet-")
        cfg_path = os.path.join(tmp, "server.json")
        max_streams = rows[-1]["streams"] if rows else args.max_streams
        with open(cfg_path, "w") as f:
            json.dump({
                "model_path": os.path.join(tmp, "no-model-synthetic.npz"),
                "port": 47788, "web_port": 43100,
                "max_clients": max_streams, "target_fps": args.fps,
                "max_queue_size": 8, "worker_threads": 1,
                "network": {"timeout_ms": 600000,
                            "use_native_transport": True,
                            "reuse_port": True},
                "detection": {"model_width": 416, "model_height": 416},
                "tpu": {"variant": "yolov8n", "num_classes": 4,
                        "batch_buckets": [max(1, max_streams // 2),
                                          max_streams],
                        "frame_buckets": [[240, 320]],
                        "batch_window_ms": 1.0,
                        "synthetic_step_profile": ladder},
            }, f)
        mgr = subprocess.Popen(
            [sys.executable, os.path.join(HERE, "serve_fleet.py"),
             "--config", cfg_path, "--shards", str(args.fleet),
             "--platform", "cpu", "--status-interval", "0"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        try:
            time.sleep(20)  # shards import + bind + warm
            for row in rows:
                if row.get("client_saturated"):
                    break  # the single arm already proved the harness limit
                fr = run_rung(row["streams"], args.fps, args.duration,
                              ladder, external="127.0.0.1:47788",
                              web_port=43100)  # shard 0's web plane
                fleet_rows.append(fr)
                print(f"# fleet{args.fleet} {fr['streams']}x{args.fps:.0f}: "
                      f"client e2e p99 {fr['client_e2e_p99_ms']} ms, "
                      f"client served {fr['client_served_fps']} fps "
                      f"(shard-0 detect p99 {fr['detect_p99_ms']} ms)",
                      file=sys.stderr)
                if fr.get("client_saturated"):
                    break
        finally:
            mgr.terminate()
            try:
                mgr.wait(timeout=15)
            except subprocess.TimeoutExpired:
                mgr.kill()

    clean = [r for r in rows if not r.get("client_saturated")]
    under = [r for r in clean
             if (r.get("detect_p99_ms") or 1e9) < args.slo_ms
             and (r.get("served_fps") or 0) >= 0.98 * (r.get("offered_fps")
                                                       or 1e9)]
    knee = max((r["streams"] for r in under), default=0)
    print(json.dumps({
        "method": "real UDP SimClient streams + native transport + decode "
                  "workers + batcher over the committed chip ladder "
                  "(synthetic measured step); 1-core co-located harness",
        "ladder": ladder_name,
        "fps_per_stream": args.fps,
        "rows": rows,
        "fleet_rows": fleet_rows or None,
        "knee_streams_under_slo": knee,
        "slo_ms": args.slo_ms,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
