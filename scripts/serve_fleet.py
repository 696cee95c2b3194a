#!/usr/bin/env python
"""Launch N detection-server shards on ONE UDP port (SO_REUSEPORT fleet).

The kernel flow-hashes clients across the shard group (sticky per 4-tuple),
so every client keeps talking to one shard for its whole session — sessions,
trackers, and the device frame cache stay process-local with zero cross-shard
coordination. This is the production scale-out for both axes at once:

  * host CPU: each shard is its own process (own GIL, own decode workers,
    own event loop) — N shards on N cores replaces the one-process ceiling
    this 1-core dev box measures (docs/BENCH_NOTES round 3);
  * TPU chips: give each shard its own chip (--device-env, e.g.
    TPU_VISIBLE_DEVICES={shard}) and the fleet IS the measured dp=2 gate
    closure — 32 streams/chip serves detect p99 < 8 ms (BENCH_NOTES
    "the gate closes with data-parallel serving").

Derived per shard from the base config: network.reuse_port=true (and no
port+1 fallback), web_port+shard (0 stays 0), log_file-<shard>,
stats_file-<shard>, cpu_core_id+shard (when use_cpu_affinity).

Usage:
  python scripts/serve_fleet.py --config configs/server.json --shards 2 \
      [--platform cpu] [--device-env 'TPU_VISIBLE_DEVICES={shard}']

Reference contrast: the reference is a single process with worker threads
racing one queue (src/inference/onnx_engine.cpp:315-470) and has no
multi-process story at all; SO_REUSEPORT sharding is the standard kernel
mechanism a from-scratch rebuild should use instead.
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import time
import urllib.request

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def derive_shard_config(base: dict, shard: int) -> dict:
    cfg = json.loads(json.dumps(base))  # deep copy
    net = cfg.setdefault("network", {})
    net["reuse_port"] = True
    web = int(net.get("web_port", cfg.get("web_port", 8080) or 0))
    if web:
        net["web_port"] = web + shard
    cfg.pop("web_port", None)  # the top-level alias would override network.*
    logging_cfg = cfg.setdefault("logging", {})
    log_file = logging_cfg.get("log_file", "logs/server.log")
    root, ext = os.path.splitext(log_file)
    logging_cfg["log_file"] = f"{root}-{shard}{ext}"
    analytics = cfg.get("analytics") or {}
    stats = analytics.get("stats_file")
    if stats:
        root, ext = os.path.splitext(stats)
        analytics["stats_file"] = f"{root}-{shard}{ext}"
        cfg["analytics"] = analytics
    if cfg.get("use_cpu_affinity"):
        cfg["cpu_core_id"] = int(cfg.get("cpu_core_id", 0)) + shard
    return cfg


def shard_status(cfg: dict) -> dict:
    web = int(cfg.get("network", {}).get("web_port", 0) or 0)
    if not web:
        return {}
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{web}/statusz", timeout=2) as r:
            return json.loads(r.read())
    except Exception:  # noqa: BLE001 — shard booting or busy
        return {}


def main() -> int:
    ap = argparse.ArgumentParser(
        description="SO_REUSEPORT fleet of detection-server shards")
    ap.add_argument("--config", default="configs/server.json")
    ap.add_argument("--shards", type=int, default=2)
    ap.add_argument("--platform", default="",
                    help="forwarded to every shard (e.g. cpu)")
    ap.add_argument("--device-env", default="",
                    help="per-shard env assignment with {shard} substituted, "
                         "e.g. 'TPU_VISIBLE_DEVICES={shard}' to give each "
                         "shard its own chip")
    ap.add_argument("--status-interval", type=float, default=10.0,
                    help="seconds between aggregated status lines (0=off)")
    args = ap.parse_args()
    if args.shards < 1:
        ap.error("--shards must be >= 1")

    with open(args.config, "r", encoding="utf-8") as f:
        base = json.load(f)

    tmp = tempfile.mkdtemp(prefix="zlt-fleet-")
    procs = []
    shard_cfgs = []
    for shard in range(args.shards):
        cfg = derive_shard_config(base, shard)
        path = os.path.join(tmp, f"shard-{shard}.json")
        with open(path, "w", encoding="utf-8") as f:
            json.dump(cfg, f, indent=2)
        env = dict(os.environ)
        if args.device_env:
            key, _, val = args.device_env.partition("=")
            env[key] = val.format(shard=shard)
        cmd = [sys.executable, "-m", "zero_latency_yolo_tpu.runtime.server",
               "--config", path]
        if args.platform:
            cmd += ["--platform", args.platform]
        procs.append(subprocess.Popen(cmd, cwd=REPO, env=env))
        shard_cfgs.append(cfg)
        print(f"shard {shard}: pid={procs[-1].pid} config={path} "
              f"web_port={cfg.get('network', {}).get('web_port', 0)}",
              flush=True)

    stopping = False

    def _forward(signum, _frame):
        nonlocal stopping
        stopping = True
        for p in procs:
            if p.poll() is None:
                p.send_signal(signum)

    signal.signal(signal.SIGINT, _forward)
    signal.signal(signal.SIGTERM, _forward)

    last_status = time.time()
    exit_code = 0
    while True:
        alive = [p for p in procs if p.poll() is None]
        if not alive:
            break
        if not stopping and len(alive) < len(procs):
            # A shard died: the surviving group keeps the port, but the dead
            # shard's flows rebalance to survivors mid-session (they will
            # re-handshake on timeout). Shut the fleet down loudly rather
            # than limp with silent capacity loss.
            dead = [i for i, p in enumerate(procs) if p.poll() is not None]
            print(f"shard(s) {dead} exited; stopping fleet", file=sys.stderr)
            exit_code = 1
            _forward(signal.SIGTERM, None)
        if (args.status_interval and not stopping
                and time.time() - last_status >= args.status_interval):
            stats = [shard_status(c) for c in shard_cfgs]
            clients = sum(int(s.get("clients", 0)) for s in stats)
            served = sum(float(s.get("served_fps", 0) or 0) for s in stats)
            per = "/".join(str(s.get("clients", "?")) for s in stats)
            print(f"fleet: clients={clients} ({per}) served_fps={served:.0f}",
                  flush=True)
            last_status = time.time()
        time.sleep(0.5)
    return exit_code


if __name__ == "__main__":
    sys.exit(main())
