"""Headline benchmark: YOLOv8n@416 serving throughput + p99 detect latency.

Measures the full fused device serving step (uint8 frame batch H2D ->
letterbox -> YOLOv8n bf16 -> DFL decode -> class-weighted NMS -> small D2H),
i.e. the per-frame work of the 64-stream serving configuration, in
steady state with two batches in flight (H2D/compute overlap, as the
continuous batcher runs it).

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/sec/chip", "vs_baseline": r}

vs_baseline is measured fps / 3840 (the BASELINE.json north star:
64 streams x 60 FPS on one chip). The reference system's own ceiling was
60 FPS total on CPU (README claim; SURVEY §6) — parity with that is 0.016.
"""

import json
import os
import sys
import time

import numpy as np

# ZLT_BENCH_SMOKE=1: tiny shapes on CPU to validate bench mechanics in CI.
SMOKE = os.environ.get("ZLT_BENCH_SMOKE") == "1"


def _wait_for_device(max_wait_s: float = 900.0) -> None:
    """The axon TPU relay wedges for minutes at a time, and a wedged first
    device op hangs the WHOLE process — so probe from a subprocess (with a
    timeout) and only touch the device here once a probe succeeds. Gives up
    after max_wait_s and proceeds (per-combo try/except still applies)."""
    import subprocess
    probe = ("import jax, numpy as np, jax.numpy as jnp;"
             "np.asarray(jnp.arange(3.).sum())")
    deadline = time.time() + max_wait_s
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=90)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            print("# device probe never succeeded; proceeding anyway",
                  file=sys.stderr)
            return
        print("# device relay wedged; retrying probe", file=sys.stderr)
        time.sleep(120)


def main() -> None:
    if os.environ.get("ZLT_BENCH_CHILD") == "1":
        _device_sweep_child()
        return
    variant = "yolov8p" if SMOKE else "yolov8n"
    size = 64 if SMOKE else 416
    if not SMOKE:
        _wait_for_device()
    # The device sweep runs in a CHILD process under a hard timeout: a relay
    # that wedges MID-sweep hangs the dispatching process with no exception
    # to catch, and a hung bench records nothing — not even the CPU-side
    # host-path gate rows. The child streams one row per finished combo
    # (flushed), so a timeout still salvages every completed measurement.
    results, device, fail = _device_sweep_watchdogged()

    if not results:
        # Device unreachable all round: still measure the host path (it
        # replays the committed artifacts/step_ladder.json on CPU) so the
        # round records the p99-gate rows; throughput honestly reports 0,
        # and `error` distinguishes a sweep that never ran (timeout /
        # startup crash) from one that ran and lost every combo.
        host_path = _host_path_loadtest({})
        out = {"metric": f"{variant}_{size}_serve_throughput",
               "value": 0.0, "unit": "frames/sec/chip",
               "vs_baseline": 0.0,
               "error": fail or "all combos failed",
               "device": device}
        if host_path is not None:
            out["host_path"] = _host_path_summary(host_path)
        gate = _gate_rows()
        if gate is not None:
            out["gate"] = gate
        prior = _last_committed_chip_numbers()
        if prior:
            # Context, not a claim: the most recent chip-side measurement
            # COMMITTED in-tree (the host-path rows above replay its step
            # ladder). value stays 0.0 — nothing ran on hardware this time.
            out["last_committed_measurement"] = prior
        print(json.dumps(out))
        return
    live = None if SMOKE else _live_loadtest()
    host_path = _host_path_loadtest(results)
    gate = _gate_rows()
    _report(results, variant, size, live, host_path, device, gate)


def _device_sweep_watchdogged():
    """Run _device_sweep_child in a subprocess; parse its streamed rows.
    Returns (results, device_str). Salvages partial rows on timeout/crash."""
    import subprocess
    timeout_s = float(os.environ.get("ZLT_BENCH_DEVICE_TIMEOUT", "2700"))
    env = dict(os.environ, ZLT_BENCH_CHILD="1")
    stdout, fail = "", None
    try:
        # stderr passes through live (only stdout carries the parsed rows):
        # the per-combo progress lines are the only external sign a long
        # relayed sweep is healthy rather than wedged.
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        stdout = proc.stdout or ""
        if proc.returncode != 0:
            fail = f"device sweep child exited {proc.returncode}"
    except subprocess.TimeoutExpired as e:
        s = e.stdout
        stdout = s.decode(errors="replace") if isinstance(s, bytes) else (s or "")
        fail = f"device sweep timed out after {timeout_s:.0f}s"
        print(f"# {fail}; salvaging completed rows", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        fail = f"device sweep child failed: {type(e).__name__}: {e}"
        print(f"# {fail}", file=sys.stderr)
    results, device = {}, "unknown"
    for line in stdout.splitlines():
        if line.startswith("ROW "):
            try:
                row = json.loads(line[4:])
                key = (row.pop("batch"), row.pop("mode"), row.pop("source"))
                results[key] = row
            except Exception:  # noqa: BLE001 — a torn line must not zero the rest
                pass
        elif line.startswith("DEV "):
            device = line[4:].strip()
    if not results and device == "unknown" and fail is None:
        # Child ran to completion but produced nothing device-side.
        fail = "device sweep produced no rows"
    return results, device, fail


def _device_sweep_child() -> None:
    """Child process: the actual device measurements. One flushed "ROW {...}"
    line per combo so the parent can salvage partial progress."""
    import jax
    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache: rebench/restart skips the (slow, relayed)
    # XLA compiles entirely.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — older jax without these flags
        pass
    from zero_latency_yolo_tpu.config import ServerConfig
    from zero_latency_yolo_tpu.models.yolov8 import get_spec, init_params

    variant = "yolov8p" if SMOKE else "yolov8n"
    size = 64 if SMOKE else 416
    bh, bw = (96, 96) if SMOKE else (608, 800)
    h, w = (64, 96) if SMOKE else (600, 800)
    # (batch, preprocess_mode, frame_source). "cached" = frames resident in
    # the device frame cache (the steady-state ROI/continuous-batching
    # serving mode — BASELINE configs 3/5): only deltas cross the host link.
    # "hosted" re-uploads the full frame batch per step; through the axon
    # relay that path measures tunnel bandwidth, not the chip, so cached is
    # the headline.
    # Measured on v5e: the gather-form letterbox is pathological on TPU
    # (~160 ms/step at batch 32) and the hosted-upload path is bound by the
    # axon relay (~20 MB/s), so the sweep covers the MXU letterbox over the
    # device cache at the fps-optimal (64) and p99-optimal (32) batch sizes,
    # plus the int8 backbone.
    # Batch 128 fills the 128 VPU lanes (the trace shows batch as the lane
    # dim on elementwise tails — BENCH_NOTES round 2); 192/256 regress
    # (HBM pressure). 32 stays the p99-optimal config.
    combos = (((2, "letterbox", "cached"), (2, "letterbox_mxu", "cached"),
               (2, "letterbox", "hosted")) if SMOKE else
              ((32, "letterbox_mxu", "cached"),
               (64, "letterbox_mxu", "cached"),
               (128, "letterbox_mxu", "cached"),
               (128, "letterbox_mxu", "cached_int8")))

    # pre_nms_topk 128: the shipped 64-stream example configs' value,
    # measured −4/−5.5% step at batch 128/32 vs the 256 library default in
    # a same-session A/B (416, round 3); accuracy holds even at eval conf
    # 0.25 (mAP50 −0.001, recall −0.007 on the 64-image gate). The bench
    # measures the executable those configs serve.
    cfg = ServerConfig.from_dict({
        "confidence_threshold": 0.5,
        "nms_threshold": 0.45,
        "detection": {"model_width": size, "model_height": size},
        "tpu": {"variant": variant, "num_classes": 4, "dtype": "bfloat16",
                "batch_buckets": sorted({b for b, _, _ in combos}),
                "pre_nms_topk": 128,
                "frame_buckets": [[bh, bw]]},
    })
    spec = get_spec(variant, 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)

    rng = np.random.default_rng(0)
    results = {}
    print(f"DEV {jax.devices()[0]}", flush=True)
    for batch, mode, source in combos:
        try:
            _run_combo(cfg, params, batch, mode, source, bh, bw, h, w, rng,
                       results)
            row = dict(results[(batch, mode, source)],
                       batch=batch, mode=mode, source=source)
            print(f"ROW {json.dumps(row)}", flush=True)
        except Exception as e:  # noqa: BLE001 — one bad combo must not zero the round
            print(f"# batch={batch} mode={mode} src={source} FAILED: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)


def _live_loadtest():
    """Measured p99 under offered load: run scripts/loadtest.py (64 live
    SimClient streams at 60 FPS against a real server process on this
    device) and return its report. Returns None on any failure — the
    throughput headline must not depend on the live phase."""
    import subprocess
    here = os.path.dirname(os.path.abspath(__file__))
    cmd = [sys.executable, os.path.join(here, "scripts", "loadtest.py"),
           "--streams", "64", "--fps", "60", "--duration", "12",
           "--variant", "yolov8n", "--size", "416",
           "--warmup-timeout", "900", "--max-inflight", "32"]
    proc = None
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=1500, cwd=here)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        rep = json.loads(line)
        if not rep.get("served_fps"):
            # The prime phase never completed (relay wedge mid-run): a
            # served=0 row reads as "the server can't serve", which is the
            # wrong claim — omit the live section instead.
            print("# live loadtest served nothing (relay wedge?); omitting",
                  file=sys.stderr)
            return None
        print(f"# live loadtest: served {rep.get('served_fps')} fps, "
              f"server p99 {rep.get('server_detect_p99_ms')} ms",
              file=sys.stderr)
        return rep
    except Exception as e:  # noqa: BLE001
        print(f"# live loadtest failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        if proc is not None and proc.stderr:
            # The subprocess's own last lines say WHY (connect timeout
            # during a relay-wedged prime vs a real crash) — without them
            # a transient wedge is indistinguishable from a regression.
            for ln in proc.stderr.strip().splitlines()[-4:]:
                print(f"#   loadtest stderr: {ln}", file=sys.stderr)
        return None


def _host_path_loadtest(results):
    """MEASURED p99-gate composition (BASELINE.md:29): 64 SimClient streams
    x 60 FPS against a real server whose device step is replayed from the
    MEASURED step-vs-batch ladder (synthetic-step harness). The server's own
    detect p99 then measures host path + real queueing + the measured step —
    on this host's CPU, free of the dev relay's link RTT that drowns the
    live row. Ladder source: artifacts/step_ladder_topk128.json (the
    shipped configs' pre_nms_topk; scripts/step_ladder.py on the chip),
    falling back to the topk-256 step_ladder.json, topped up with this
    run's measured rows."""
    import subprocess
    here = os.path.dirname(os.path.abspath(__file__))
    ladder = {}
    for name in ("step_ladder_topk128.json", "step_ladder.json"):
        try:
            with open(os.path.join(here, "artifacts", name)) as f:
                ladder = dict(json.load(f).get("ladder", {}))
            break
        except Exception:  # noqa: BLE001 — fall back to this run's rows
            continue
    for (batch, _mode, source), r in results.items():
        if source == "cached" and str(batch) not in ladder:
            ladder[str(batch)] = round(r["step_ms"], 3)
    if not ladder:
        return None
    # Two operating points: few streams = the clean host-path measurement
    # (the 1-core dev box saturates near ~500 pps with its own client
    # harness co-located — BENCH_NOTES round 3); full streams = the
    # saturated-box behavior at the BASELINE offered load.
    configs = ([(2, 10, 5, "clean")] if SMOKE
               else [(8, 60, 15, "clean"), (64, 60, 15, "full")])
    # With a measured 320 chip ladder committed, add the adaptive-policy
    # row: full load over per-size ladders with the REAL downshift policy
    # (the single-chip full-load gate candidate — BENCH_NOTES).
    ladder320 = {}
    # topk-128 ladder first — it matches the SHIPPED configs' pre_nms_topk
    # (review r5: mixing a topk-256 320 rung with a topk-128 416 rung
    # understated the shipped adaptive config's downshift headroom 5-8%).
    for name in ("n320_topk128_step_ladder.json", "n320_step_ladder.json"):
        try:
            with open(os.path.join(here, "artifacts", name)) as f:
                ladder320 = dict(json.load(f).get("ladder", {}))
            break
        except Exception:  # noqa: BLE001 — row only exists once measured
            continue
    if ladder320 and not SMOKE:
        configs.append((64, 60, 15, "full_adaptive"))
    out = {}
    for streams, fps, dur, label in configs:
        cmd = [sys.executable, os.path.join(here, "scripts", "loadtest.py"),
               "--streams", str(streams), "--fps", str(fps),
               "--duration", str(dur), "--platform", "cpu",
               "--max-inflight", "2", "--window-ms", "1.0",
               "--width", "320", "--height", "240",
               "--bucket-h", "240", "--bucket-w", "320"]
        if label == "full_adaptive":
            cmd += ["--adaptive-profiles",
                    json.dumps({"416": ladder, "320": ladder320}),
                    "--adaptive-slo", "8.0"]
        else:
            cmd += ["--synthetic-profile", json.dumps(ladder)]
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=900, cwd=here)
            line = (proc.stdout.strip().splitlines() or [""])[-1]
            rep = json.loads(line)
            print(f"# host-path loadtest [{label}] {streams}x{fps}: "
                  f"detect p99 {rep.get('server_detect_p99_ms')} ms, "
                  f"host overhead p99 {rep.get('host_overhead_p99_ms')} ms",
                  file=sys.stderr)
            out[label] = rep
        except Exception as e:  # noqa: BLE001
            print(f"# host-path loadtest [{label}] failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
    return out or None


def _run_combo(cfg, params, batch, mode, source, bh, bw, h, w, rng, results):
    import jax
    import jax.numpy as jnp
    from zero_latency_yolo_tpu.runtime.engine import InferenceEngine
    if source.endswith("_int8"):
        import dataclasses
        cfg = dataclasses.replace(cfg)  # shallow copy is fine: tpu replaced below
        cfg.tpu = dataclasses.replace(cfg.tpu, quantize_int8=True)
    engine = InferenceEngine(cfg, params=params, preprocess_mode=mode)
    frames = rng.integers(0, 256, (batch, bh, bw, 3), dtype=np.uint8)
    heights = jnp.full((batch,), h, jnp.int32)
    widths = jnp.full((batch,), w, jnp.int32)
    cw, conf, iou = engine._class_weights, engine._conf, engine._iou
    p = engine._params

    # Timing method: the shared RTT-cancelling pipeline harness
    # (utils/bench_util.py — see its docstring for why readback-based
    # timing is impossible through the relay).
    from zero_latency_yolo_tpu.utils.bench_util import (
        measure_cached_step, pipeline_step_seconds)
    if source.startswith("cached"):
        # Steady-state serving: frames live in the HBM frame cache —
        # measured as the EXACT fused gather+serve executable the
        # ContinuousBatcher dispatches (the ONE shared harness, so the
        # headline is the serving program, not a twin).
        step_s, rtt_s = measure_cached_step(engine, batch, (bh, bw),
                                            h, w, frames=frames)
    else:
        step = engine.get_step(batch, (bh, bw))

        def run_once():
            # Fresh H2D per step (full-frame upload serving mode; through
            # the axon relay this measures tunnel bandwidth).
            return step(p, jnp.asarray(frames), heights, widths, cw,
                        conf, iou)

        step_s, rtt_s = pipeline_step_seconds(run_once)
    fps = batch / step_s
    results[(batch, mode, source)] = {
        "fps": fps,
        "step_ms": step_s * 1e3,
        "p99_step_ms": step_s * 1e3,  # amortized estimate (see method note)
        "relay_rtt_ms": rtt_s * 1e3,
    }
    print(f"# batch={batch} mode={mode} src={source}: {fps:.0f} fps, "
          f"step={step_s*1e3:.2f} ms (link rtt {rtt_s*1e3:.0f} ms)",
          file=sys.stderr)


def _last_committed_chip_numbers():
    """The most recent chip-side measurements COMMITTED in-tree, for the
    device-unreachable fallback report: the step ladder the host-path rows
    replay, plus the last round's recorded headline. Clearly labeled as
    prior context — `value` stays 0.0 when nothing ran on hardware."""
    here = os.path.dirname(os.path.abspath(__file__))
    out = {}
    for name in ("step_ladder_topk128.json", "step_ladder.json"):
        try:
            with open(os.path.join(here, "artifacts", name)) as f:
                lad = json.load(f)
            out["step_ladder_ms"] = lad.get("ladder")
            out["step_ladder_device"] = lad.get("device")
            break
        except Exception:  # noqa: BLE001
            continue
    # Newest committed round first (review r5: a hardcoded r02/r01 pair
    # kept citing a stale round as "the most recent" once r03+ landed).
    import glob as _glob
    records = sorted(_glob.glob(os.path.join(here, "BENCH_r*.json")),
                     reverse=True)
    for prev in records:
        try:
            with open(prev) as f:
                rec = json.load(f).get("parsed") or {}
            if rec.get("value"):
                out["prior_round"] = {
                    "file": os.path.basename(prev), "value": rec["value"],
                    "unit": rec.get("unit"),
                    "vs_baseline": rec.get("vs_baseline")}
                break
        except Exception:  # noqa: BLE001
            continue
    return out or None


def _host_path_summary(host_path):
    """The reported subset of a host-path loadtest row (shared between the
    normal report and the device-unreachable fallback)."""
    out = {}
    for label, rep in host_path.items():
        nominal = ((rep.get("streams") or 0)
                   * (rep.get("fps_per_stream") or 0.0))
        row = {
            "synthetic_ladder": True,
            "streams": rep.get("streams"),
            "offered_fps": rep.get("offered_fps"),
            "served_fps": rep.get("served_fps"),
            "server_detect_p99_ms": rep.get("server_detect_p99_ms"),
            "server_detect_avg_ms": rep.get("server_detect_avg_ms"),
            "host_overhead_p99_ms": rep.get("host_overhead_p99_ms"),
            "host_overhead_avg_ms": rep.get("host_overhead_avg_ms"),
            "frames_dropped": rep.get("frames_dropped"),
            **({"serve_size": rep.get("serve_size"),
                "size_downshifts": rep.get("size_downshifts")}
               if rep.get("serve_size") else {}),
        }
        if nominal and (rep.get("offered_fps") or 0.0) < 0.9 * nominal:
            # The co-located client harness could not OFFER the nominal
            # rate on this host (1-core dev box saturates near ~900 pps):
            # the row shows host saturation, not the serving gate — the
            # `gate` section below is the measurement of record.
            row["client_saturated"] = True
            row["note"] = ("client harness saturated this 1-core host; "
                           "latency/drops reflect harness backlog, not "
                           "serving capacity — see the gate rows")
        out[label] = row
    return out


def _gate_rows():
    """The p99-gate rows of record (BENCH_NOTES round-3 gate sections):
    scripts/lane_physics.py drives the REAL ContinuousBatcher at offered
    load over COMMITTED chip step ladders (no UDP/decode, conservative by
    ~0.5-1 ms/batch). CPU-only — runs even when the relay is wedged, so
    every round records the gate against the latest committed ladders."""
    import subprocess
    here = os.path.dirname(os.path.abspath(__file__))
    art = os.path.join(here, "artifacts")
    dp2_ladder = ("step_ladder_topk128.json" if os.path.exists(
        os.path.join(art, "step_ladder_topk128.json")) else "step_ladder.json")
    rows = [
        # Full BASELINE load on ONE chip: the 320 serve rung at the
        # example config's topk 128 (configs/examples/server-64stream-320).
        ("full_64x60_320rung", "n320_topk128_step_ladder.json", 64),
        # dp=2 per-chip share at full accuracy (416, shipped topk).
        ("dp2_share_32x60_416", dp2_ladder, 32),
        # BASELINE config 4: yolov8s@640, 16 streams (no sub-8ms SLO of its
        # own; the row records full-rate service + measured p99). The
        # topk-128 ladder matches the shipped config (measured ~null vs
        # 256 at s-width 640 — BENCH_NOTES config-4 r4 section).
        ("cfg4_16x60_s640", "s640_topk128_step_ladder.json", 16),
        # Config 4's adaptive closure: the 512 serve rung the shipped
        # config's SLO policy downshifts to under pressure (r4).
        ("cfg4_16x60_s512rung", "s512_step_ladder.json", 16),
        # Config 4 at its NATIVE 640 point via dp=2: per-chip share of
        # 16x60 (8 streams/chip; b8 step 5.33 ms vs b16's gate-exceeding
        # 9.6). The r5 lever battery measured every single-chip lever
        # short (artifacts/s640_lever_battery_r5.json) — this row is the
        # 640 closure of record (configs/examples/server-16stream-640-dp2).
        ("cfg4_dp2_share_8x60_s640", "s640_topk128_step_ladder.json", 8),
    ]
    dur = "4" if SMOKE else "15"
    # attempts=5 (was 3): VERDICT r4 weak-#4 — the dp2 row's 2.2x run
    # spread needs an N=5 distribution before near-gate claims harden.
    attempts = 1 if SMOKE else 5
    out = {}
    for label, ladder_name, streams in rows:
        ladder = os.path.join(art, ladder_name)
        if not os.path.exists(ladder):
            continue
        cmd = [sys.executable, os.path.join(here, "scripts",
                                            "lane_physics.py"),
               ladder, "--battery", "single", "--streams", str(streams),
               "--fps", "60", "--window", "1", "--duration", dur]
        reps = []
        for _ in range(attempts):
            try:
                proc = subprocess.run(cmd, capture_output=True, text=True,
                                      timeout=300, cwd=here)
                reps.append(json.loads(proc.stdout.strip().splitlines()[-1]))
            except Exception as e:  # noqa: BLE001 — gate rows must not zero the round
                print(f"# gate row [{label}] failed: {type(e).__name__}: {e}",
                      file=sys.stderr)
        if not reps:
            continue
        # Median-of-N is the row of record (VERDICT r3 weak #4: best-of-N
        # reads as best-case); the best attempt stays a secondary field and
        # every attempt's p99 is recorded. Co-located host noise (this
        # 1-core box also runs the bench itself) is the spread's source.
        # Rows that served nothing (lane_physics diagnostic rows) are not
        # gate evidence; count them out of the median.
        reps = [r for r in reps if r.get("detect_p99_ms") is not None]
        if not reps:
            continue
        ranked = sorted(reps, key=lambda r: r.get("detect_p99_ms") or 1e9)
        rep = ranked[len(ranked) // 2]  # UPPER median for even N: a lost
        # attempt must not flip a near-gate row optimistic (review r5)
        best = ranked[0]
        out[label] = {
            "harness": "lane_physics",
            "streams": rep.get("streams"),
            "offered_fps": rep.get("offered_fps"),
            "served_fps": rep.get("served_fps"),
            "detect_avg_ms": rep.get("detect_avg_ms"),
            "detect_p99_ms": rep.get("detect_p99_ms"),
            "dropped": rep.get("dropped"),
            "median_of": len(reps),
            "detect_p99_ms_best": best.get("detect_p99_ms"),
            "p99_runs_ms": [r.get("detect_p99_ms") for r in reps],
            # Shared-VM diagnostic: an inflated row at high steal is the
            # hypervisor, not a regression (BENCH_NOTES host-tail section).
            "cpu_steal_pct": rep.get("cpu_steal_pct"),
        }
        print(f"# gate row [{label}]: served {rep.get('served_fps')} "
              f"fps, detect p99 {rep.get('detect_p99_ms')} ms median "
              f"(runs: {[r.get('detect_p99_ms') for r in reps]})",
              file=sys.stderr)
    return out or None


def _report(results, variant, size, live=None, host_path=None,
            device="unknown", gate=None):
    # Headline is the bf16 serving point ONLY (review r5): if int8 ever
    # outpaced bf16, max() over all combos would silently swap the
    # metric's accuracy point mid-series and break cross-round
    # comparisons; the int8 row stays a labeled secondary row.
    bf16 = {k: v for k, v in results.items() if "int8" not in k[2]}
    results_for_headline = bf16 or results
    best_key = max(results_for_headline,
                   key=lambda k: results_for_headline[k]["fps"])
    best_batch, best_mode, best_source = best_key
    best = results[best_key]
    target_fps = 64 * 60.0
    out = {
        "metric": f"{variant}_{size}_serve_throughput",
        "value": round(best["fps"], 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(best["fps"] / target_fps, 3),
        "batch": best_batch,
        "preprocess": best_mode,
        "frame_source": best_source,
        "avg_step_ms": round(best["step_ms"], 2),
        "pre_nms_topk": 128,
        "device": device,
    }
    # The latency-optimal configuration (batch 32 + short window) alongside
    # the throughput headline — the two ends of the BASELINE trade-off.
    p99_key = next((k for k in results if k[0] == 32), None)
    if p99_key is not None and p99_key != best_key:
        out["p99_config"] = {
            "batch": 32,
            "fps": round(results[p99_key]["fps"], 1),
            "step_ms": round(results[p99_key]["step_ms"], 2),
        }
    if host_path is not None:
        # MEASURED p99-gate composition: real host path + real queueing +
        # the measured device-step ladder replayed by the synthetic lane
        # (see _host_path_loadtest; the BASELINE p99<8ms condition).
        out["host_path"] = _host_path_summary(host_path)
    if gate is not None:
        # The gate harness of record (_gate_rows): the real batcher at
        # offered load over committed chip ladders, free of the client
        # harness's own saturation on small hosts.
        out["gate"] = gate
    if live is not None:
        # MEASURED under live load (64 SimClient streams at 60 FPS against a
        # real server process; the server's own rolling counters).
        out["live"] = {
            "offered_fps": live.get("offered_fps"),
            "served_fps": live.get("served_fps"),
            "server_detect_p99_ms": live.get("server_detect_p99_ms"),
            "server_detect_avg_ms": live.get("server_detect_avg_ms"),
            "engine_pipeline_p99_ms": live.get("engine_pipeline_p99_ms"),
            "client_e2e_p99_ms": live.get("client_e2e_p99_ms"),
            "frames_dropped": live.get("frames_dropped"),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
