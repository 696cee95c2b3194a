"""TPU inference engine: one jitted program per (batch, frame-bucket).

Replaces the reference OnnxInferenceEngine (src/inference/onnx_engine.cpp) —
its preprocess / session.Run / postprocess hot loops (:649-700, :574-586,
:758-878) become a single XLA program:

    uint8 frames --device--> letterbox -> YOLOv8 -> DFL decode -> weighted NMS

so exactly one H2D copy (the padded frame batch) and one small D2H copy (the
fixed-shape NMS outputs) happen per step, and XLA fuses the elementwise tails
into the convs.

Static-shape discipline: programs are keyed by (batch_bucket, frame_bucket);
batches are padded up to the nearest bucket; per-frame true (h, w) are runtime
scalars, so any client resolution within a bucket hits the same program.

Kept reference semantics: simulation mode when weights are missing
(onnx_engine.cpp:70-75, :1133-1177), SHA-256 hot-reload watcher
(:473-515, :957-1062), rolling avg/p99 latency stats (:428-449),
status() string map (:279-312).
"""

from __future__ import annotations

import os
import random
import threading
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ServerConfig, CS16_CLASS_NAMES
from ..models.yolov8 import (ModelSpec, forward_decoded,
                             forward_decoded_levels, get_spec)
from ..models.weights import file_sha256, load_model
from ..ops.preprocess import letterbox_params
from ..ops import preprocess as pre_ops
from ..ops import nms as nms_ops
from ..protocol import Detection
from ..utils.logging import get_logger
from ..utils.stats import Counter, RollingStats

log = get_logger("engine")

# Measured per-bucket C2f layout choice (scripts/layout_compare.py, yolov8n
# @416 bf16 on v5e, three relay sessions): the slice-free C2f ("split") wins
# only at batch 32 (6.3-6.5 -> 5.6-5.7 ms, −12…14%); it LOSES at 16 (+6.5%)
# and 64/128 (+7-8%) and is a wash at ≤8. tpu.c2f="auto" picks split exactly
# where it measured faster, keyed by the FULL measured serving config
# (variant, model size, dtype) — the win is layout-tiling-specific, so
# unmeasured variants/sizes/dtypes (and all their buckets) stay on the
# default slice form rather than inheriting a yolov8n@416 measurement.
C2F_AUTO_SPLIT = {("yolov8n", 416, "bfloat16"): frozenset({32})}


def resolve_c2f(flag: str, batch: int, variant: str = "yolov8n",
                size: int = 416, dtype: str = "bfloat16") -> str:
    """Per-(serving config, batch-bucket) C2f implementation for
    tpu.c2f="auto"; explicit "slice"/"split" values pass through unchanged
    for every bucket."""
    if flag == "auto":
        split = C2F_AUTO_SPLIT.get((variant, size, dtype), frozenset())
        return "split" if batch in split else "slice"
    return flag


@dataclass
class InferenceRequest:
    client_id: int
    frame_id: int
    timestamp: int
    width: int
    height: int
    data: np.ndarray  # (h, w, 3) uint8 RGB
    keyframe: bool = False
    # Accuracy-SLA floor (client's min_serve_size): the adaptive-resolution
    # policy may downshift the fleet-wide rung, but THIS request must be
    # served at a rung >= min_size (0 = follow the fleet). The scheduler
    # groups a batch by effective rung before dispatching.
    min_size: int = 0
    enqueue_t: float = field(default_factory=time.perf_counter)
    # Stamped at construction = payload-decode completion (the server later
    # rewinds enqueue_t to datagram arrival, so decoded_t - enqueue_t is the
    # arrival -> decoded-and-queued span for per-frame lifecycle traces).
    decoded_t: float = field(default_factory=time.perf_counter)


@dataclass
class PendingBatch:
    """A dispatched-but-unread device step (see InferenceEngine.dispatch)."""
    requests: List["InferenceRequest"]
    out: Optional[Dict[str, Any]]
    t0: float
    n: int
    simulated: Optional[List["EngineResult"]] = None
    # Host staging buffer (hosted path only): held until the batch's results
    # are read back, then recycled via the engine's per-shape free-list.
    staging_key: Optional[Tuple[int, int, int]] = None
    staging_buf: Optional[np.ndarray] = None
    # Synthetic-step mode only: perf_counter time the fake device step
    # "finishes" (complete() blocks until then, _ready() polls against it)
    # and the step duration charged to this batch.
    ready_at: Optional[float] = None
    step_ms: float = 0.0
    # Serve rung this batch ran at (adaptive resolution + per-client
    # accuracy floors); stamped onto each EngineResult for /debugz traces.
    serve_size: int = 0

    @property
    def is_real_device(self) -> bool:
        """True when completion requires a REAL device readback (the only
        kind that can wedge): not simulated, not a synthetic fake step."""
        return (self.out is not None and self.ready_at is None
                and self.simulated is None)


@dataclass
class EngineResult:
    client_id: int
    frame_id: int
    timestamp: int
    detections: List[Detection]
    infer_ms: float = 0.0
    queue_ms: float = 0.0
    # perf_counter stamp of datagram arrival — lets the server compute true
    # recv->sent latency at send time.
    recv_t: float = 0.0
    # Per-frame lifecycle extras (GET /debugz sampling): arrival -> decoded
    # span and the device batch this frame rode in.
    decode_ms: float = 0.0
    batch_n: int = 0
    # Serve rung the frame was letterboxed to (0 = unknown/simulated-flat).
    serve_size: int = 0


def _pick_bucket(buckets: Sequence[Tuple[int, int]], h: int, w: int
                 ) -> Optional[Tuple[int, int]]:
    """Smallest configured bucket covering (h, w); None when none does.
    Oversized frames are shed, never compiled — a per-shape program mint on
    attacker-controlled dimensions would be a compile storm."""
    for bh, bw in sorted(buckets, key=lambda b: b[0] * b[1]):
        if h <= bh and w <= bw:
            return (bh, bw)
    return None


def _start_host_copy(out) -> None:
    """Kick off the D2H transfer of the packed outputs immediately after
    dispatch so it overlaps the next batch's staging/compute — complete()
    then finds the bytes already on host (on a relayed TPU this hides a full
    link RTT per batch)."""
    try:
        out.copy_to_host_async()
    except (AttributeError, RuntimeError):  # backend without async copies
        pass


def _pick_batch(buckets: Sequence[int], n: int) -> int:
    for b in sorted(buckets):
        if n <= b:
            return b
    return max(buckets)


def group_by_bucket(frame_buckets: Sequence[Tuple[int, int]],
                    requests: Sequence["InferenceRequest"]
                    ) -> Dict[Optional[Tuple[int, int]], List["InferenceRequest"]]:
    """Group requests by the frame bucket that covers them (None = none
    does). dispatch() serves one bucket per call, so every multi-bucket
    caller (scheduler, infer_batch) groups with this first."""
    groups: Dict[Optional[Tuple[int, int]], List[InferenceRequest]] = {}
    for r in requests:
        groups.setdefault(_pick_bucket(frame_buckets, r.height, r.width),
                          []).append(r)
    return groups


class InferenceEngine:
    """Synchronous batched compute wrapper; the scheduler owns queues/threads."""

    # An upshift answered by a downshift within this window = failed probe
    # (drives the exponential upshift holddown; see _maybe_adapt).
    _UPSHIFT_PROBE_S = 10.0

    def __init__(self, config: ServerConfig,
                 params: Optional[Dict[str, Any]] = None,
                 preprocess_mode: Optional[str] = None) -> None:
        self.config = config
        tpu = config.tpu
        self.spec: ModelSpec = get_spec(tpu.variant, tpu.num_classes)
        self.model_size = int(config.detection.model_width)
        # Serve-size ladder (adaptive resolution): the fully-convolutional
        # model serves any 32-multiple size from the same params; programs
        # are keyed by size and the CURRENT size is dispatch-lane state.
        ladder = {int(s) for s in getattr(tpu, "serve_sizes", ()) or ()}
        too_big = {s for s in ladder if s > self.model_size}
        if too_big:
            # The policy only trades resolution DOWN from the configured
            # size; a larger rung would let a healthy server upshift ABOVE
            # the operator's baseline (and warm programs nothing should run).
            log.warning("tpu.serve_sizes rungs %s exceed model size %d — "
                        "dropped", sorted(too_big), self.model_size)
            ladder -= too_big
        self.serve_sizes = tuple(sorted(ladder | {self.model_size},
                                        reverse=True))
        self._serve_size = self.model_size
        self.adaptive_slo_ms = float(getattr(tpu, "adaptive_slo_ms", 0.0))
        # Policy state (dispatch lane only): dedicated short window so a
        # size switch is judged on fresh samples, not the 1000-sample tail.
        self._adapt_stats = RollingStats(window=256)
        self._adapt_next_check = 0.0
        self._adapt_hot = 0
        self._adapt_cool = 0
        self.size_downshifts = 0
        self.size_upshifts = 0
        # Upshift holddown (route-flap damping): when an upshift is followed
        # by a downshift within _UPSHIFT_PROBE_S the upper rung FAILED under
        # current load, and retrying it every cool streak oscillates the
        # lane (measured: 640->512 at 16x60 flapped 4 down / 3 up in 40 s,
        # p99 10.2 ms vs the settled rung's ~3 — BENCH_NOTES config-4 r4).
        # Each failed probe doubles the holddown, bounded; a genuine load
        # drop still upshifts once the holddown lapses.
        self._last_upshift_t = -1e9
        self._upshift_fail_streak = 0
        self._upshift_block_until = 0.0
        # Runtime SLO change staged for the dispatch lane
        # (update_adaptive_slo). The lock makes stage/consume atomic: an
        # unlocked read-then-clear on the dispatch lane could silently
        # discard a concurrent update the client was already ACKed for.
        self._staged_slo: Optional[float] = None
        self._slo_lock = threading.Lock()
        # Rungs that have compiled programs (set by warmup): runtime SLO
        # enabling is refused while rungs are cold — a first downshift must
        # never be a cold XLA compile under pressure.
        self._warmed_sizes: Tuple[int, ...] = ()
        if config.detection.model_width != config.detection.model_height:
            raise ValueError("non-square model inputs not supported")
        self.dtype = jnp.bfloat16 if tpu.dtype == "bfloat16" else jnp.float32
        self.preprocess_mode = preprocess_mode or getattr(tpu, "preprocess",
                                                          "letterbox")
        self.batch_buckets = tuple(tpu.batch_buckets)
        self.frame_buckets = tuple(tuple(b) for b in tpu.frame_buckets)
        self.pre_nms_topk = int(tpu.pre_nms_topk)
        self.max_inflight = max(int(getattr(tpu, "max_inflight", 2)), 1)
        nms_cfg = getattr(tpu, "nms", "auto")
        if nms_cfg == "auto":
            # The XLA scan is the default: it compiles everywhere, including
            # TPU relays whose remote-compile service lacks Pallas support
            # (observed: tpu_compile_helper 500s on pallas programs). The
            # Pallas kernel stays opt-in via tpu.nms="pallas".
            nms_cfg = "xla"
        self.nms_impl = nms_cfg
        if (getattr(tpu, "act", "auto") in ("pallas", "pallas_interpret")
                and getattr(tpu, "conv1x1", "xla") != "xla"):
            # Fail at boot, not at the first (lazy) step build: both flags
            # replace the model's conv_fn and cannot compose.
            raise ValueError(
                "tpu.act=pallas and tpu.conv1x1=pallas are mutually exclusive "
                "conv_fn experiments — enable one at a time")

        self.simulation = False
        self._model_hash: Optional[str] = None
        self._failed_hash: Optional[str] = None  # last unloadable file hash
        self._file_sig: Optional[Tuple[int, int]] = None  # (mtime_ns, size)
        if params is None:
            params, self.spec, self.simulation = load_model(
                config.model_path, tpu.variant, tpu.num_classes)
            if not self.simulation:
                try:
                    self._model_hash = file_sha256(config.model_path)
                except OSError:
                    pass
            else:
                log.warning("model %s not loadable — simulation mode active",
                            config.model_path)
        # Host-path measurement harness (docs/BENCH_NOTES): a fixed-duration
        # fake device step stands in for real compute so a loadtest can
        # measure everything AROUND the step on hosts whose device sits
        # behind a high-RTT relay. Forces simulation detections.
        self.synthetic_step_ms = float(getattr(tpu, "synthetic_step_ms", 0.0))
        # Optional per-batch-bucket step ladder (scripts/step_ladder.py
        # measurements): the fake lane then replays the chip's real
        # step-vs-batch curve, so loadtest queueing matches hardware.
        self.synthetic_profile = {
            int(k): float(v)
            for k, v in (getattr(tpu, "synthetic_step_profile", None)
                         or {}).items()}
        # Per-serve-size ladders ({"416": {...}, "320": {...}}): lets the
        # host-path harness exercise the REAL adaptive-resolution policy
        # over measured chip ladders (the fake lane reads _serve_size).
        self.synthetic_profiles = {
            int(size): {int(k): float(v) for k, v in prof.items()}
            for size, prof in (getattr(tpu, "synthetic_step_profiles", None)
                               or {}).items()}
        if self.synthetic_profiles:
            if self.adaptive_slo_ms > 0:
                missing = set(self.serve_sizes) - set(self.synthetic_profiles)
                if missing:
                    raise ValueError(
                        f"tpu.synthetic_step_profiles missing ladders for "
                        f"serve sizes {sorted(missing)}")
            if not self.synthetic_profile:
                self.synthetic_profile = self.synthetic_profiles.get(
                    self.model_size) or next(
                        iter(self.synthetic_profiles.values()))
        if self.synthetic_profile and self.synthetic_step_ms <= 0:
            self.synthetic_step_ms = max(self.synthetic_profile.values())
        if self.synthetic_step_ms > 0:
            if not self.simulation:
                log.warning("synthetic_step_ms=%.2f: device compute DISABLED "
                            "(measurement harness)", self.synthetic_step_ms)
            self.simulation = True
        # perf_counter stamp the previous synthetic step finishes: fake
        # steps serialize like the single real device lane (throughput is
        # bounded at one step per batch, as on hardware).
        self._synthetic_last_ready = 0.0
        # Serving mesh (SURVEY §5.7/§5.8): tpu.mesh_data x tpu.mesh_model > 1
        # runs the serve step SPMD — batch over 'data', params tensor-parallel
        # over 'model' (the inference counterpart of the train shardings).
        self.mesh = None
        md, mm = int(tpu.mesh_data), int(tpu.mesh_model)
        if md * mm > 1 and not self.simulation:
            if len(jax.devices()) >= md * mm:
                from ..parallel.mesh import make_mesh
                self.mesh = make_mesh(md, mm,
                                      devices=jax.devices()[:md * mm])
                log.info("serving mesh active: data=%d model=%d", md, mm)
            else:
                log.warning("tpu.mesh %dx%d needs %d devices, have %d — "
                            "single-device serving", md, mm, md * mm,
                            len(jax.devices()))
        if self.mesh is not None:
            # Batch buckets must divide evenly over the data axis.
            kept = tuple(b for b in self.batch_buckets if b % md == 0)
            if kept != self.batch_buckets:
                log.warning("batch buckets %s -> %s (multiples of data=%d)",
                            self.batch_buckets, kept or (md,), md)
            self.batch_buckets = kept or (md,)

        if self.simulation:
            # Simulation never touches the device; keep params host-side so
            # the server runs even with no accelerator available.
            self._params = params
        else:
            if tpu.quantize_int8:
                params = self._quantize_and_calibrate(params)
            self._params = self._place_params(params)
        self._params_lock = threading.Lock()
        # Host-side staged params from maybe_reload (applied on the
        # dispatch thread by _current_params).
        self._staged_params: Optional[Dict[str, Any]] = None
        # Spec adopted with a sim->real hot swap (file geometry differs from
        # the configured variant); applied with the params on dispatch.
        self._staged_spec = None

        nc = self.spec.num_classes
        names = CS16_CLASS_NAMES if nc == len(CS16_CLASS_NAMES) else tuple(
            f"class_{i}" for i in range(nc))
        weights = config.detection.class_weight_vector(names)
        self._class_weights = jnp.asarray(weights, jnp.float32)
        self._conf = jnp.float32(config.confidence_threshold)
        self._iou = jnp.float32(config.nms_threshold)
        self._thresholds_dirty = False

        self._step_cache: Dict[Tuple[int, int, int], Any] = {}
        # Per-shape free-lists of host staging buffers (see dispatch).
        self._staging: Dict[Tuple[int, int, int], List[np.ndarray]] = {}
        # Jitted row-pad programs keyed by (from_rows, to_rows) — see
        # complete_many.
        self._pad_cache: Dict[Tuple[int, int], Any] = {}

        # Telemetry (reference stats fields, onnx_engine.h:261-273).
        self.inference_count = Counter()
        self.frames_dropped = Counter()
        # Subset of frames_dropped: oversized-frame sheds (client
        # misconfig, load-invariant — excluded from rate-control's drop
        # fraction).
        self.frames_oversized = Counter()
        self.error_count = Counter()
        self.latency = RollingStats()     # dispatch -> readback (pipeline)
        self.e2e_latency = RollingStats()  # submit -> result
        self.synthetic_host = RollingStats()  # e2e minus the fake step
        self.batch_sizes = RollingStats()
        self._rng = random.Random(1337)
        # True once warmup() finished (simulation needs none).
        self.warmed = self.simulation

    def _place_params(self, params):
        """Device placement: tensor-parallel over the serving mesh when one
        is configured, plain device_put otherwise."""
        params = jax.tree.map(jnp.asarray, params)
        if self.mesh is not None:
            from ..parallel.mesh import shard_params
            return shard_params(params, self.mesh)
        return jax.device_put(params)

    def batch_sharding(self, ndim: int = 4):
        """Sharding for batch-leading arrays (frames, cache slots) on the
        serving mesh; None when single-device."""
        if self.mesh is None:
            return None
        from ..parallel.mesh import batch_sharding
        return batch_sharding(self.mesh, ndim)

    def _quantize_and_calibrate(self, params):
        """int8 backbone: per-channel weight quant + static activation scales
        calibrated on synthetic letterboxed samples (dynamic per-conv
        reductions measurably made int8 slower than bf16 on v5e)."""
        from ..ops.quant import calibrate_activations, quantize_params
        qparams = quantize_params(jax.tree.map(jnp.asarray, params))
        rng = np.random.default_rng(0)
        sample = (rng.uniform(0.0, 1.0, (2, self.model_size, self.model_size, 3))
                  .astype(np.float32))
        sample[1] = 114.0 / 255.0  # letterbox-gray frame
        try:
            n = calibrate_activations(qparams, self.spec, sample,
                                      dtype=self.dtype)
            log.info("int8 calibration: %d convs got static scales", n)
        except Exception:  # noqa: BLE001 — fall back to dynamic quant
            log.exception("activation calibration failed; dynamic quant")
        return qparams

    # ------------------------------------------------------------- compile
    def _build_step(self, batch: int, bucket: Tuple[int, int],
                    size: Optional[int] = None):
        size = int(size or self.model_size)
        spec = self.spec
        dtype = self.dtype
        topk = self.pre_nms_topk
        mode = self.preprocess_mode
        stem = getattr(self.config.tpu, "stem", "conv")
        dot1x1 = bool(getattr(self.config.tpu, "dot1x1", False))
        select = getattr(self.config.tpu, "select", "concat")
        c2f_impl = resolve_c2f(getattr(self.config.tpu, "c2f", "auto"), batch,
                               variant=getattr(self.config.tpu, "variant",
                                               "yolov8n"),
                               size=size,
                               dtype=getattr(self.config.tpu, "dtype",
                                             "bfloat16"))
        act_impl = getattr(self.config.tpu, "act", "auto")
        # act/conv1x1 mutual exclusion is enforced at engine boot (__init__).
        conv1x1_impl = getattr(self.config.tpu, "conv1x1", "xla")
        conv_fn = None
        if act_impl in ("pallas", "pallas_interpret"):
            # Flat full-lane bias+SiLU epilogues (ops/act_pallas.py) — the
            # SiLU-tail lever. "auto" stays XLA: the dev relay's
            # remote-compile can't build Pallas (same blocker as tpu.nms).
            from ..ops.act_pallas import make_flat_act_conv
            conv_fn = make_flat_act_conv(
                interpret=(act_impl == "pallas_interpret"))
        elif conv1x1_impl in ("pallas", "pallas_interpret"):
            # 1x1 convs as Pallas matmuls with the bias+SiLU epilogue fused
            # IN the kernel (ops/conv1x1_pallas.py) — the conv+epilogue form
            # of the SiLU-tail lever (the epilogue-only kernel measured
            # 2-4x slower; see act_pallas.py header).
            from ..ops.conv1x1_pallas import make_mm1x1_conv
            conv_fn = make_mm1x1_conv(
                interpret=(conv1x1_impl == "pallas_interpret"))
        if stem == "s2d":
            if not mode.startswith("letterbox"):
                raise ValueError("stem='s2d' requires a letterbox preprocess")
            mode = "letterbox"  # for the scale/pad branch below
            resize = (lambda f, hh, ww, s:
                      pre_ops.letterbox_batch_mxu_s2d(f, hh, ww, s, dtype))
        else:
            resize = {
                "letterbox": pre_ops.letterbox_batch,
                "letterbox_mxu": (lambda f, hh, ww, s:
                                  pre_ops.letterbox_batch_mxu(f, hh, ww, s,
                                                              dtype)),
                "stretch": pre_ops.stretch_batch,
            }[mode]

        def step(params, frames, heights, widths, class_w, conf, iou):
            x = resize(frames, heights, widths, size)
            hf = heights.astype(jnp.float32)
            wf = widths.astype(jnp.float32)
            if mode.startswith("letterbox"):
                scale, pad_x, pad_y = jax.vmap(
                    lambda h, w: letterbox_params(h, w, size))(hf, wf)
                pad = jnp.stack([pad_x, pad_y], axis=-1)
                sy = None
            else:
                # Stretch: independent x/y scales; fold into (scale, pad) form
                # by giving postprocess x-scale and rescaling y coords.
                scale = size / wf
                pad = jnp.zeros((batch, 2), jnp.float32)
                sy = (size / hf) / scale
            src_wh = jnp.stack([wf, hf], axis=-1)
            if select == "perlevel":
                boxes_l, probs_l = forward_decoded_levels(
                    params, spec, x, dtype=dtype, stem=stem,
                    dot1x1=dot1x1, conv_fn=conv_fn, c2f=c2f_impl)
                if sy is not None:
                    boxes_l = [b.at[..., 1].set(b[..., 1] / sy[:, None])
                                .at[..., 3].set(b[..., 3] / sy[:, None])
                               for b in boxes_l]
                out = nms_ops.postprocess_batch_levels(
                    boxes_l, probs_l, class_w, conf, iou, scale, pad,
                    src_wh, topk, self.nms_impl)
            else:
                pred = forward_decoded(params, spec, x, dtype=dtype,
                                       stem=stem, dot1x1=dot1x1,
                                       conv_fn=conv_fn, c2f=c2f_impl)
                if sy is not None:
                    pred = pred.at[..., 1].set(pred[..., 1] / sy[:, None])
                    pred = pred.at[..., 3].set(pred[..., 3] / sy[:, None])
                out = nms_ops.postprocess_batch(
                    pred, class_w, conf, iou, scale, pad, src_wh, topk,
                    self.nms_impl)
            # ONE packed output array => ONE small D2H per batch (not four).
            return nms_ops.pack_outputs(out)

        return jax.jit(step, donate_argnums=(1,))

    def get_step(self, batch: int, bucket: Tuple[int, int],
                 size: Optional[int] = None):
        size = int(size or self._serve_size)
        key = (batch, bucket[0], bucket[1], size)
        fn = self._step_cache.get(key)
        if fn is None:
            fn = self._build_step(batch, bucket, size)
            self._step_cache[key] = fn
        return fn

    def get_step_cached(self, batch: int, bucket: Tuple[int, int],
                        size: Optional[int] = None):
        """Fused variant: slot gather from the device frame cache + the full
        serve step in ONE program (one dispatch per batch; the cache is not
        donated). Signature: (params, cache, shw, cw, conf, iou) with
        shw (3, B) int32 rows [slots, heights, widths] — ONE host upload per
        dispatch instead of three (each H2D transition through a relayed
        TPU costs link latency)."""
        size = int(size or self._serve_size)
        key = ("cached", batch, bucket[0], bucket[1], size)
        fn = self._step_cache.get(key)
        if fn is None:
            inner = self._build_step(batch, bucket, size)

            def step(params, cache, shw, cw, conf, iou):
                return inner(params, cache[shw[0]], shw[1], shw[2],
                             cw, conf, iou)

            fn = jax.jit(step)
            self._step_cache[key] = fn
        return fn

    def warmup(self, batches: Optional[Sequence[int]] = None,
               buckets: Optional[Sequence[Tuple[int, int]]] = None,
               cache=None, inflight: int = 0) -> float:
        """Pre-compile the hot (batch, bucket) grid; returns seconds spent.

        When `cache` (a DeviceFrameCache or its device array) is given, the
        fused cached-gather programs — the ones the live ROI path actually
        runs — are compiled too; otherwise the first live batch per shape
        pays a full XLA compile (tens of seconds through a relayed TPU).
        With `inflight` > 2, the complete_many drain programs for the
        steady-state drain counts are pre-compiled as well (they otherwise
        stall the batcher lane at the FIRST live drain).
        """
        t0 = time.perf_counter()
        # Extra serve-size rungs are only reachable through the adaptive
        # policy; with the SLO unset they would be minutes of cold-boot
        # compile (through a relayed TPU) for programs nothing dispatches.
        warm_sizes = (self.serve_sizes if self.adaptive_slo_ms > 0
                      else (self._serve_size,))
        last_out: Dict[int, Any] = {}
        for b in (batches or self.batch_buckets):
            for bk in (buckets or self.frame_buckets):
                frames = np.zeros((b, bk[0], bk[1], 3), np.uint8)
                hw = np.full((b,), bk[0], np.int32), np.full((b,), bk[1], np.int32)
                # Input placement must MATCH the live dispatch path —
                # committed shardings are part of the jit cache key, so a
                # warmup with uncommitted arrays under a serving mesh would
                # compile executables the live path never hits.
                if self.mesh is not None:
                    frames_d = jax.device_put(frames, self.batch_sharding(4))
                    hs_d = jax.device_put(hw[0], self.batch_sharding(1))
                    ws_d = jax.device_put(hw[1], self.batch_sharding(1))
                else:
                    frames_d = jnp.asarray(frames)
                    hs_d = jnp.asarray(hw[0])
                    ws_d = jnp.asarray(hw[1])
                for sz in warm_sizes:
                    # Every REACHABLE rung pre-compiles: an adaptive
                    # downshift must be a key switch, not a cold compile
                    # right when the engine is already over SLO.
                    # Donation means the buffer dies per call; re-stage it.
                    if sz != warm_sizes[0]:
                        if self.mesh is not None:
                            frames_d = jax.device_put(frames,
                                                      self.batch_sharding(4))
                        else:
                            frames_d = jnp.asarray(frames)
                    out = self.get_step(b, bk, size=sz)(
                        self._params, frames_d, hs_d, ws_d,
                        self._class_weights, self._conf, self._iou)
                    jax.block_until_ready(out)
                last_out[b] = out
        if inflight > 2 and last_out:
            # Drain-path programs: pad-to-max-rows per batch bucket, plus the
            # concat at the hot drain counts (the steady drain-to-one count
            # and a couple of small idle-drain counts; the rest compile
            # lazily, bounded by max_inflight).
            max_rows = max(max(self.batch_buckets),
                           max(int(o.shape[0]) for o in last_out.values()))
            padded = {b: self._pad_rows(o, max_rows)
                      for b, o in last_out.items()}
            probe = next(iter(padded.values()))
            for k in sorted({2, 3, inflight - 1, inflight}):
                if 2 <= k <= inflight:
                    jax.block_until_ready(
                        jnp.concatenate([probe] * k, axis=0))
        if cache is not None:
            if hasattr(cache, "warm"):
                cache.warm()  # pre-compile write programs too
            locked = (cache.run_locked if hasattr(cache, "run_locked")
                      else (lambda fn, _c=cache: fn(_c)))
            for b in (batches or self.batch_buckets):
                def launch(arr, b=b):
                    # Under the cache lock: a concurrent keyframe write
                    # donates the buffer and would leave us dispatching on
                    # a deleted array.
                    bucket = (int(arr.shape[1]), int(arr.shape[2]))
                    shw = np.zeros((3, b), np.int32)
                    shw[1] = bucket[0]
                    shw[2] = bucket[1]
                    if self.mesh is not None:  # match dispatch_from_cache
                        from jax.sharding import NamedSharding, PartitionSpec as P
                        from ..parallel.mesh import DATA_AXIS
                        shw_d = jax.device_put(
                            shw, NamedSharding(self.mesh, P(None, DATA_AXIS)))
                    else:
                        shw_d = jnp.asarray(shw)
                    out = None
                    for sz in warm_sizes:  # cache is NOT donated
                        out = self.get_step_cached(b, bucket, size=sz)(
                            self._params, arr, shw_d,
                            self._class_weights, self._conf, self._iou)
                    return out

                jax.block_until_ready(locked(launch))
        dt = time.perf_counter() - t0
        self.warmed = True
        # The cold-compile guard (update_adaptive_slo) certifies rungs as
        # warm ONLY when this call covered the FULL (batch, bucket) grid —
        # a partial warmup (custom boot path, tests passing batches=[1])
        # must not let a runtime SLO enable walk the policy onto programs
        # that were never compiled (the first over-SLO downshift would be
        # a cold XLA compile under pressure, the exact failure the guard
        # exists to prevent).
        full_grid = (
            set(batches or self.batch_buckets) >= set(self.batch_buckets)
            and {tuple(bk) for bk in (buckets or self.frame_buckets)}
            >= set(self.frame_buckets))
        if full_grid:
            self._warmed_sizes = tuple(warm_sizes)
        log.info("engine warmup done in %.1fs%s", dt,
                 "" if full_grid else " (partial grid: rungs not certified "
                                     "for runtime SLO enable)")
        return dt

    def update_adaptive_slo(self, slo_ms: float) -> bool:
        """Runtime SLO change (SET_CONFIG/CONFIG_UPDATE lane). Enabling
        requires a ladder whose rungs were warmed at boot — a runtime
        enable must never turn the first over-SLO downshift into a cold
        XLA compile. Disabling (0) returns serving to the boot size.

        Validation happens here (caller's thread, no state touched);
        the change itself is STAGED and applied on the dispatch lane
        (_apply_staged_slo) — policy state is dispatch-lane-only, and a
        disable racing _maybe_adapt could otherwise strand the engine
        downshifted with the policy off."""
        slo_ms = float(slo_ms)
        if slo_ms > 0:
            if len(self.serve_sizes) < 2:
                log.warning("adaptive_slo_ms ignored: no tpu.serve_sizes "
                            "ladder configured")
                return False
            # Cold-compile guard is a DEVICE concern. The synthetic harness
            # (synthetic_step_ms > 0 — exists precisely to exercise this
            # policy over per-size ladders) never acquires a device lane, so
            # it has nothing to warm. Plain model-less simulation KEEPS the
            # guard: a later hot-swap to real compute would leave every rung
            # cold with the policy already armed.
            if (self.synthetic_step_ms <= 0
                    and not set(self.serve_sizes) <= set(self._warmed_sizes)):
                log.warning("adaptive_slo_ms ignored: serve-size rungs were "
                            "not warmed (boot with adaptive_slo_ms > 0)")
                return False
        with self._slo_lock:
            self._staged_slo = slo_ms
        return True

    def _apply_staged_slo(self) -> None:
        """Dispatch lane only (called from _current_params and
        _maybe_adapt): apply a runtime SLO change atomically with the
        policy state it governs."""
        with self._slo_lock:
            staged = self._staged_slo
            if staged is None:
                return
            self._staged_slo = None
        self.adaptive_slo_ms = staged
        self._adapt_hot = 0
        self._adapt_cool = 0
        # A new SLO is a new contract: failed-probe history under the old
        # SLO must not gate upshifts under the new one.
        self._last_upshift_t = -1e9
        self._upshift_fail_streak = 0
        self._upshift_block_until = 0.0
        # Fresh window: _adapt_stats gathers samples even while the policy
        # is off, and judging a runtime enable on pre-enable samples (e.g. a
        # spike that already ended) would trigger a spurious downshift.
        self._adapt_stats = RollingStats(window=256)
        if staged <= 0:
            # Back to the configured serving size (= serve_sizes[0]: larger
            # rungs are dropped at construction).
            self._serve_size = self.model_size
        log.info("adaptive SLO now %.1f ms (serve size %d)",
                 self.adaptive_slo_ms, self._serve_size)

    def effective_serve_size(self, min_size: int = 0) -> int:
        """Per-request serve rung: the policy's current fleet-wide rung,
        floored by the client's accuracy SLA (detection.min_serve_size /
        runtime 'min_serve_size'). The floor snaps UP the serve_sizes
        ladder so dispatch always lands on a warmed rung — never a cold
        compile under SLO pressure. (Reference analog: per-client
        CompressionSettings quality negotiation, types.h:58-66 — the
        operator-grade accuracy knob the adaptive ladder needs because the
        320 rung measurably costs OOD accuracy; BENCH_NOTES OOD table.)"""
        size = self._serve_size
        if min_size and min_size > size:
            # Ladder is sorted descending; pick the SMALLEST rung >= floor.
            size = min((s for s in self.serve_sizes if s >= min_size),
                       default=self.model_size)
        return size

    # --------------------------------------------------------------- infer
    def _simulating(self) -> bool:
        """True when this dispatch should serve simulated detections.

        Checked on the dispatch thread, so a hot-swap staged while in
        simulation mode (server started modelless, model deployed later —
        reference onnx_engine.cpp:473-515 supports this) gets applied HERE:
        the simulation early-returns must not starve _current_params of its
        only call site. First real batches after the flip pay their XLA
        compiles (logged)."""
        if (self.simulation and self._staged_params is not None
                and self.synthetic_step_ms <= 0):
            self._current_params()
            if not self.simulation:
                log.warning("hot-swap out of simulation mode: first batches "
                            "will compile per (batch, bucket) shape")
        return self.simulation

    def infer_batch(self, requests: List[InferenceRequest]) -> List[EngineResult]:
        """Convenience synchronous path. Requests are grouped by frame
        bucket first (dispatch() requires one covering bucket per call —
        mixed portrait/landscape with non-nested buckets has none)."""
        # Group by POSITION, not object identity — the same request object
        # may legally appear more than once in the list. The group key also
        # carries the request's effective serve rung (accuracy floors) so a
        # floored request is never served below its floor on ANY path.
        groups: Dict[Tuple[Optional[Tuple[int, int]], int], List[int]] = {}
        for i, r in enumerate(requests):
            groups.setdefault(
                (_pick_bucket(self.frame_buckets, r.height, r.width),
                 self.effective_serve_size(r.min_size)),
                []).append(i)
        out: List[Optional[EngineResult]] = [None] * len(requests)
        cap = max(self.batch_buckets)
        for (_bucket, size), idxs in groups.items():
            # Chunk at the largest batch bucket: dispatch() serves at most
            # one bucket's worth of rows per call.
            for j in range(0, len(idxs), cap):
                part = idxs[j:j + cap]
                rs = [requests[i] for i in part]
                res = self.complete(self.dispatch(rs, size=size))
                if len(res) == len(part):  # oversized group: res == [] (shed)
                    for i, e in zip(part, res):
                        out[i] = e
        return [e for e in out if e is not None]

    def infer_batch_cached(self, requests: List[InferenceRequest],
                           frames: jnp.ndarray, heights: np.ndarray,
                           widths: np.ndarray) -> List[EngineResult]:
        return self.complete(
            self.dispatch_cached(requests, frames, heights, widths))

    def dispatch(self, requests: List[InferenceRequest],
                 size: Optional[int] = None) -> "PendingBatch":
        """Stage + launch one device step; returns immediately with device
        handles. Pair with complete() — the split lets the scheduler keep the
        next batch's H2D/compute in flight while this one's results convert.
        `size` overrides the serve rung (per-client accuracy floors — the
        scheduler groups by effective_serve_size and passes each group's)."""
        if not requests:
            return PendingBatch(requests=[], out=None, t0=0.0, n=0)
        if self._simulating():
            return self._sim_pending(requests, size=size)
        t0 = time.perf_counter()
        # Shed frames larger than every configured bucket (reject, never
        # compile on request-controlled shapes).
        oversized = [r for r in requests
                     if _pick_bucket(self.frame_buckets, r.height, r.width)
                     is None]
        if oversized:
            self.frames_dropped.inc(len(oversized))
            # Also counted separately: oversized sheds are client
            # misconfig, invariant under load — the rate controller's
            # drop-fraction signal must exclude them or one bad client
            # throttles every well-behaved one to the floor forever.
            self.frames_oversized.inc(len(oversized))
            log.warning("shed %d oversized frame(s) (max bucket %s)",
                        len(oversized), max(self.frame_buckets))
            bad = {id(r) for r in oversized}
            requests = [r for r in requests if id(r) not in bad]
            if not requests:
                return PendingBatch(requests=[], out=None, t0=0.0, n=0)
        bucket = _pick_bucket(
            self.frame_buckets,
            max(r.height for r in requests), max(r.width for r in requests))
        if bucket is None:
            # Mixed orientations under non-nested buckets: no single bucket
            # covers the batch. Callers (scheduler, infer_batch) group by
            # bucket before dispatching; defend here by keeping the largest
            # same-bucket subset rather than crashing the whole batch.
            total = len(requests)
            bucket, requests = max(
                group_by_bucket(self.frame_buckets, requests).items(),
                key=lambda kv: len(kv[1]))
            dropped = total - len(requests)
            self.frames_dropped.inc(dropped)
            log.warning("mixed-bucket dispatch: kept %d, dropped %d "
                        "(group requests by bucket)", len(requests), dropped)
        n = len(requests)
        batch = _pick_batch(self.batch_buckets, n)
        if n > batch:
            # More requests than the largest bucket holds: callers chunk
            # (infer_batch) or clamp (scheduler); defend by shedding the
            # overflow instead of overrunning the staging rows.
            self.frames_dropped.inc(n - batch)
            log.warning("dispatch overflow: %d requests > max bucket %d; "
                        "shed %d (chunk at the caller)", n, batch, n - batch)
            requests = requests[:batch]
            n = batch
        key = (batch, bucket[0], bucket[1])

        # Staging buffers come from a per-shape free-list sized by the true
        # in-flight depth: jnp.asarray may alias host memory on some
        # backends, and with tpu.max_inflight batches pipelined a fixed
        # double-buffer would be overwritten while an older dispatch still
        # reads it. A buffer returns to the free-list only after its batch's
        # results are read back (_convert), which proves the H2D completed.
        free = self._staging.setdefault(key, [])
        staging = (free.pop() if free
                   else np.zeros((batch, bucket[0], bucket[1], 3), np.uint8))
        # (Stale pixels from a previous use are fine: the step only reads
        # each frame's true (h, w) extent — runtime scalars below.)
        heights = np.ones((batch,), np.int32)
        widths = np.ones((batch,), np.int32)
        for i, r in enumerate(requests):
            staging[i, :r.height, :r.width] = r.data
            heights[i] = r.height
            widths[i] = r.width
        if self.mesh is not None:
            frames_d = jax.device_put(staging, self.batch_sharding(4))
            hs_d = jax.device_put(heights, self.batch_sharding(1))
            ws_d = jax.device_put(widths, self.batch_sharding(1))
        else:
            frames_d = jnp.asarray(staging)
            hs_d = jnp.asarray(heights)
            ws_d = jnp.asarray(widths)
        pending = self._dispatch_device(frames_d, hs_d, ws_d,
                                        requests, batch, bucket, t0,
                                        size=size)
        pending.staging_key = key
        pending.staging_buf = staging
        return pending

    def dispatch_cached(self, requests: List[InferenceRequest],
                        frames: jnp.ndarray, heights: np.ndarray,
                        widths: np.ndarray) -> "PendingBatch":
        """Launch over device-resident frames (DeviceFrameCache gather) —
        no host staging, no H2D pixel copy."""
        if self._simulating():
            return self._sim_pending(requests)
        t0 = time.perf_counter()
        batch = int(frames.shape[0])
        bucket = (int(frames.shape[1]), int(frames.shape[2]))
        # Shape discipline (CLAUDE.md invariant): programs are keyed by
        # (batch bucket, frame bucket). dispatch() pads/buckets for its
        # callers; this device-resident path trusts the caller's gather, so
        # a request-driven shape here would silently mint one XLA program
        # per distinct N — fail loudly instead.
        if batch not in self.batch_buckets or bucket not in self.frame_buckets:
            raise ValueError(
                f"dispatch_cached shape (batch={batch}, bucket={bucket}) is "
                f"not a configured (batch bucket, frame bucket) pair "
                f"{self.batch_buckets} x {self.frame_buckets} — gather to a "
                f"bucket first (per-request shapes compile-storm)")
        return self._dispatch_device(frames, jnp.asarray(heights),
                                     jnp.asarray(widths), requests, batch,
                                     bucket, t0)

    def dispatch_from_cache(self, requests: List[InferenceRequest],
                            cache: jnp.ndarray, slots: np.ndarray,
                            heights: np.ndarray, widths: np.ndarray,
                            size: Optional[int] = None) -> "PendingBatch":
        """Single-dispatch path: gather + serve fused into one program.
        `size` overrides the serve rung (per-client accuracy floors)."""
        if self._simulating():
            return self._sim_pending(requests, size=size)
        t0 = time.perf_counter()
        batch = len(slots)
        bucket = (cache.shape[1], cache.shape[2])
        # Shape discipline (CLAUDE.md invariant), same stance as
        # dispatch_cached: `batch` is caller-controlled — an unpadded slot
        # list would silently mint one fused XLA program per distinct
        # request count (tens of seconds each through a relayed TPU). The
        # bucket needs no gate here: the cache's spatial shape is fixed at
        # construction, so it cannot vary per request (and with non-nested
        # frame buckets the cache is their elementwise max, which is
        # legitimately not itself a configured bucket).
        if batch not in self.batch_buckets:
            raise ValueError(
                f"dispatch_from_cache batch={batch} is not a configured "
                f"batch bucket {self.batch_buckets} — pad the slot list "
                "to a bucket first (per-request counts compile-storm)")
        params = self._current_params()
        step = self.get_step_cached(batch, bucket, size)
        # One packed (3, B) upload: slots, heights, widths.
        shw = np.stack([np.asarray(slots, np.int32),
                        np.asarray(heights, np.int32),
                        np.asarray(widths, np.int32)])
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.mesh import DATA_AXIS
            shw_d = jax.device_put(shw, NamedSharding(self.mesh,
                                                      P(None, DATA_AXIS)))
        else:
            shw_d = jnp.asarray(shw)
        out = step(params, cache, shw_d,
                   self._class_weights, self._conf, self._iou)
        self._maybe_start_host_copy(out)
        return PendingBatch(requests=requests, out=out, t0=t0, n=len(requests),
                            serve_size=int(size or self._serve_size))

    def _dispatch_device(self, frames, heights, widths,
                         requests: List[InferenceRequest], batch: int,
                         bucket: Tuple[int, int], t0: float,
                         size: Optional[int] = None) -> "PendingBatch":
        params = self._current_params()
        step = self.get_step(batch, bucket, size)
        # donate_argnums invalidates the device copy, not the numpy staging.
        out = step(params, frames, heights, widths,
                   self._class_weights, self._conf, self._iou)
        self._maybe_start_host_copy(out)
        return PendingBatch(requests=requests, out=out, t0=t0, n=len(requests),
                            serve_size=int(size or self._serve_size))

    def _maybe_start_host_copy(self, out) -> None:
        """Overlap the packed output's D2H with the next batch's compute —
        but only at pipeline depth <= 2, where complete() will consume those
        bytes. At deeper inflight the scheduler drains through the concat
        path (complete_many), which re-reads everything in ONE readback: a
        per-batch copy there ships the same bytes over the link twice."""
        if self.max_inflight <= 2:
            _start_host_copy(out)

    def _sim_pending(self, requests: List[InferenceRequest],
                     size: Optional[int] = None) -> "PendingBatch":
        """Simulated dispatch. In synthetic-step mode the batch also gets a
        ready_at stamp modelling a serialized device lane (back-to-back
        dispatches queue, one fake step each)."""
        t0 = time.perf_counter()
        pb = PendingBatch(requests=requests, out=None, t0=t0, n=len(requests),
                          simulated=[self._simulate(r) for r in requests],
                          serve_size=int(size or self._serve_size))
        for er in pb.simulated:
            er.batch_n = len(requests)
            er.serve_size = pb.serve_size
        if self.synthetic_step_ms > 0:
            pb.step_ms = self._synthetic_step(len(requests), pb.serve_size)
            start = max(t0, self._synthetic_last_ready)
            self._synthetic_last_ready = start + pb.step_ms / 1e3
            pb.ready_at = self._synthetic_last_ready
            for er in pb.simulated:
                er.infer_ms = pb.step_ms  # trace shows the replayed step
        return pb

    def _synthetic_step(self, n: int, size: Optional[int] = None) -> float:
        """Fake-step duration (ms) for an n-request batch: the measured
        ladder entry for the padded batch bucket when a profile is
        configured (next bucket up if the exact one is unlisted), else the
        flat synthetic_step_ms. `size` selects the per-rung ladder (floored
        groups replay their own rung's measured step)."""
        profile = (self.synthetic_profiles.get(int(size or self._serve_size))
                   or self.synthetic_profile)
        if not profile:
            return self.synthetic_step_ms
        bucket = _pick_batch(self.batch_buckets, n)
        for b in sorted(profile):
            if bucket <= b:
                return profile[b]
        return profile[max(profile)]

    def complete(self, pending: "PendingBatch") -> List[EngineResult]:
        """Block on the device step, convert fixed-shape outputs to results."""
        if not pending.requests:
            return []
        if pending.simulated is not None:
            if pending.ready_at is not None:
                # Synthetic step: block like a real device readback would,
                # and feed the same pipeline stats the real path records.
                delay = pending.ready_at - time.perf_counter()
                if delay > 0:
                    time.sleep(delay)
                now = time.perf_counter()
                self.latency.record((now - pending.t0) * 1e3)
                self.batch_sizes.record(pending.n)
                for r, er in zip(pending.requests, pending.simulated):
                    e2e = (now - r.enqueue_t) * 1e3
                    self.e2e_latency.record(e2e)
                    if pending.serve_size == self._serve_size:
                        # Same strict-equality rule as _convert (floored
                        # groups AND stale-rung in-flight batches stay out
                        # of the policy window) so the host-path harness
                        # exercises the policy the server ships.
                        self._adapt_stats.record(e2e)
                    # Everything that is NOT the (fake) device step: decode
                    # wait + batch window + lane queueing + completion — the
                    # host-path overhead the synthetic harness measures.
                    self.synthetic_host.record(max(e2e - pending.step_ms,
                                                   0.0))
                    # Stamp the result too, or /debugz traces from the
                    # synthetic harness would misattribute this whole wait
                    # to send_ms (the post-completion hop).
                    er.queue_ms = max(e2e - pending.step_ms, 0.0)
                self._maybe_adapt()
            return pending.simulated
        return self._convert(pending, np.asarray(pending.out))  # one D2H

    def complete_many(self, pendings: List["PendingBatch"]
                      ) -> List[List[EngineResult]]:
        """Complete several in-flight batches with ONE host readback.

        Through a relayed TPU every D2H readback pays the link RTT
        (~30 ms - 1 s); completing K queued batches as a device-side concat
        + single np.asarray amortizes that to one RTT. Locally it is one
        small transfer instead of K."""
        real = [p for p in pendings
                if p.requests and p.simulated is None and p.out is not None]
        host: Dict[int, np.ndarray] = {}
        if len(real) > 1:
            # Shape discipline: pad every batch's packed output to the max
            # batch bucket first, so the concat program is keyed ONLY by the
            # drain count k (<= max_inflight programs), never by the ordered
            # sequence of in-flight batch sizes — that sequence is
            # request-driven and would mint unbounded programs. The pad
            # programs themselves are keyed by (rows, max_rows): at most
            # |batch_buckets|^2 tiny programs. Padding adds D2H bytes (~1 KB
            # per padded row) — noise against the per-readback link RTT this
            # method exists to amortize.
            max_rows = max(max(self.batch_buckets),
                           max(int(p.out.shape[0]) for p in real))
            outs = [self._pad_rows(p.out, max_rows) for p in real]
            packed = jnp.concatenate(outs, axis=0)
            flat = np.asarray(packed)  # the single D2H
            for i, p in enumerate(real):
                n = int(p.out.shape[0])
                host[id(p)] = flat[i * max_rows:i * max_rows + n]
        results = []
        for p in pendings:
            if id(p) in host:
                results.append(self._convert(p, host[id(p)]))
            else:
                results.append(self.complete(p))
        return results

    def recycle_staging(self, pendings: List["PendingBatch"]) -> None:
        """Return staging buffers of batches whose completion FAILED to the
        per-shape free-list (normal recycling happens in _convert; a batch
        dropped by an exception path would otherwise leak one full-size host
        buffer per failure — unbounded growth under a wedged relay).

        The failed batch's H2D may still be streaming from the buffer; a
        later dispatch overwriting it can only garble the *failed* batch's
        pixels, whose results are already abandoned. Batcher thread only
        (same discipline as _convert)."""
        for p in pendings:
            if p.staging_buf is not None:
                self._staging.setdefault(p.staging_key, []).append(
                    p.staging_buf)
                p.staging_buf = None

    def _pad_rows(self, out, rows: int):
        """Zero-pad a packed output's leading axis to `rows` on device."""
        b = int(out.shape[0])
        if b == rows:
            return out
        fn = self._pad_cache.get((b, rows))
        if fn is None:
            pad = [(0, rows - b)] + [(0, 0)] * (out.ndim - 1)
            fn = jax.jit(lambda o: jnp.pad(o, pad))
            self._pad_cache[(b, rows)] = fn
        return fn(out)

    def _convert(self, pending: "PendingBatch",
                 host_out: np.ndarray) -> List[EngineResult]:
        if pending.staging_buf is not None:
            # Results are on host => the step ran => the H2D copy of this
            # buffer completed; safe to recycle. (Single dispatch lane: the
            # free-list is only touched from the batcher thread.)
            self._staging.setdefault(pending.staging_key, []).append(
                pending.staging_buf)
            pending.staging_buf = None
        out = nms_ops.unpack_outputs(host_out)
        boxes = out["boxes"]
        scores = out["scores"]
        classes = out["classes"]
        counts = out["count"]
        # Dispatch -> results-on-host. With a deep inflight window this
        # includes the time the batch sat un-drained behind the pipeline, so
        # it is reported as *pipeline* latency, NOT device step time (the
        # true step time is only measurable with the RTT-cancelling pipeline
        # method — bench.py; a relayed readback can't time the device).
        infer_ms = (time.perf_counter() - pending.t0) * 1e3
        self.latency.record(infer_ms)
        self.batch_sizes.record(pending.n)
        self.inference_count.inc(pending.n)

        results = []
        now = time.perf_counter()
        for i, r in enumerate(pending.requests):
            dets = [
                Detection(
                    x=float(boxes[i, j, 0]), y=float(boxes[i, j, 1]),
                    width=float(boxes[i, j, 2]), height=float(boxes[i, j, 3]),
                    confidence=float(scores[i, j]),
                    class_id=int(classes[i, j]), track_id=0,
                    timestamp=r.timestamp)
                for j in range(int(counts[i]))
            ]
            e2e_ms = (now - r.enqueue_t) * 1e3
            q_ms = max(e2e_ms - infer_ms, 0.0)
            self.e2e_latency.record(e2e_ms)
            if pending.serve_size == self._serve_size:
                # Only CURRENT-fleet-rung samples steer the adaptive
                # policy. Floored groups serve ABOVE the fleet rung by
                # operator contract — their (higher) latency is nothing a
                # further downshift can fix, and feeding it in would
                # ratchet every unfloored client to the bottom rung and
                # block upshifts forever. Strict equality (not <=) also
                # keeps in-flight batches dispatched at a PREVIOUS rung
                # out of the freshly-reset post-switch window — decisions
                # are judged on post-switch samples only (see
                # _switch_size), and a pipeline of old-rung completions
                # would otherwise pre-judge an upshift probe.
                self._adapt_stats.record(e2e_ms)
            results.append(EngineResult(
                client_id=r.client_id, frame_id=r.frame_id,
                timestamp=r.timestamp, detections=dets,
                infer_ms=infer_ms, queue_ms=q_ms,
                recv_t=r.enqueue_t,
                decode_ms=max((r.decoded_t - r.enqueue_t) * 1e3, 0.0),
                batch_n=pending.n, serve_size=pending.serve_size))
        self._maybe_adapt()
        return results

    # ------------------------------------------------- adaptive resolution
    def _maybe_adapt(self) -> None:
        """Serve-size policy, dispatch lane only (called from completion):
        sustained submit->result p99 over the SLO steps DOWN the
        serve_sizes ladder (pixels fall quadratically with the letterbox
        target); a sustained wide margin steps back UP. Hysteresis is
        asymmetric — shedding latency is urgent, recovering accuracy is
        not — and the stats window resets on every switch so decisions are
        judged on post-switch samples only."""
        self._apply_staged_slo()
        if self.adaptive_slo_ms <= 0 or len(self.serve_sizes) < 2:
            return
        if self.simulation and not self.synthetic_profiles:
            # Plain simulation has no size-dependent step to adapt; the
            # per-size synthetic ladders exist precisely to exercise this
            # policy in the host-path harness.
            return
        now = time.perf_counter()
        if now < self._adapt_next_check:
            return
        snap = self._adapt_stats.snapshot()
        if snap["count"] < 32:  # not enough fresh samples to judge
            return
        self._adapt_next_check = now + 0.5
        i = self.serve_sizes.index(self._serve_size)
        if (self._last_upshift_t > 0
                and now - self._last_upshift_t >= self._UPSHIFT_PROBE_S):
            # The probed rung survived the window: the probe SUCCEEDED —
            # clear the failure history so the next genuine load drop is
            # judged fresh.
            self._upshift_fail_streak = 0
            self._last_upshift_t = -1e9
        if snap["p99_ms"] > self.adaptive_slo_ms:
            self._adapt_cool = 0
            self._adapt_hot += 1
            if self._adapt_hot >= 2 and i + 1 < len(self.serve_sizes):
                if now - self._last_upshift_t < self._UPSHIFT_PROBE_S:
                    # The rung we just probed back up to failed: hold the
                    # next probe off exponentially (30s, 60s, ... capped).
                    # Consume the probe marker — on a 3+-rung ladder the
                    # CASCADE downshifts that follow are load-driven
                    # descent, not additional probe failures, and must not
                    # multiply the holddown.
                    self._upshift_fail_streak += 1
                    self._upshift_block_until = now + min(
                        30.0 * (2 ** (self._upshift_fail_streak - 1)), 600.0)
                    self._last_upshift_t = -1e9
                self._switch_size(self.serve_sizes[i + 1], snap["p99_ms"])
                self.size_downshifts += 1
        elif snap["p99_ms"] < 0.6 * self.adaptive_slo_ms:
            self._adapt_hot = 0
            self._adapt_cool += 1
            if (self._adapt_cool >= 8 and i > 0
                    and now >= self._upshift_block_until):
                self._last_upshift_t = now
                self._switch_size(self.serve_sizes[i - 1], snap["p99_ms"])
                self.size_upshifts += 1
        else:
            self._adapt_hot = 0
            self._adapt_cool = 0

    def _switch_size(self, size: int, p99_ms: float) -> None:
        log.info("adaptive resolution: %d -> %d (p99 %.1f ms, SLO %.1f ms)",
                 self._serve_size, size, p99_ms, self.adaptive_slo_ms)
        self._serve_size = size
        self._adapt_stats = RollingStats(window=256)
        self._adapt_hot = 0
        self._adapt_cool = 0

    def _simulate(self, r: InferenceRequest) -> EngineResult:
        """Random plausible detections (reference onnx_engine.cpp:1133-1177)."""
        rng = self._rng
        dets = []
        for _ in range(rng.randint(0, 3)):
            w, h = rng.uniform(0.05, 0.2), rng.uniform(0.1, 0.3)
            dets.append(Detection(
                x=rng.uniform(0.2, 0.8), y=rng.uniform(0.2, 0.8),
                width=w, height=h, confidence=rng.uniform(0.5, 0.95),
                class_id=rng.randint(0, max(self.spec.num_classes - 1, 0)),
                track_id=0, timestamp=r.timestamp))
        self.inference_count.inc()
        return EngineResult(client_id=r.client_id, frame_id=r.frame_id,
                            timestamp=r.timestamp, detections=dets,
                            recv_t=r.enqueue_t,
                            decode_ms=max((r.decoded_t - r.enqueue_t) * 1e3,
                                          0.0),
                            batch_n=1)

    # -------------------------------------------------------- live config
    def update_thresholds(self, confidence: Optional[float] = None,
                          nms: Optional[float] = None) -> None:
        """Runtime threshold update — thresholds are traced scalars, so this
        changes behavior on the next batch with zero recompiles. Safe from
        ANY thread: only host floats are written here; the device scalars
        are refreshed on the dispatch thread (creating device arrays from
        the event-loop thread would break the single-device-lane rule)."""
        if confidence is not None:
            self.config.confidence_threshold = float(confidence)
        if nms is not None:
            self.config.nms_threshold = float(nms)
        if confidence is not None or nms is not None:
            self._thresholds_dirty = True

    def _refresh_thresholds(self) -> None:
        """Dispatch-thread-only: commit any pending threshold change."""
        if self._thresholds_dirty:
            self._thresholds_dirty = False
            self._conf = jnp.float32(self.config.confidence_threshold)
            self._iou = jnp.float32(self.config.nms_threshold)

    # ------------------------------------------------------------ hot swap
    def maybe_reload(self) -> bool:
        """Re-hash the model file; on change, STAGE new params host-side
        (same shapes => no recompile). The device swap happens on the
        dispatch thread at the next batch — the watcher thread must not
        touch the device (single-device-lane discipline; concurrent
        dispatch wedges relayed transports). Reference onnx_engine.cpp:473-515."""
        path = self.config.model_path
        try:
            st = os.stat(path)
        except OSError:
            return False
        sig = (st.st_mtime_ns, st.st_size)
        if sig == self._file_sig:
            return False  # unchanged since last check: skip the full hash
        try:
            new_hash = file_sha256(path)
        except OSError:
            return False
        self._file_sig = sig
        if new_hash == self._model_hash or new_hash == self._failed_hash:
            return False
        params, spec, sim = load_model(path, self.config.tpu.variant,
                                       self.config.tpu.num_classes)
        if sim:
            # Remember the bad file's hash: without it the 10 s watcher
            # re-hashes AND fully re-parses the unloadable file every tick
            # for the process lifetime.
            self._failed_hash = new_hash
            return False
        if not self.simulation and (
                spec.num_classes != self.spec.num_classes
                or spec.backbone_channels != self.spec.backbone_channels
                or spec.depth != self.spec.depth
                or spec.reg_max != self.spec.reg_max):
            # load_model inferred a different architecture from the file:
            # staged params would not fit the live jitted programs (the step
            # cache is traced for self.spec). Geometry changes need a boot,
            # not a hot swap.
            log.error("hot-swap rejected: %s is %s/nc=%d but the engine "
                      "serves %s/nc=%d — restart to change architecture",
                      path, spec.variant, spec.num_classes,
                      self.spec.variant, self.spec.num_classes)
            self._failed_hash = new_hash
            return False
        staged_spec = None
        if self.simulation and spec != self.spec:
            # Simulation built no device programs, so the file's own
            # geometry can be adopted — applied on the dispatch thread
            # together with the params (the only lane that reads spec-
            # dependent state).
            staged_spec = spec
            log.info("hot-swap out of simulation adopts file geometry "
                     "%s/nc=%d", spec.variant, spec.num_classes)
        with self._params_lock:
            self._staged_params = params
            self._staged_spec = staged_spec
            self._model_hash = new_hash
        log.info("hot-reload staged: %s (sha256=%s)", path, new_hash[:12])
        return True

    def _current_params(self):
        """Called on the dispatch thread: applies any staged hot-swap
        (quantize + device_put happen HERE, on the device lane) and any
        pending threshold change."""
        self._refresh_thresholds()
        self._apply_staged_slo()
        with self._params_lock:
            staged = self._staged_params
            staged_spec = self._staged_spec
            self._staged_params = None
            self._staged_spec = None
        if staged is not None:
            if staged_spec is not None:
                # Simulation-to-real swap adopting the file's geometry: no
                # real programs exist yet, but spec-derived state must
                # follow before the first trace.
                self.spec = staged_spec
                nc = staged_spec.num_classes
                names = (CS16_CLASS_NAMES if nc == len(CS16_CLASS_NAMES)
                         else tuple(f"class_{i}" for i in range(nc)))
                self._class_weights = jnp.asarray(
                    self.config.detection.class_weight_vector(names),
                    jnp.float32)
                self._step_cache.clear()
            if self.config.tpu.quantize_int8:
                staged = self._quantize_and_calibrate(staged)
            self._params = self._place_params(staged)
            self.simulation = False
            log.info("hot-reload applied on dispatch thread")
        return self._params

    # -------------------------------------------------------------- status
    def status(self) -> Dict[str, str]:
        lat = self.latency.snapshot()
        e2e = self.e2e_latency.snapshot()
        host = (self.synthetic_host.snapshot()
                if self.synthetic_step_ms > 0 else None)
        return {
            "engine": "jax-tpu",
            # The SERVED spec: may differ from config.tpu.variant when the
            # model file's introspected geometry won (load_model).
            "model": self.spec.variant,
            # WHICH artifact is live (canary fleets serve different files
            # per shard; hot-swap visibility): file basename + hash prefix.
            "model_file": os.path.basename(self.config.model_path or ""),
            "model_sha": (self._model_hash or "")[:12],
            "model_size": str(self.model_size),
            # Current serve size (= model_size unless an adaptive ladder
            # downshifted) + lifetime switch counts.
            "serve_size": str(self._serve_size),
            "size_downshifts": str(self.size_downshifts),
            "size_upshifts": str(self.size_upshifts),
            "classes": str(self.spec.num_classes),
            "simulation": str(self.simulation).lower(),
            "inferences": str(self.inference_count.value),
            "dropped": str(self.frames_dropped.value),
            "errors": str(self.error_count.value),
            # dispatch -> host readback complete (includes inflight-window
            # wait under pipelining; see _convert).
            "pipeline_avg_ms": f"{lat['avg_ms']:.2f}",
            "pipeline_p99_ms": f"{lat['p99_ms']:.2f}",
            "e2e_avg_ms": f"{e2e['avg_ms']:.2f}",
            "e2e_p99_ms": f"{e2e['p99_ms']:.2f}",
            "avg_batch": f"{self.batch_sizes.snapshot()['avg_ms']:.1f}",
            "compiled_programs": str(len(self._step_cache)),
            "warmed": str(self.warmed).lower(),
            **({"synthetic_step_ms": f"{self.synthetic_step_ms:.2f}",
                "synthetic_host_avg_ms": f"{host['avg_ms']:.2f}",
                "synthetic_host_p99_ms": f"{host['p99_ms']:.2f}"}
               if host is not None else {}),
        }


class SimulationEngine(InferenceEngine):
    """Engine that always serves random detections, regardless of whether a
    model file exists — the reference's simulation mode promoted to a
    selectable engine (onnx_engine.cpp:1133-1177 + the registry the
    reference declared in inference_engine.h:45-103). Never touches the
    accelerator; useful for protocol/load testing on model-less hosts."""

    def __init__(self, config: ServerConfig,
                 params: Optional[Dict[str, Any]] = None,
                 preprocess_mode: Optional[str] = None) -> None:
        import dataclasses
        cfg = dataclasses.replace(config)
        # mesh=1x1: params={} keeps self.simulation False through
        # super().__init__, so a mesh config would reach jax.devices() —
        # backend init this engine's contract forbids (on a relayed TPU
        # that can wedge a model-less protocol-test boot for minutes).
        cfg.tpu = dataclasses.replace(cfg.tpu, quantize_int8=False,
                                      mesh_data=1, mesh_model=1)
        super().__init__(cfg, params={}, preprocess_mode=preprocess_mode)
        self.simulation = True
        self.warmed = True

    def maybe_reload(self) -> bool:  # a model appearing must not flip modes
        return False


# Engine registry (reference inference_engine.h:45-103
# InferenceEngineManager + REGISTER_INFERENCE_ENGINE). "onnx" — the
# reference's default config value (configs/server.json:3) — aliases the
# JAX engine so existing config files select the real detection core.
ENGINE_REGISTRY: Dict[str, type] = {
    "jax": InferenceEngine,
    "onnx": InferenceEngine,
    "simulation": SimulationEngine,
}


def register_engine(name: str):
    """Class decorator registering a custom engine under `name`."""
    def deco(cls):
        ENGINE_REGISTRY[name] = cls
        return cls
    return deco


def create_engine(config: ServerConfig, **kwargs) -> InferenceEngine:
    """Factory honoring config.inference_engine; unknown names fall back to
    the default engine with a warning (reference server/main.cpp:226-240)."""
    name = (config.inference_engine or "jax").strip().lower()
    cls = ENGINE_REGISTRY.get(name)
    if cls is None:
        log.warning("unknown inference_engine %r; using the default JAX "
                    "engine", name)
        cls = InferenceEngine
    return cls(config, **kwargs)
