"""Shared device-step timing: the RTT-cancelling pipeline method.

Neither `block_until_ready` nor per-step readbacks time device work through
the axon TPU relay (each host readback costs the link RTT, ~30 ms - 1 s).
Method: dispatch N steps back-to-back (the device executes in stream
order), read back only the LAST output, and difference two pipeline lengths
so the constant RTT cancels:

    step = (T(N2) - T(N1)) / (N2 - N1)

Used by bench.py and scripts/step_ladder.py — one implementation so the two
measurement paths cannot drift.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import numpy as np


def measure_cached_step(engine, batch: int, bucket_hw: Tuple[int, int],
                        frame_h: int, frame_w: int,
                        frames: "np.ndarray | None" = None,
                        ) -> Tuple[float, float]:
    """Measure the EXACT cached-serving executable the ContinuousBatcher
    dispatches — get_step_cached over a device-resident frame cache with
    the packed shw upload — via the pipeline method below. The ONE
    definition of this harness: bench.py and every scripts/*_compare
    sweep call it, so a change to the cached-step signature cannot leave
    one sweep silently timing a different executable (CLAUDE.md:
    hand-rolled near-twins drift). Returns (step_seconds, rtt_seconds)."""
    import jax.numpy as jnp
    bh, bw = bucket_hw
    if frames is None:
        frames = np.random.default_rng(0).integers(
            0, 256, (batch, bh, bw, 3), dtype=np.uint8)
    step = engine.get_step_cached(batch, (bh, bw))
    cache = jnp.asarray(frames)
    shw = jnp.asarray(np.stack([
        np.arange(batch, dtype=np.int32),
        np.full((batch,), frame_h, np.int32),
        np.full((batch,), frame_w, np.int32)]))
    p, cw = engine._params, engine._class_weights
    conf, iou = engine._conf, engine._iou

    def run_once():
        return step(p, cache, shw, cw, conf, iou)

    return pipeline_step_seconds(run_once)


def pipeline_step_seconds(run_once: Callable[[], object],
                          n1: int = 10, n2: int = 50,
                          repeats: int = 2) -> Tuple[float, float]:
    """Returns (step_seconds, link_rtt_seconds).

    run_once() must DISPATCH one device step and return its output array
    (np.asarray of which forces the single readback). The first call here
    compiles/warms; callers needn't pre-warm.
    """
    np.asarray(run_once())  # compile + settle
    def pipeline(n: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = run_once()
        np.asarray(out)
        return time.perf_counter() - t0

    pipeline(3)  # settle
    t1 = min(pipeline(n1) for _ in range(repeats))
    t2 = min(pipeline(n2) for _ in range(repeats))
    step_s = max((t2 - t1) / (n2 - n1), 1e-6)
    rtt_s = max(t1 - n1 * step_s, 0.0)
    return step_s, rtt_s
