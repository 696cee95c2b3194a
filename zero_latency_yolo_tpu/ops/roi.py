"""Device-resident per-client frame cache with ROI/diff updates.

BASELINE config 3: "ROI + difference-frame decoding moved on-device". The
reference protocol sends full JPEG keyframes and ROIIMG-headed JPEG region
updates (src/client/screen_capture.cpp:356-538); the reference server never
implemented the decode path (SURVEY §2.9 item 8).

Here the authoritative copy of every client's latest frame lives in HBM as a
fixed-slot uint8 cache (slots, H, W, 3):

- keyframes overwrite a slot (one full-frame H2D);
- ROI updates upload only the decoded region bytes and scatter them into the
  slot with a jitted dynamic_update_slice — XLA performs it in place thanks
  to buffer donation, so a 64-stream server moves only deltas over PCIe;
- inference gathers (slot -> batch) directly on device; frame pixels never
  come back to the host.

JPEG entropy decode itself stays on host (cv2/libjpeg) — it is a bitstream
serialization, not tensor math; the *pixel traffic and paste* move on-device.
"""

from __future__ import annotations

import threading
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _bucket(n: int, lo: int = 64) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


@partial(jax.jit, donate_argnums=(0,))
def _paste(cache: jnp.ndarray, slot: jnp.ndarray, region: jnp.ndarray,
           y: jnp.ndarray, x: jnp.ndarray,
           rh: jnp.ndarray, rw: jnp.ndarray) -> jnp.ndarray:
    """Masked paste of region[:rh, :rw] into cache[slot] at (y, x), in place.

    `region` is host-padded to a power-of-two bucket so the program count
    stays bounded (shapes static, true extent (rh, rw) is a runtime scalar).
    The block is read-modify-written: clamped start + iota mask keeps writes
    inside the target rect even when the bucket overhangs the cache edge.
    """
    bh, bw = region.shape[0], region.shape[1]
    ch, cw = cache.shape[1], cache.shape[2]
    y0 = jnp.clip(y, 0, ch - bh)
    x0 = jnp.clip(x, 0, cw - bw)
    dy = y - y0  # >= 0; nonzero only near edges
    dx = x - x0
    block = jax.lax.dynamic_slice(cache, (slot, y0, x0, jnp.int32(0)),
                                  (1, bh, bw, 3))[0]
    shifted = jnp.roll(jnp.roll(region, dy, axis=0), dx, axis=1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
    mask = ((rows >= dy) & (rows < dy + rh) &
            (cols >= dx) & (cols < dx + rw))[..., None]
    new_block = jnp.where(mask, shifted, block)
    return jax.lax.dynamic_update_slice(
        cache, new_block[None], (slot, y0, x0, jnp.int32(0)))


@partial(jax.jit, donate_argnums=(0,))
def _paste_full(cache: jnp.ndarray, slot: jnp.ndarray,
                frame: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.dynamic_update_slice(
        cache, frame[None], (slot, jnp.int32(0), jnp.int32(0), jnp.int32(0)))


@jax.jit
def _gather(cache: jnp.ndarray, slots: jnp.ndarray) -> jnp.ndarray:
    return cache[slots]


class DeviceFrameCache:
    """Fixed-slot HBM frame store for up to `num_slots` client streams."""

    def __init__(self, num_slots: int, height: int, width: int) -> None:
        self.num_slots = num_slots
        self.height = height
        self.width = width
        self._cache = jnp.zeros((num_slots, height, width, 3), jnp.uint8)
        self._free = list(range(num_slots))
        self._slot_of: Dict[int, int] = {}
        self._dims: Dict[int, Tuple[int, int]] = {}
        self._lock = threading.Lock()

    # ------------------------------------------------------------ slot mgmt
    def acquire(self, client_id: int) -> Optional[int]:
        with self._lock:
            if client_id in self._slot_of:
                return self._slot_of[client_id]
            if not self._free:
                return None
            slot = self._free.pop()
            self._slot_of[client_id] = slot
            self._dims[client_id] = (0, 0)
            return slot

    def release(self, client_id: int) -> None:
        with self._lock:
            slot = self._slot_of.pop(client_id, None)
            self._dims.pop(client_id, None)
            if slot is not None:
                self._free.append(slot)

    def slot(self, client_id: int) -> Optional[int]:
        with self._lock:
            return self._slot_of.get(client_id)

    def dims(self, client_id: int) -> Tuple[int, int]:
        with self._lock:
            return self._dims.get(client_id, (0, 0))

    def has_frame(self, client_id: int) -> bool:
        return self.dims(client_id) != (0, 0)

    # -------------------------------------------------------------- updates
    def write_keyframe(self, client_id: int, frame: np.ndarray) -> bool:
        """Upload a full (h, w, 3) uint8 frame into the client's slot."""
        slot = self.acquire(client_id)
        if slot is None:
            return False
        h, w = frame.shape[:2]
        if h > self.height or w > self.width:
            return False
        padded = frame
        if (h, w) != (self.height, self.width):
            padded = np.zeros((self.height, self.width, 3), np.uint8)
            padded[:h, :w] = frame
        with self._lock:
            self._cache = _paste_full(self._cache, jnp.int32(slot),
                                      jnp.asarray(padded))
            self._dims[client_id] = (h, w)
        return True

    def write_roi(self, client_id: int, region: np.ndarray, x: int, y: int) -> bool:
        """Paste a decoded (rh, rw, 3) region at (x, y) into the cached frame."""
        slot = self.slot(client_id)
        if slot is None or not self.has_frame(client_id):
            return False  # need a keyframe first
        rh, rw = region.shape[:2]
        h, w = self.dims(client_id)
        if y + rh > h or x + rw > w:
            return False
        bh = min(_bucket(rh), self.height)
        bw = min(_bucket(rw), self.width)
        padded = region
        if (bh, bw) != (rh, rw):
            padded = np.zeros((bh, bw, 3), np.uint8)
            padded[:rh, :rw] = region
        with self._lock:
            self._cache = _paste(self._cache, jnp.int32(slot),
                                 jnp.asarray(padded), jnp.int32(y), jnp.int32(x),
                                 jnp.int32(rh), jnp.int32(rw))
        return True

    def apply_diff(self, client_id: int, diff_region: np.ndarray, x: int, y: int) -> bool:
        """Difference-frame update: the region is the new content for that
        rect (the reference client encodes changed-region *pixels*, not
        deltas — screen_capture.cpp:470-538), so it pastes like a ROI."""
        return self.write_roi(client_id, diff_region, x, y)

    # -------------------------------------------------------------- readout
    def gather(self, client_ids) -> Tuple[jnp.ndarray, np.ndarray, np.ndarray]:
        """Batch device gather: returns (frames (B,H,W,3) device, heights, widths)."""
        slots = []
        hs, ws = [], []
        for cid in client_ids:
            slot = self.slot(cid)
            if slot is None:
                raise KeyError(f"client {cid} has no cache slot")
            h, w = self.dims(cid)
            slots.append(slot)
            hs.append(h)
            ws.append(w)
        with self._lock:
            frames = _gather(self._cache, jnp.asarray(slots, jnp.int32))
        return frames, np.asarray(hs, np.int32), np.asarray(ws, np.int32)

    def dispatch_with(self, fn, client_ids):
        """Run fn(cache, slots, heights, widths) under the cache lock.

        Writes donate the previous cache buffer, so any dispatch that closes
        over the buffer must be serialized against them; fn should only
        *launch* device work (fast), not block on results.
        """
        slots, hs, ws = [], [], []
        for cid in client_ids:
            slot = self.slot(cid)
            if slot is None:
                raise KeyError(f"client {cid} has no cache slot")
            h, w = self.dims(cid)
            slots.append(slot)
            hs.append(h)
            ws.append(w)
        with self._lock:
            return fn(self._cache, np.asarray(slots, np.int32),
                      np.asarray(hs, np.int32), np.asarray(ws, np.int32))

    def device_cache(self) -> jnp.ndarray:
        with self._lock:
            return self._cache
