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


def _bucket(n: int, rungs: Tuple[int, ...], cap: int,
            cap_exclusive: bool = False) -> int:
    """Smallest ladder rung >= n that fits under the cap, else the cap —
    the ONE ladder-pick rule behind every padded write shape here (three
    hand-rolled copies of it had already drifted on cap semantics)."""
    for b in rungs:
        if n <= b and (b < cap if cap_exclusive else b <= cap):
            return b
    return cap


def _roi_bucket(n: int, full: int) -> int:
    """Coarse ROI edge buckets: 16, 32, 128, clamped at the cache extent.

    The 16px bucket matters through bandwidth-constrained host links (the
    axon relay moves ~20-36 MB/s): small ROI cadences padded to 32px
    quadruple the upload bytes and saturate the link at 64 streams."""
    return _bucket(n, (16, 32, 128), full)


def _count_bucket(n: int, cap: int) -> int:
    """Write-batch count buckets: 16, 64, or the cap — bounds per-flush
    padding waste to ~2x while keeping the compiled-program grid small.
    (cap-exclusive: a 64-slot cache's cap IS the chunk, rung 64 would
    duplicate it as a distinct program.)"""
    return _bucket(n, (16, 64), cap, cap_exclusive=True)


# Keyframe flush chunk: bounds one _paste_full_many program (and its padded
# H2D upload) to 16 whole-slot frames; a connect storm flushes in ceil(n/16)
# dispatches instead of padding to the full slot count (~3.7x the bytes of
# the real frames through a 20 MB/s relay, under the cache lock).
_KF_CHUNK = 16


def _kf_bucket(n: int, cap: int) -> int:
    """Keyframe-batch count buckets: 1, 4, 16 (= the flush chunk), or the
    slot cap when smaller. Bucket 1 keeps the steady-state single-keyframe
    write exact (a whole slot frame per pad entry is the costliest padding
    in the system); the fixed ladder keeps the program count small — an
    exact count minted one program per distinct keyframe count, a compile
    storm on cold servers."""
    return _bucket(n, (1, 4, _KF_CHUNK), cap)


def _paste_body(cache: jnp.ndarray, slot: jnp.ndarray, region: jnp.ndarray,
                y: jnp.ndarray, x: jnp.ndarray,
                rh: jnp.ndarray, rw: jnp.ndarray) -> jnp.ndarray:
    """Masked paste of region[:rh, :rw] into cache[slot] at (y, x).

    `region` is host-padded to a power-of-two bucket so the program count
    stays bounded (shapes static, true extent (rh, rw) is a runtime scalar).
    The block is read-modify-written: clamped start + iota mask keeps writes
    inside the target rect even when the bucket overhangs the cache edge.
    An empty extent (rh == rw == 0) is a no-op — used to pad write batches.
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
def _paste_many(cache: jnp.ndarray, regions: jnp.ndarray,
                meta: jnp.ndarray) -> jnp.ndarray:
    """Apply K pastes in submission order as ONE device program.

    meta is (K, 5) int32 rows [slot, y, x, rh, rw] — a single packed host
    upload (five separate scalar-array uploads each paid link latency
    through a relayed TPU).

    The live serving finding behind this (docs/BENCH_NOTES round 2): at 64
    streams x 60 FPS, per-ROI paste dispatches form a 3.8k-deep donation
    chain on the cache buffer and the device queue falls seconds behind.
    Batched, a window's writes cost one dispatch (~60/s).
    """
    def body(i, c):
        return _paste_body(c, meta[i, 0], regions[i], meta[i, 1], meta[i, 2],
                           meta[i, 3], meta[i, 4])
    return jax.lax.fori_loop(0, regions.shape[0], body, cache)


@partial(jax.jit, donate_argnums=(0,))
def _paste_full_many(cache: jnp.ndarray, frames: jnp.ndarray,
                     slots: jnp.ndarray) -> jnp.ndarray:
    """K full-slot keyframe writes in one program (duplicate pad slots
    carry identical content, so scatter order does not matter)."""
    return cache.at[slots].set(frames)


@jax.jit
def _gather(cache: jnp.ndarray, slots: jnp.ndarray) -> jnp.ndarray:
    return cache[slots]


class DeviceFrameCache:
    """Fixed-slot HBM frame store for up to `num_slots` client streams.

    With `sharding` (a NamedSharding whose leading axis is the mesh data
    axis), the cache shards slot-wise across the serving mesh — each chip
    holds its share of client frames and the fused gather+serve step runs
    SPMD over them (num_slots rounds up to a multiple of the axis size)."""

    def __init__(self, num_slots: int, height: int, width: int,
                 sharding=None) -> None:
        if sharding is not None:
            axis = sharding.spec[0]
            div = int(sharding.mesh.shape[axis]) if axis else 1
            num_slots = ((num_slots + div - 1) // div) * div
        self.num_slots = num_slots
        self.height = height
        self.width = width
        self._sharding = sharding
        cache = jnp.zeros((num_slots, height, width, 3), jnp.uint8)
        self._cache = (jax.device_put(cache, sharding)
                       if sharding is not None else cache)
        # Set when a donated write program failed mid-flush: the donation
        # may have invalidated the buffer, so the next device touch
        # re-allocates a zeroed cache (and freezes every active slot for
        # keyframe re-anchor) instead of serving from a deleted array
        # forever. Lazy, so a wedged device isn't poked from the except
        # path itself.
        self._cache_dead = False
        self._free = list(range(num_slots))
        self._slot_of: Dict[int, int] = {}
        self._dims: Dict[int, Tuple[int, int]] = {}
        self._lock = threading.Lock()
        # Deferred ROI writes: (slot, y, x, rh, rw, region) applied in
        # submission order by ONE _paste_many program at the next flush
        # (gather/dispatch/run_locked). Per-write device dispatches do not
        # scale — see _paste_many.
        self._pending: list = []
        # slot -> latest full keyframe (applied before the ROI deltas: a
        # slot's queued ROIs always postdate its queued keyframe because
        # the keyframe drops everything older for that slot).
        self._pending_kf: Dict[int, np.ndarray] = {}
        # Flush CHUNK size: bounds each compiled _paste_many program (the
        # count-bucket ladder caps at this). Kept at the round-1 value so
        # the warmed program grid is unchanged.
        self._chunk = max(2 * num_slots, 64)
        # Shed threshold: writers may queue several chunks ahead of the
        # batcher's flush cadence (through a relayed TPU a batch cycle is
        # ~75 ms) before the overflow policy kicks in.
        self._max_pending = 4 * self._chunk
        self._pending_bytes = 0
        self._max_pending_bytes = 64 * 1024 * 1024
        # Slots whose pending writes were shed under overflow: their cached
        # frame is the last *flushed* consistent state; further ROI deltas
        # are refused until the client's next keyframe re-anchors the slot
        # (applying deltas over a frame with holes would corrupt it
        # patchwork-style). See _shed_locked.
        self._needs_kf: set = set()
        # Slots frozen since the last drain_frozen() call: the server turns
        # these into COMMAND(REQUEST_KEYFRAME) sends so the client
        # re-anchors in one RTT instead of one keyframe period
        # (reference declared the command type, src/common/types.h:94-103,
        # but never sent it).
        self._newly_frozen: list = []
        self.flushes = 0
        self.writes_flushed = 0
        self.writes_shed = 0

    # ------------------------------------------------------------ slot mgmt
    def acquire(self, client_id: int) -> Optional[int]:
        with self._lock:
            return self._acquire_locked(client_id)

    def _acquire_locked(self, client_id: int) -> Optional[int]:
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
                self._drop_slot_writes_locked(slot)
                self._pending_kf.pop(slot, None)
                self._free.append(slot)

    def _drop_slot_writes_locked(self, slot: int) -> int:
        """Remove all pending ROI writes for `slot` (and its shed-freeze
        mark), keeping the byte count in sync. Returns how many were
        dropped."""
        kept = [p for p in self._pending if p[0] != slot]
        dropped = len(self._pending) - len(kept)
        self._pending = kept
        self._pending_bytes = sum(p[5].nbytes for p in kept)
        self._needs_kf.discard(slot)
        return dropped

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
        """Queue a full (h, w, 3) uint8 frame for the client's slot.

        Deferred like ROI writes: the decode worker must never touch the
        device — concurrent dispatch from multiple host threads wedges
        relayed TPU transports, and one batched write program per window is
        the efficient form anyway. A keyframe supersedes everything queued
        for its slot."""
        if frame.ndim != 3 or frame.shape[2] != 3 or frame.dtype != np.uint8:
            # Reject malformed arrays at ENQUEUE: a broadcast error inside
            # the batched flush is indistinguishable from a device failure
            # there, and the recovery path (freeze every touched slot,
            # re-zero the donated cache) costs every co-resident stream its
            # frame for one caller's host bug.
            return False
        h, w = frame.shape[:2]
        if h <= 0 or w <= 0 or h > self.height or w > self.width:
            # Zero-area frames would set dims to e.g. (480, 0) and defeat
            # the (0, 0) no-frame sentinel: has_frame() would go true for a
            # client with no pixels, serving the zero-initialized slot
            # through inference every frame.
            return False
        with self._lock:
            # Slot resolution and mutation under ONE lock hold: resolving
            # first and re-locking would let an eviction + reconnect reuse
            # the slot in between, pasting this client's pixels into another
            # client's frame (cross-client leakage).
            slot = self._acquire_locked(client_id)
            if slot is None:
                return False
            # Pre-keyframe deltas (and older keyframes) are superseded —
            # applying them after this keyframe would corrupt it; a keyframe
            # also re-anchors a shed-frozen slot.
            self._drop_slot_writes_locked(slot)
            self._pending_kf[slot] = frame
            self._dims[client_id] = (h, w)
            # No overflow flush here: _pending_kf is bounded at one frame
            # per slot, and device dispatch from the decode/writer thread
            # would break the single-device-lane discipline (the batcher
            # flushes at every gather/dispatch).
        return True

    def write_roi(self, client_id: int, region: np.ndarray, x: int, y: int) -> bool:
        """Queue a decoded (rh, rw, 3) region paste at (x, y) for the
        client's cached frame. Applied (in order) by one batched device
        program at the next flush — no per-write device dispatch."""
        if (region.ndim != 3 or region.shape[2] != 3
                or region.dtype != np.uint8):
            return False  # see write_keyframe: validate at enqueue
        rh, rw = region.shape[:2]
        if rh <= 0 or rw <= 0:
            return False
        with self._lock:
            # Slot resolved under the same lock hold as the append (see
            # write_keyframe: the check-then-relock gap let a stale paste
            # land in a slot reassigned to a different client).
            slot = self._slot_of.get(client_id)
            h, w = self._dims.get(client_id, (0, 0))
            if slot is None or (h, w) == (0, 0):
                return False  # need a keyframe first
            if y + rh > h or x + rw > w:
                return False
            if slot in self._needs_kf:
                # Frozen since a shed: the delta is discarded (pasting over a
                # frame with holes would corrupt it), but the slot still
                # serves its last consistent frame — the stream must keep
                # flowing (stale detections until the next keyframe, bounded
                # by the client's keyframe cadence).
                self.writes_shed += 1
                return True
            self._pending.append((slot, y, x, rh, rw, region))
            self._pending_bytes += region.nbytes
            # Bound host memory under a writer outpacing the batch cadence
            # (cold-compile stall, hostile flood): SHED a slot's writes
            # rather than flushing from this thread — the batcher is the
            # only thread allowed to dispatch device work (concurrent
            # dispatch wedges relayed TPU transports).
            while (len(self._pending) > self._max_pending
                   or self._pending_bytes > self._max_pending_bytes):
                self._shed_locked()
        return True

    def _shed_locked(self) -> None:
        """Overflow policy: drop ALL pending ROI writes for the slot holding
        the most queued bytes and freeze it until its next keyframe. The
        slot keeps serving its last consistent flushed frame (drop-oldest
        stream semantics applied per-slot — reference concurrent_queue.h
        push_force), and host memory stays bounded without this thread ever
        touching the device."""
        if not self._pending:
            return
        by_slot: Dict[int, int] = {}
        for p in self._pending:
            by_slot[p[0]] = by_slot.get(p[0], 0) + p[5].nbytes
        victim = max(by_slot, key=lambda s: by_slot[s])
        self.writes_shed += self._drop_slot_writes_locked(victim)
        self._needs_kf.add(victim)
        self._newly_frozen.append(victim)

    def _flush_locked(self) -> None:
        """Apply all pending writes (keyframes first, then ROI deltas in
        per-slot submission order) as batched device programs. Caller holds
        self._lock. Writes are grouped by ROI bucket class, regions padded
        to the class bucket and counts to power-of-two buckets (chunked at
        _chunk) so the compiled-program grid stays bounded.

        A device/relay exception mid-flush (a documented routine failure
        mode here) consumes the queued writes it was applying; silently
        continuing would later paste deltas over a frame with holes. The
        except path freezes every slot that had anything pending — each
        serves its last consistent flushed frame and refuses deltas until
        its client re-anchors with a keyframe (REQUEST_KEYFRAME goes out
        via drain_frozen) — then re-raises for the caller's error path."""
        self._revive_cache_locked()
        if not self._pending_kf and not self._pending:
            return
        touched = set(self._pending_kf) | {p[0] for p in self._pending}
        try:
            self._flush_writes_locked()
        except Exception:
            self._freeze_slots_locked(touched)
            self._pending = []
            self._pending_kf = {}
            self._pending_bytes = 0
            # The failed program donated the cache buffer; it may now be
            # invalid. Re-allocate lazily at the next device touch.
            self._cache_dead = True
            raise

    def _freeze_slots_locked(self, slots) -> None:
        active = set(self._slot_of.values())
        for s in set(slots) & active:
            if s not in self._needs_kf:
                self._needs_kf.add(s)
                self._newly_frozen.append(s)

    def _revive_cache_locked(self) -> None:
        """Re-allocate the cache after a failed donated flush (see
        _cache_dead). Every active slot's content is zeros now — freeze
        them all so clients re-anchor with keyframes."""
        if not self._cache_dead:
            return
        cache = jnp.zeros((self.num_slots, self.height, self.width, 3),
                          jnp.uint8)
        self._cache = (jax.device_put(cache, self._sharding)
                       if self._sharding is not None else cache)
        self._freeze_slots_locked(set(self._slot_of.values()))
        self._cache_dead = False

    def _flush_writes_locked(self) -> None:
        if self._pending_kf:
            kf = self._pending_kf
            self._pending_kf = {}
            items = sorted(kf.items())
            # Chunked (not padded to the slot cap): 17 pending keyframes
            # must upload ~17 frames in two dispatches, not num_slots
            # frames in one — whole-slot pad entries are the costliest
            # padding in the system.
            chunk = min(_KF_CHUNK, self.num_slots)
            while items:
                part, items = items[:chunk], items[chunk:]
                k = _kf_bucket(len(part), self.num_slots)
                frames = np.zeros((k, self.height, self.width, 3), np.uint8)
                slots = np.zeros((k,), np.int32)
                for i, (slot, frame) in enumerate(part):
                    h, w = frame.shape[:2]
                    frames[i, :h, :w] = frame
                    slots[i] = slot
                for i in range(len(part), k):
                    slots[i] = slots[0]  # pad: rewrite slot 0 w/ its frame
                    frames[i] = frames[0]
                self._cache = _paste_full_many(
                    self._cache, jnp.asarray(frames), jnp.asarray(slots))
                self.flushes += 1
                self.writes_flushed += len(part)
        # Group pending writes by ROI bucket class BEFORE chunking: one
        # full-frame region co-pending with 127 16px diffs used to inflate
        # the whole chunk to full extent (128x padded upload bytes — ~3s of
        # link time through a 20 MB/s relay for what is one region's worth
        # of pixels). Writes to different slots commute (each paste touches
        # only its own slot); per-slot ordering is preserved by splitting a
        # slot's writes into RUNS at class-transition boundaries and
        # flushing groups in (phase, class) order — a slot's later run
        # always lands after its earlier one, while a lone full-extent
        # region no longer inflates the slot's co-pending small diffs to
        # full extent (the previous force-into-largest-class grouping paid
        # that inflation WITHIN one slot).
        if self._pending:
            groups: Dict[Tuple[int, Tuple[int, int]], list] = {}
            slot_phase: Dict[int, int] = {}
            slot_last: Dict[int, Tuple[int, int]] = {}
            for p in self._pending:
                c = (_roi_bucket(p[3], self.height),
                     _roi_bucket(p[4], self.width))
                if slot_last.get(p[0]) != c:
                    slot_phase[p[0]] = slot_phase.get(p[0], -1) + 1
                    slot_last[p[0]] = c
                groups.setdefault((slot_phase[p[0]], c), []).append(p)
            self._pending = []
        else:
            groups = {}
        for (_phase, (bh, bw)), pending in sorted(groups.items()):
            # Full-extent regions also CHUNK at the keyframe stride, not
            # at self._chunk: chunking at the big cap with the fine count
            # ladder let 17..cap whole-frame writes bucket straight to the
            # cap — a (cap, H, W, 3) host alloc and ~7x padded upload
            # through a ~20 MB/s relay while holding the cache lock the
            # batcher needs (review r5).
            full = (bh, bw) == (self.height, self.width)
            chunk = min(_KF_CHUNK, self._chunk) if full else self._chunk
            while pending:
                pend = pending[:chunk]
                pending = pending[chunk:]
                # Coarse shape buckets: ROI programs are keyed by (k, bh, bw);
                # through a remote-compile relay every new shape costs tens of
                # seconds, so the grid is {16, 64, cap} x {16, 32, 128, full}.
                # The FULL-extent class uses the keyframe-style fine count
                # ladder instead: whole-frame regions are the costliest pad
                # entries in the system, and a lone full-frame ROI would
                # otherwise upload 16x its bytes.
                if full:
                    k = _kf_bucket(len(pend), chunk)
                else:
                    k = _count_bucket(len(pend), self._chunk)
                regions = np.zeros((k, bh, bw, 3), np.uint8)
                meta = np.zeros((k, 5), np.int32)  # slot, y, x, rh, rw
                for i, (slot, y, x, rh, rw, region) in enumerate(pend):
                    regions[i, :rh, :rw] = region
                    meta[i] = (slot, y, x, rh, rw)
                # Padding entries have rh=rw=0 => masked no-op.
                self._cache = _paste_many(self._cache, jnp.asarray(regions),
                                          jnp.asarray(meta))
                self.flushes += 1
                self.writes_flushed += len(pend)
        self._pending_bytes = 0

    def _clients_for_slots_locked(self, slots) -> list:
        rev = {s: c for c, s in self._slot_of.items()}
        return [rev[s] for s in slots if s in rev]

    def drain_frozen(self) -> list:
        """One-shot: client ids whose slots froze (shed) since the last
        drain. The server sends each a REQUEST_KEYFRAME command. Slots
        released in the meantime resolve to nothing."""
        if not self._newly_frozen:
            return []  # hot path: called per ROI packet; freezes are rare
        with self._lock:
            slots, self._newly_frozen = self._newly_frozen, []
            # A keyframe that already re-anchored (or a released slot)
            # needs no request anymore.
            slots = [s for s in dict.fromkeys(slots) if s in self._needs_kf]
            if not slots:
                return []
            return self._clients_for_slots_locked(slots)

    def frozen_clients(self) -> list:
        """Client ids currently serving a frozen (shed, pre-keyframe) slot —
        the management loop re-requests keyframes for these in case the
        first command was lost."""
        with self._lock:
            return self._clients_for_slots_locked(list(self._needs_kf))

    def apply_diff(self, client_id: int, diff_region: np.ndarray, x: int, y: int) -> bool:
        """Difference-frame update: the region is the new content for that
        rect (the reference client encodes changed-region *pixels*, not
        deltas — screen_capture.cpp:470-538), so it pastes like a ROI."""
        return self.write_roi(client_id, diff_region, x, y)

    # -------------------------------------------------------------- readout
    def _resolve_locked(self, client_ids):
        """Slot/dims for a batch. A client evicted between the batcher's
        collect and this dispatch resolves to slot 0 with 1x1 dims instead
        of raising — one stale client must not cost every co-batched client
        its result (the dead client's own result is dropped at send time
        when its session no longer exists)."""
        slots, hs, ws = [], [], []
        for cid in client_ids:
            slot = self._slot_of.get(cid)
            if slot is None:
                slots.append(0)
                hs.append(1)
                ws.append(1)
                continue
            h, w = self._dims.get(cid, (0, 0))
            slots.append(slot)
            hs.append(max(h, 1))
            ws.append(max(w, 1))
        return (np.asarray(slots, np.int32), np.asarray(hs, np.int32),
                np.asarray(ws, np.int32))

    def gather(self, client_ids) -> Tuple[jnp.ndarray, np.ndarray, np.ndarray]:
        """Batch device gather: returns (frames (B,H,W,3) device, heights, widths)."""
        with self._lock:
            slots, hs, ws = self._resolve_locked(client_ids)
            self._flush_locked()
            frames = _gather(self._cache, jnp.asarray(slots))
        return frames, hs, ws

    def dispatch_with(self, fn, client_ids):
        """Run fn(cache, slots, heights, widths) under the cache lock.

        Writes donate the previous cache buffer, so any dispatch that closes
        over the buffer must be serialized against them; fn should only
        *launch* device work (fast), not block on results.
        """
        with self._lock:
            slots, hs, ws = self._resolve_locked(client_ids)
            self._flush_locked()
            return fn(self._cache, slots, hs, ws)

    def warm(self) -> None:
        """Pre-compile the write-program grid (ROI paste over every
        {16,32,128,full}px x {16,64,cap}-count bucket combination the
        _roi_bucket/_count_bucket ladders can mint, keyframe scatter) so
        live traffic doesn't stall on first-shape compiles — tens of
        seconds each through a relayed TPU. The first >32px ROI used to hit
        exactly that stall under the cache lock (the 128/full buckets were
        left cold); warming the FULL ladder closes it. Zero-extent writes
        are masked no-ops; content is untouched."""
        with self._lock:
            # Same donation discipline as _flush_locked (review r5): the
            # probe/scatter programs donate the cache buffer, so (a) a
            # warm over a dead cache must revive it first instead of
            # dispatching against a deleted array, and (b) a relay error
            # mid-warm leaves the buffer possibly-donated — mark it dead
            # so the NEXT device touch re-allocates instead of cascading
            # a second failed batch cycle.
            self._revive_cache_locked()
            try:
                self._warm_locked()
            except Exception:
                self._cache_dead = True
                raise

    def _warm_locked(self) -> None:
        probed = set()
        edges_h = sorted({min(e, self.height)
                          for e in (16, 32, 128, self.height)})
        edges_w = sorted({min(e, self.width)
                          for e in (16, 32, 128, self.width)})
        for bh in edges_h:
            for bw in edges_w:
                # Height and width bucket INDEPENDENTLY in
                # _flush_locked, so mixed-aspect classes like
                # (32, full-width) strips are mintable and must be
                # warm too. The count ladder is warmed fully for
                # square classes (the dominant traffic); mixed-aspect
                # classes warm at the first-hit count bucket (16) —
                # their larger counts only mint once >16 same-class
                # writes pend in one window, by which point the
                # persistent compile cache usually has them.
                if (bh, bw) == (self.height, self.width):
                    # Full-extent class flushes on the fine keyframe
                    # count ladder AND chunks at the keyframe stride
                    # (see _flush_writes_locked) — the cap-count
                    # program is unreachable and must not be warmed.
                    kf_cap = min(_KF_CHUNK, self._chunk)
                    counts = tuple(sorted(
                        {_kf_bucket(n, kf_cap)
                         for n in (1, 4, _KF_CHUNK)}))
                else:
                    counts = ((16, 64, self._chunk) if bh == bw
                              else (16,))
                for count in counts:
                    if (count, bh, bw) not in probed:
                        probed.add((count, bh, bw))
                        self._probe_locked(count, bh, bw)
        # Keyframe scatter at every rung the chunked flush can mint
        # (1/4/16, clamped at the slot cap — a cold connect-storm
        # shape's first compile outlasts client liveness through a
        # relayed TPU). Device-side zeros: no H2D; free slots only,
        # since the scatter rewrites whole slot frames.
        if self._free:
            free_slot = jnp.full((1,), self._free[0], jnp.int32)
            for k in sorted({_kf_bucket(min(n, self.num_slots),
                                        self.num_slots)
                             for n in (1, 4, _KF_CHUNK)}):
                slots = jnp.broadcast_to(free_slot, (k,))
                self._cache = _paste_full_many(
                    self._cache,
                    jnp.zeros((k, self.height, self.width, 3), jnp.uint8),
                    slots)
        self.flushes = 0
        self.writes_flushed = 0

    def _probe_locked(self, k: int, bh: int, bw: int) -> None:
        """Compile one _paste_many shape with an all-no-op write batch
        (every entry rh=rw=0 => masked out; cache content untouched)."""
        regions = jnp.zeros((k, bh, bw, 3), jnp.uint8)
        self._cache = _paste_many(self._cache, regions,
                                  jnp.zeros((k, 5), jnp.int32))

    def run_locked(self, fn):
        """Run fn(cache_array) under the cache lock. Writes donate the
        previous buffer, so any dispatch closing over the array must not
        race them (e.g. warmup compiles while clients are already sending
        keyframes). fn should launch device work, not block on results."""
        with self._lock:
            self._flush_locked()
            return fn(self._cache)
