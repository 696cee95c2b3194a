"""Frame payload decoding + on-device frame cache tests."""

import numpy as np
import pytest

from zero_latency_yolo_tpu.ops.roi import DeviceFrameCache
from zero_latency_yolo_tpu.protocol import build_roi_header
from zero_latency_yolo_tpu.runtime.frames import (
    FrameDecodeError, decode_frame_payload, encode_jpeg,
)
from zero_latency_yolo_tpu.runtime.simulator import synthetic_frame


def test_raw_rgb_payload():
    frame = synthetic_frame(64, 48, seed=1)
    out = decode_frame_payload(frame.tobytes(), 64, 48)
    assert out.roi is None
    np.testing.assert_array_equal(out.pixels, frame)


def test_jpeg_keyframe_payload():
    frame = synthetic_frame(64, 48, seed=2)
    out = decode_frame_payload(encode_jpeg(frame, 95), 64, 48)
    assert out.roi is None
    assert out.pixels.shape == (48, 64, 3)
    # Lossy but close.
    assert np.abs(out.pixels.astype(int) - frame.astype(int)).mean() < 12


def test_roi_payload():
    region = synthetic_frame(32, 16, seed=3)
    payload = build_roi_header(10, 20, 32, 16, 64) + encode_jpeg(region, 95)
    out = decode_frame_payload(payload, 64, 48)
    assert out.roi is not None
    assert (out.roi.x, out.roi.y) == (10, 20)
    assert out.pixels.shape == (16, 32, 3)


def test_garbage_payload_rejected():
    with pytest.raises(FrameDecodeError):
        decode_frame_payload(b"\x00" * 100, 64, 48)


def test_device_cache_keyframe_roundtrip():
    cache = DeviceFrameCache(num_slots=2, height=64, width=64)
    frame = synthetic_frame(48, 32, seed=4)  # (32h, 48w)
    assert cache.write_keyframe(7, frame)
    frames, hs, ws = cache.gather([7])
    assert hs[0] == 32 and ws[0] == 48
    np.testing.assert_array_equal(np.asarray(frames)[0, :32, :48], frame)


def test_device_cache_roi_paste():
    cache = DeviceFrameCache(num_slots=2, height=64, width=64)
    base = np.zeros((64, 64, 3), np.uint8)
    assert cache.write_keyframe(1, base)
    region = np.full((16, 24, 3), 200, np.uint8)
    assert cache.write_roi(1, region, x=8, y=40)
    out = np.asarray(cache.gather([1])[0])[0]
    np.testing.assert_array_equal(out[40:56, 8:32], region)
    # Outside the region untouched.
    assert out[39, 8:32].sum() == 0 and out[40:56, 7].sum() == 0
    assert out[56:, :].sum() == 0


def test_device_cache_roi_requires_keyframe():
    cache = DeviceFrameCache(num_slots=1, height=64, width=64)
    assert not cache.write_roi(5, np.zeros((8, 8, 3), np.uint8), 0, 0)


def test_device_cache_roi_at_edges():
    cache = DeviceFrameCache(num_slots=1, height=64, width=64)
    cache.write_keyframe(1, np.zeros((64, 64, 3), np.uint8))
    region = np.full((10, 10, 3), 99, np.uint8)
    # Bottom-right corner: bucket block overhangs; masked paste must clip.
    assert cache.write_roi(1, region, x=54, y=54)
    out = np.asarray(cache.gather([1])[0])[0]
    np.testing.assert_array_equal(out[54:64, 54:64], region)
    assert out[:54, :].sum() == 0 and out[:, :54].sum() == 0


def test_device_cache_slot_exhaustion_and_release():
    cache = DeviceFrameCache(num_slots=1, height=16, width=16)
    assert cache.write_keyframe(1, np.zeros((16, 16, 3), np.uint8))
    assert not cache.write_keyframe(2, np.zeros((16, 16, 3), np.uint8))
    cache.release(1)
    assert cache.write_keyframe(2, np.zeros((16, 16, 3), np.uint8))


def test_device_cache_oversized_rejected():
    cache = DeviceFrameCache(num_slots=1, height=16, width=16)
    assert not cache.write_keyframe(1, np.zeros((32, 32, 3), np.uint8))


def test_concurrent_writes_and_fused_dispatch():
    """Cache writes donate the device buffer; dispatches that close over it
    must serialize via the cache lock (a race here raises a
    buffer-donated/deleted error)."""
    import threading
    import jax.numpy as jnp

    cache = DeviceFrameCache(num_slots=4, height=64, width=64)
    for cid in range(4):
        assert cache.write_keyframe(cid, np.zeros((64, 64, 3), np.uint8))

    errors = []
    stop = threading.Event()

    def writer():
        region = np.full((16, 16, 3), 7, np.uint8)
        i = 0
        while not stop.is_set():
            try:
                cache.write_roi(i % 4, region, x=(i * 8) % 48, y=(i * 8) % 48)
            except Exception as e:  # noqa: BLE001
                errors.append(e)
                return
            i += 1

    def reader():
        for i in range(200):
            try:
                out = cache.dispatch_with(
                    lambda c, s, hs, ws: jnp.sum(c[s].astype(jnp.int32)),
                    [i % 4, (i + 1) % 4])
                float(out)  # force
            except Exception as e:  # noqa: BLE001
                errors.append(e)
                return

    t = threading.Thread(target=writer)
    t.start()
    reader()
    stop.set()
    t.join(timeout=5)
    assert not errors, errors[:1]


def test_batched_roi_flush_order_and_noop_padding():
    """Deferred ROI writes apply in submission order in ONE program at the
    next flush; overlapping writes must land last-wins; keyframes drop
    superseded pending deltas for their slot."""
    import numpy as np
    from zero_latency_yolo_tpu.ops.roi import DeviceFrameCache
    cache = DeviceFrameCache(num_slots=2, height=64, width=64)
    base = np.zeros((64, 64, 3), np.uint8)
    assert cache.write_keyframe(1, base)
    r1 = np.full((8, 8, 3), 10, np.uint8)
    r2 = np.full((8, 8, 3), 20, np.uint8)
    assert cache.write_roi(1, r1, 4, 4)
    assert cache.write_roi(1, r2, 8, 8)   # overlaps r1; must win
    assert cache.flushes == 0             # nothing dispatched yet
    frames, hs, ws = cache.gather([1])
    img = np.asarray(frames[0])
    # One keyframe-batch program + one ROI-batch program, 3 writes total.
    assert cache.flushes == 2 and cache.writes_flushed == 3
    assert img[5, 5].tolist() == [10, 10, 10]
    assert img[10, 10].tolist() == [20, 20, 20]   # overlap: last wins
    assert img[12, 12].tolist() == [20, 20, 20]
    assert img[30, 30].tolist() == [0, 0, 0]      # padding no-ops wrote nothing

    # Keyframe supersedes queued deltas for its slot.
    assert cache.write_roi(1, r1, 0, 0)
    assert cache.write_keyframe(1, np.full((64, 64, 3), 77, np.uint8))
    frames, _, _ = cache.gather([1])
    assert np.asarray(frames[0])[0, 0].tolist() == [77, 77, 77]


def test_overflow_sheds_on_writer_thread_without_device_flush():
    """Writer overflow must never dispatch device work from the writer
    thread (single-device-lane discipline): the victim slot's pending
    writes are shed and the slot freezes until its next keyframe."""
    cache = DeviceFrameCache(num_slots=4, height=64, width=64)
    cache._max_pending = 8  # shrink the bound for the test
    kf = {cid: synthetic_frame(64, 64, seed=cid) for cid in (1, 2)}
    for cid in (1, 2):
        assert cache.write_keyframe(cid, kf[cid])
    frames0, _, _ = cache.gather([1, 2])  # flush keyframes
    flushes_before = cache.flushes
    region = np.full((8, 8, 3), 200, np.uint8)
    # Client 1 floods; client 2 trickles.
    ok = [cache.write_roi(1, region, 0, 0) for _ in range(8)]
    ok += [cache.write_roi(2, region, 8, 8)]
    # Overflow happened: client 1 (most queued bytes) was shed and frozen...
    assert cache.writes_shed > 0
    shed_before = cache.writes_shed
    # Frozen slot: deltas are discarded but the stream keeps serving
    # (True => the server still submits the stale cached frame).
    assert cache.write_roi(1, region, 16, 16)
    assert cache.writes_shed == shed_before + 1
    assert cache.write_roi(2, region, 16, 16)      # other slots unaffected
    # ...and the writer thread dispatched NOTHING (no flush count change).
    assert cache.flushes == flushes_before
    # The frozen slot serves its last consistent (keyframe) content.
    frames, _, _ = cache.gather([1, 2])
    got1 = np.asarray(frames[0])
    assert np.array_equal(got1, kf[1])  # client 1's sheds never applied
    got2 = np.asarray(frames[1])
    assert np.array_equal(got2[8:16, 8:16], region)  # client 2's paste did
    # A new keyframe re-anchors the frozen slot.
    kf1b = synthetic_frame(64, 64, seed=9)
    assert cache.write_keyframe(1, kf1b)
    assert cache.write_roi(1, region, 0, 0)
    frames, _, _ = cache.gather([1])
    expect = kf1b.copy()
    expect[0:8, 0:8] = region
    assert np.array_equal(np.asarray(frames[0]), expect)


def test_overflow_byte_bound_sheds():
    cache = DeviceFrameCache(num_slots=2, height=64, width=64)
    cache._max_pending_bytes = 4096
    assert cache.write_keyframe(1, synthetic_frame(64, 64, seed=1))
    cache.gather([1])
    big = np.zeros((32, 32, 3), np.uint8)  # 3 KB each
    assert cache.write_roi(1, big, 0, 0)
    cache.write_roi(1, big, 16, 16)  # crosses the byte bound -> shed
    assert cache.writes_shed >= 1
    assert cache._pending_bytes <= cache._max_pending_bytes


def test_dispatch_survives_mid_batch_eviction():
    """A client evicted between collect and dispatch must not fail the
    whole batch: its slot resolves to a placeholder, co-batched clients
    keep their results."""
    cache = DeviceFrameCache(num_slots=2, height=32, width=32)
    f = synthetic_frame(32, 32, seed=1)
    assert cache.write_keyframe(1, f)
    assert cache.write_keyframe(2, synthetic_frame(32, 32, seed=2))
    cache.release(2)  # evicted after the batcher collected it
    frames, hs, ws = cache.gather([1, 2])
    assert frames.shape[0] == 2
    assert (hs[0], ws[0]) == (32, 32)
    assert (hs[1], ws[1]) == (1, 1)  # placeholder dims for the dead client
    import numpy as np
    assert np.array_equal(np.asarray(frames[0]), f)
    got = cache.dispatch_with(lambda c, s, h, w: (c.shape, list(s)), [1, 2])
    assert got[0][0] == 2 and len(got[1]) == 2  # no KeyError


def test_flush_groups_by_bucket_class(monkeypatch):
    """One full-frame ROI co-pending with small diffs must NOT inflate the
    small writes' program to full extent (128x padded upload bytes through
    a bandwidth-bound host link); writes to different slots flush as
    separate bucket-class programs."""
    import zero_latency_yolo_tpu.ops.roi as roi_mod
    shapes = []
    real = roi_mod._paste_many

    def recording(cache, regions, meta):
        shapes.append(tuple(int(d) for d in regions.shape))
        return real(cache, regions, meta)

    monkeypatch.setattr(roi_mod, "_paste_many", recording)
    cache = DeviceFrameCache(num_slots=4, height=256, width=256)
    for cid in (1, 2):
        assert cache.write_keyframe(cid, np.zeros((256, 256, 3), np.uint8))
    cache.gather([1, 2])
    shapes.clear()
    big = np.full((200, 200, 3), 50, np.uint8)   # bucket -> full extent
    small = np.full((8, 8, 3), 10, np.uint8)     # bucket -> 16px
    assert cache.write_roi(1, big, 0, 0)
    for i in range(5):
        assert cache.write_roi(2, small, 16 * i, 0)
    frames, _, _ = cache.gather([1, 2])
    assert sorted(s[1:3] for s in shapes) == [(16, 16), (256, 256)]
    img1, img2 = np.asarray(frames[0]), np.asarray(frames[1])
    assert img1[100, 100].tolist() == [50] * 3
    assert img2[0, 16].tolist() == [10] * 3
    assert img2[100, 100].tolist() == [0] * 3

    # A slot with writes in TWO classes: runs split at class transitions
    # and flush in phase order, so overlap ordering (last wins) survives
    # WITHOUT promoting the small write to the large class (the promotion
    # inflated a slot's co-pending small diffs to full extent).
    shapes.clear()
    a = np.full((100, 100, 3), 60, np.uint8)     # bucket 128
    b = np.full((8, 8, 3), 70, np.uint8)         # bucket 16, overlaps a
    assert cache.write_roi(1, a, 0, 0)
    assert cache.write_roi(1, b, 0, 0)
    frames, _, _ = cache.gather([1])
    assert [s[1:3] for s in shapes] == [(128, 128), (16, 16)]
    img = np.asarray(frames[0])
    assert img[0, 0].tolist() == [70] * 3        # later small write wins
    assert img[50, 50].tolist() == [60] * 3

    # Order survives a small->large->small alternation too (three runs).
    shapes.clear()
    assert cache.write_roi(1, np.full((8, 8, 3), 80, np.uint8), 0, 0)
    assert cache.write_roi(1, a, 0, 0)           # overwrites the 80s
    assert cache.write_roi(1, np.full((8, 8, 3), 90, np.uint8), 4, 4)
    frames, _, _ = cache.gather([1])
    assert [s[1:3] for s in shapes] == [(16, 16), (128, 128), (16, 16)]
    img = np.asarray(frames[0])
    assert img[0, 0].tolist() == [60] * 3        # run 2 covered run 1
    assert img[4, 4].tolist() == [90] * 3        # run 3 on top


def test_full_extent_roi_uses_fine_count_ladder(monkeypatch):
    """A lone full-frame ROI must not pad its upload 16x: the full-extent
    class flushes on the keyframe-style count ladder (1/4/16/cap)."""
    import zero_latency_yolo_tpu.ops.roi as roi_mod
    shapes = []
    real = roi_mod._paste_many

    def recording(cache, regions, meta):
        shapes.append(tuple(int(d) for d in regions.shape))
        return real(cache, regions, meta)

    monkeypatch.setattr(roi_mod, "_paste_many", recording)
    cache = DeviceFrameCache(num_slots=4, height=64, width=96)
    assert cache.write_keyframe(1, np.zeros((64, 96, 3), np.uint8))
    cache.gather([1])
    shapes.clear()
    assert cache.write_roi(1, np.full((60, 90, 3), 5, np.uint8), 0, 0)
    frames, _, _ = cache.gather([1])
    assert shapes == [(1, 64, 96, 3)]  # exact count, no 16x pad
    assert np.asarray(frames[0])[30, 30].tolist() == [5] * 3


def test_write_rejects_malformed_arrays():
    """Shape/dtype validation happens at ENQUEUE: a malformed array inside
    the batched flush is indistinguishable from a device failure there, and
    that recovery path re-zeros the whole cache (every client re-anchors)."""
    cache = DeviceFrameCache(num_slots=2, height=64, width=64)
    gray = np.zeros((32, 32), np.uint8)             # no channel axis
    f32 = np.zeros((32, 32, 3), np.float32)          # wrong dtype
    assert not cache.write_keyframe(1, gray)
    assert not cache.write_keyframe(1, f32)
    assert cache.write_keyframe(1, np.zeros((64, 64, 3), np.uint8))
    assert not cache.write_roi(1, gray, 0, 0)
    assert not cache.write_roi(1, f32, 0, 0)
    assert not cache.write_roi(1, np.zeros((0, 4, 3), np.uint8), 0, 0)
    # The cache still flushes fine after the rejections.
    frames, _, _ = cache.gather([1])
    assert np.asarray(frames[0]).shape == (64, 64, 3)


def test_empty_jpeg_payload_stays_in_decode_contract():
    """A wire-reachable ROIIMG header with no JPEG body must raise
    FrameDecodeError (cv2.imdecode on an empty buffer RAISES on this cv2),
    keeping the server's bad-packet accounting instead of a traceback."""
    hdr = build_roi_header(4, 4, 8, 8, 64)
    with pytest.raises(FrameDecodeError):
        decode_frame_payload(hdr, 64, 64)
    with pytest.raises(FrameDecodeError):
        decode_frame_payload(b"", 0, 0)


def test_apply_diff_aliases_roi_paste():
    """Difference-frame updates carry changed-region PIXELS in the
    reference encoding (screen_capture.cpp:470-538), so apply_diff pastes
    exactly like write_roi."""
    cache = DeviceFrameCache(num_slots=2, height=32, width=32)
    assert cache.write_keyframe(1, np.zeros((32, 32, 3), np.uint8))
    assert cache.apply_diff(1, np.full((8, 8, 3), 9, np.uint8), 4, 4)
    frames, _, _ = cache.gather([1])
    img = np.asarray(frames[0])
    assert img[4, 4].tolist() == [9] * 3 and img[0, 0].tolist() == [0] * 3


def test_warm_covers_full_roi_bucket_ladder(monkeypatch):
    """warm() must pre-compile EVERY (count, edge) shape the flush
    bucketing can mint — the >32px buckets used to stay cold, and the
    first large ROI stalled tens of seconds on a relayed first-shape
    compile under the cache lock."""
    import zero_latency_yolo_tpu.ops.roi as roi_mod
    from zero_latency_yolo_tpu.ops.roi import (
        _KF_CHUNK, _count_bucket, _kf_bucket, _roi_bucket)
    shapes = set()
    real = roi_mod._paste_many

    def recording(cache, regions, meta):
        shapes.add(tuple(int(d) for d in regions.shape[:3]))
        return real(cache, regions, meta)

    monkeypatch.setattr(roi_mod, "_paste_many", recording)
    cache = DeviceFrameCache(num_slots=2, height=96, width=96)
    cache.warm()
    for n in (1, 20, 40, 96):           # region edges across the ladder
        for k in (1, 30, cache._chunk):  # write counts across the ladder
            edge = min(_roi_bucket(n, 96), 96)
            if edge == 96:
                # Full-extent class: chunks at the keyframe stride and
                # buckets on the fine keyframe ladder (whole-frame pads
                # are the costliest in the system — review r5), so the
                # reachable counts are the kf rungs only.
                kf_cap = min(_KF_CHUNK, cache._chunk)
                want = (_kf_bucket(min(k, kf_cap), kf_cap), edge, edge)
            else:
                want = (_count_bucket(k, cache._chunk), edge, edge)
            assert want in shapes, f"warm() left {want} cold"


def test_frozen_slot_notification_mechanics():
    """_shed_locked records frozen slots; drain_frozen maps them to client
    ids ONCE (and skips already-re-anchored slots); frozen_clients reports
    the live frozen set until a keyframe clears it."""
    cache = DeviceFrameCache(num_slots=4, height=64, width=64)
    cache._max_pending = 0  # any pending ROI write immediately sheds
    for cid in (1, 2):
        assert cache.write_keyframe(cid, synthetic_frame(64, 64, seed=cid))
    cache.gather([1, 2])
    region = np.full((8, 8, 3), 9, np.uint8)
    assert cache.write_roi(1, region, 0, 0)       # sheds + freezes slot
    assert cache.frozen_clients() == [1]
    assert cache.drain_frozen() == [1]
    assert cache.drain_frozen() == []             # one-shot
    # Keyframe re-anchors; a drain of a stale event reports nothing.
    assert cache.write_roi(2, region, 0, 0)
    assert cache.write_keyframe(2, synthetic_frame(64, 64, seed=5))
    assert 2 not in cache.drain_frozen()
    assert cache.frozen_clients() == [1]


def test_zero_area_frames_rejected_everywhere():
    """A 0-width/height 'frame' must not defeat the cache's (0,0) no-frame
    sentinel (has_frame would go true with no pixels, serving the
    zero-initialized slot through inference), nor classify as raw in the
    decoder (expected_raw == 0 == len(data))."""
    cache = DeviceFrameCache(num_slots=1, height=64, width=64)
    assert not cache.write_keyframe(1, np.zeros((0, 64, 3), np.uint8))
    assert not cache.write_keyframe(1, np.zeros((64, 0, 3), np.uint8))
    assert not cache.has_frame(1)
    with pytest.raises(FrameDecodeError, match="zero-area"):
        decode_frame_payload(b"", 0, 480)
    with pytest.raises(FrameDecodeError, match="zero-area"):
        decode_frame_payload(b"", 480, 0)


def test_roi_magic_wins_over_raw_length_coincidence():
    """A ROIIMG payload whose byte length coincidentally equals
    width*height*3 must decode as the region update, not as a raw keyframe
    of garbage (the magic+header+JPEG chain is the stronger discriminator)."""
    region = synthetic_frame(16, 16, seed=3)
    payload = (build_roi_header(4, 8, 16, 16, 64)
               + encode_jpeg(region, quality=90))
    # Pick a PLAUSIBLE frame geometry (the region must fit the frame —
    # that bound is load-bearing now, review r5) whose raw byte size can
    # equal the payload length exactly, padding the payload up to it
    # (libjpeg tolerates trailing bytes).
    height = 16
    width = max(16, -(-len(payload) // (3 * height)))
    payload += b"\x00" * (width * height * 3 - len(payload))
    assert len(payload) == width * height * 3
    decoded = decode_frame_payload(payload, width, height)
    assert decoded.roi is not None
    assert (decoded.roi.x, decoded.roi.y) == (4, 8)
    assert decoded.pixels.shape == (16, 16, 3)


def test_keyframe_flush_chunks_instead_of_padding_to_slot_cap():
    """17 pending keyframes on a 64-slot cache flush as ceil(17/16) = 2
    dispatches of <= 16 frames — NOT one dispatch padded to 64 whole-slot
    frames (3.7x the upload bytes of the real frames, under the lock)."""
    import jax.numpy as jnp
    from zero_latency_yolo_tpu.ops.roi import _gather

    cache = DeviceFrameCache(num_slots=64, height=16, width=16)
    frames = {}
    for cid in range(1, 18):
        f = synthetic_frame(16, 16, seed=cid)
        frames[cid] = f
        assert cache.write_keyframe(cid, f)
    cache.run_locked(lambda c: c)  # flush
    assert cache.flushes == 2
    assert cache.writes_flushed == 17
    for cid in (1, 9, 17):
        slot = cache.slot(cid)
        got = np.asarray(_gather(cache._cache, jnp.asarray([slot])))[0]
        np.testing.assert_array_equal(got, frames[cid])


def test_flush_device_failure_freezes_touched_slots(monkeypatch):
    """A device/relay exception mid-flush consumes the queued writes; the
    touched slots must freeze (serve the last consistent frame, refuse
    deltas, REQUEST_KEYFRAME via drain_frozen) instead of silently pasting
    later deltas over a frame with holes."""
    import zero_latency_yolo_tpu.ops.roi as roi_mod

    cache = DeviceFrameCache(num_slots=4, height=32, width=32)
    base = synthetic_frame(32, 32, seed=1)
    assert cache.write_keyframe(1, base)
    assert cache.write_keyframe(2, synthetic_frame(32, 32, seed=2))
    cache.run_locked(lambda c: c)  # apply cleanly
    assert not cache.frozen_clients()

    # Queue one ROI for client 1, then make the paste program blow up.
    assert cache.write_roi(1, synthetic_frame(8, 8, seed=3), 4, 4)

    def boom(*a, **k):
        raise RuntimeError("relay wedged")
    monkeypatch.setattr(roi_mod, "_paste_many", boom)
    with pytest.raises(RuntimeError, match="relay wedged"):
        cache.run_locked(lambda c: c)
    monkeypatch.undo()

    # Client 1's slot is frozen: deltas refused (but accepted-and-dropped),
    # REQUEST_KEYFRAME queued.
    assert cache.frozen_clients() == [1]
    assert cache.drain_frozen() == [1]
    shed_before = cache.writes_shed
    assert cache.write_roi(1, synthetic_frame(8, 8, seed=4), 0, 0)
    assert cache.writes_shed == shed_before + 1
    # The failed program donated the cache buffer: the next device touch
    # revives it (fresh zeroed cache) and freezes EVERY active slot for
    # keyframe re-anchor — client 2's content is gone with the buffer.
    cache.run_locked(lambda c: c)
    assert set(cache.frozen_clients()) == {1, 2}
    assert cache.drain_frozen() == [2]  # 1 was already requested
    # Fresh keyframes re-anchor and unfreeze, and the cache serves again.
    f1 = synthetic_frame(32, 32, seed=5)
    assert cache.write_keyframe(1, f1)
    assert cache.write_keyframe(2, synthetic_frame(32, 32, seed=6))
    cache.run_locked(lambda c: c)
    assert not cache.frozen_clients()
    import jax.numpy as jnp
    from zero_latency_yolo_tpu.ops.roi import _gather
    got = np.asarray(_gather(cache._cache,
                             jnp.asarray([cache.slot(1)])))[0]
    np.testing.assert_array_equal(got, f1)


def test_jpeg_decode_bomb_refused_before_allocation():
    """A small payload whose JPEG SOF claims huge dimensions must be
    refused by the pre-decode SOF guard (review r5: cv2.imdecode would
    allocate gigabytes before any post-decode shape check) — and ROI
    headers cannot 'license' a big decode past their own frame extent."""
    import time

    import pytest

    from zero_latency_yolo_tpu.protocol import build_roi_header
    from zero_latency_yolo_tpu.runtime.frames import (
        FrameDecodeError, decode_frame_payload, encode_jpeg)

    # Craft a real JPEG then rewrite its SOF dims to 30000x30000.
    jpg = bytearray(encode_jpeg(synthetic_frame(64, 64, seed=1)))
    i = 2
    while i + 4 <= len(jpg):
        m = jpg[i + 1]
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            jpg[i + 5:i + 7] = (30000).to_bytes(2, "big")
            jpg[i + 7:i + 9] = (30000).to_bytes(2, "big")
            break
        i += 2 + int.from_bytes(jpg[i + 2:i + 4], "big")
    t0 = time.perf_counter()
    with pytest.raises(FrameDecodeError, match="refused before allocation"):
        decode_frame_payload(bytes(jpg), 64, 64)
    assert time.perf_counter() - t0 < 0.5  # header walk, not a decode

    # ROI region claiming more than its frame: refused before decode.
    payload = (build_roi_header(0, 0, 32, 16, 64)
               + encode_jpeg(synthetic_frame(32, 16, seed=2)))
    out = decode_frame_payload(payload, 64, 64)   # legit decode works
    assert out.roi is not None
    big = build_roi_header(0, 0, 30000, 30000, 64) + bytes(jpg)
    with pytest.raises(FrameDecodeError, match="exceeds the frame"):
        decode_frame_payload(big, 64, 64)

    # An intact JPEG still decodes (the guard passes honest dims).
    ok = decode_frame_payload(encode_jpeg(synthetic_frame(64, 64, seed=3)),
                              64, 64)
    assert ok.pixels.shape == (64, 64, 3)
