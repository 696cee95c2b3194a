"""ctypes binding to the native codec (native/codec.cpp).

Builds libzlcodec.so on first import if the toolchain is available; all entry
points degrade gracefully to the pure-Python codec, so the framework runs
anywhere — the native tier is a fast path, not a dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from ..utils.logging import get_logger

log = get_logger("codec")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libzlcodec.so")


class _ZlHeader(ctypes.Structure):
    _fields_ = [("type", ctypes.c_uint8),
                ("length", ctypes.c_uint16),
                ("sequence", ctypes.c_uint32),
                ("timestamp", ctypes.c_uint64)]


class _ZlFrameHeader(ctypes.Structure):
    _fields_ = [("frame_id", ctypes.c_uint32),
                ("timestamp", ctypes.c_uint64),
                ("width", ctypes.c_uint16),
                ("height", ctypes.c_uint16),
                ("keyframe", ctypes.c_uint8),
                ("payload_offset", ctypes.c_uint32),
                ("payload_size", ctypes.c_uint32)]


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception as e:  # noqa: BLE001
        log.warning("native codec build failed (%s); using pure-Python codec", e)
        return False


def _sources_newer_than_so() -> bool:
    try:
        so_m = os.path.getmtime(_SO_PATH)
        return any(
            os.path.getmtime(os.path.join(_NATIVE_DIR, n)) > so_m
            for n in os.listdir(_NATIVE_DIR)
            if n.endswith((".c", ".cpp", ".h", "Makefile")))
    except OSError:
        return False


def _load() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_SO_PATH):
        if not _build():
            return None
    elif _sources_newer_than_so():
        # An edited codec.cpp must not silently keep serving the stale
        # binary (the wire format is byte-frozen; a fix that never loads
        # is worse than a build failure). Best-effort: a failed rebuild
        # falls back to the existing .so with the warning from _build.
        _build()
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError as e:
        log.warning("native codec load failed (%s)", e)
        return None
    lib.zl_crc16.restype = ctypes.c_uint16
    lib.zl_crc16.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.zl_validate_packet.restype = ctypes.c_int
    lib.zl_validate_packet.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(_ZlHeader)]
    lib.zl_build_ack.restype = ctypes.c_int
    lib.zl_build_ack.argtypes = [
        ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint64]
    lib.zl_build_heartbeat.restype = ctypes.c_int
    lib.zl_build_heartbeat.argtypes = [
        ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint64]
    lib.zl_build_detection_result.restype = ctypes.c_int
    lib.zl_build_detection_result.argtypes = [
        ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_uint64, ctypes.c_int, ctypes.c_uint32, ctypes.c_uint64]
    lib.zl_parse_frame_header.restype = ctypes.c_int
    lib.zl_parse_frame_header.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(_ZlFrameHeader)]
    try:
        lib.zl_build_frame_data.restype = ctypes.c_int
        lib.zl_build_frame_data.argtypes = [
            ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint64,
            ctypes.c_uint16, ctypes.c_uint16, ctypes.c_uint8,
            ctypes.c_char_p, ctypes.c_int, ctypes.c_uint32, ctypes.c_uint64]
    except AttributeError:
        pass  # stale .so without the symbol: clients fall back to Python
    return lib


_LIB = _load()
HAVE_NATIVE = _LIB is not None


def _require_lib():
    """Builders need the .so; raise a CLEAR error when it's absent instead
    of an AttributeError on None (callers that can fall back should gate on
    HAVE_NATIVE like the server does)."""
    if _LIB is None:
        raise RuntimeError("native codec unavailable (libzlcodec.so not "
                           "built); gate on native.HAVE_NATIVE")
    return _LIB


def crc16_native(data: bytes) -> int:
    return _require_lib().zl_crc16(data, len(data))


def validate_packet(data: bytes) -> Optional[Tuple[int, int, int, int]]:
    """Fast validity check. Returns (type, length, sequence, timestamp) or
    None if invalid. Falls back to None when native codec unavailable."""
    if _LIB is None:
        return None
    hdr = _ZlHeader()
    if _LIB.zl_validate_packet(data, len(data), ctypes.byref(hdr)) != 0:
        return None
    return hdr.type, hdr.length, hdr.sequence, hdr.timestamp


def build_ack(acked_seq: int, seq: int, ts_ms: int) -> bytes:
    buf = ctypes.create_string_buffer(26)
    n = _require_lib().zl_build_ack(buf, acked_seq, seq, ts_ms)
    return buf.raw[:n]


def build_heartbeat(ping: int, seq: int, ts_ms: int) -> bytes:
    buf = ctypes.create_string_buffer(26)
    n = _require_lib().zl_build_heartbeat(buf, ping, seq, ts_ms)
    return buf.raw[:n]


HAVE_FRAME_BUILDER = (HAVE_NATIVE
                      and hasattr(_LIB, "zl_build_frame_data"))


def build_frame_data(frame_id: int, frame_ts: int, w: int, h: int,
                     keyframe: bool, payload: bytes, seq: int,
                     ts_ms: int) -> bytes:
    """FRAME_DATA with the CRC computed in C++ — the client-side hot path
    (a pure-Python CRC over every 60 FPS payload dominates client CPU)."""
    if not HAVE_FRAME_BUILDER:
        # A stale .so can have HAVE_NATIVE without this symbol: raise the
        # module's descriptive error, not a bare ctypes AttributeError.
        raise RuntimeError(
            "native codec lacks zl_build_frame_data (stale libzlcodec.so; "
            "run `make native`) — gate callers on HAVE_FRAME_BUILDER")
    buf = ctypes.create_string_buffer(22 + 17 + len(payload))
    n = _require_lib().zl_build_frame_data(
        buf, frame_id, frame_ts, w, h, 1 if keyframe else 0,
        payload, len(payload), seq, ts_ms)
    if n < 0:
        raise ValueError("frame payload exceeds the u16 body length")
    return buf.raw[:n]


def build_detection_result(frame_id: int, frame_ts: int,
                           dets: np.ndarray, track_ids: np.ndarray,
                           det_ts: int, seq: int, ts_ms: int) -> bytes:
    """dets: (n, 6) f32 [x, y, w, h, conf, class]; track_ids: (n,) u32."""
    n = len(dets)
    buf = ctypes.create_string_buffer(22 + 14 + 40 * max(n, 1))
    dets = np.ascontiguousarray(dets, np.float32)
    tids = np.ascontiguousarray(track_ids, np.uint32)
    size = _require_lib().zl_build_detection_result(
        buf, frame_id, frame_ts,
        dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tids.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        det_ts, n, seq, ts_ms)
    if size < 0:
        raise ValueError("too many detections")
    return buf.raw[:size]


def parse_frame_header(data: bytes):
    """Returns (frame_id, timestamp, width, height, keyframe, payload_offset)
    or None."""
    if _LIB is None:
        return None
    out = _ZlFrameHeader()
    if _LIB.zl_parse_frame_header(data, len(data), ctypes.byref(out)) != 0:
        return None
    return (out.frame_id, out.timestamp, out.width, out.height,
            bool(out.keyframe), out.payload_offset)
