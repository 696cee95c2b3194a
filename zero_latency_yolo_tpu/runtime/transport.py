"""Native UDP transport: C++ recvmmsg intake feeding the asyncio server.

Opt-in via `network.use_native_transport` (config). A drain thread blocks in
the C++ batch-receive (GIL released by ctypes for the call), then hands each
batch to the event loop in one call_soon_threadsafe — per-datagram Python
overhead collapses to per-batch overhead at high packet rates, replacing the
reference's recvfrom-per-loop thread (src/network/reliable_udp.cpp:465-539).

Falls back cleanly: if libzlcodec.so lacks the UDP symbols, the server keeps
its asyncio datagram endpoint.
"""

from __future__ import annotations

import ctypes
import socket
import struct
import threading
from typing import Callable, List, Optional, Tuple

from ..protocol import native as _codec
from ..utils.logging import get_logger

log = get_logger("transport")

# Each slot must hold the largest ZLTY datagram (PROTOCOL_MAX_PACKET_SIZE);
# recvmmsg silently truncates to iov_len otherwise.
MAX_PKTS = 64
ARENA_CAP = MAX_PKTS * 65536  # 4 MB arena


class _ZlPacketDesc(ctypes.Structure):
    _fields_ = [("offset", ctypes.c_uint32),
                ("length", ctypes.c_uint32),
                ("ip_be", ctypes.c_uint32),
                ("port_be", ctypes.c_uint16),
                ("_pad", ctypes.c_uint16)]


def _bind_udp_symbols(lib: ctypes.CDLL) -> bool:
    try:
        lib.zl_udp_open.restype = ctypes.c_int
        lib.zl_udp_open.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.zl_udp_recv_batch.restype = ctypes.c_int
        lib.zl_udp_recv_batch.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(_ZlPacketDesc), ctypes.c_int, ctypes.c_int]
        lib.zl_udp_send.restype = ctypes.c_int
        lib.zl_udp_send.argtypes = [ctypes.c_int, ctypes.c_char_p,
                                    ctypes.c_int, ctypes.c_uint32,
                                    ctypes.c_uint16]
        lib.zl_udp_close.restype = None
        lib.zl_udp_close.argtypes = [ctypes.c_int]
        return True
    except AttributeError:
        return False


HAVE_NATIVE_UDP = _codec._LIB is not None and _bind_udp_symbols(_codec._LIB)


class NativeUdpTransport:
    """asyncio-transport-shaped wrapper over the C++ socket: sendto/close,
    plus a drain thread delivering inbound batches to a callback."""

    def __init__(self, port: int, recv_buffer: int, send_buffer: int,
                 on_batch: Callable[[List[Tuple[bytes, Tuple[str, int]]]], None]
                 ) -> None:
        if not HAVE_NATIVE_UDP:
            raise RuntimeError("native UDP symbols unavailable")
        self._lib = _codec._LIB
        fd = self._lib.zl_udp_open(port, recv_buffer, send_buffer)
        if fd < 0:
            raise OSError(-fd, f"zl_udp_open({port}) failed")
        self.fd = fd
        self.port = port
        self.on_batch = on_batch
        self._arena = ctypes.create_string_buffer(ARENA_CAP)
        self._descs = (_ZlPacketDesc * MAX_PKTS)()
        self._running = True
        self._thread = threading.Thread(target=self._drain_loop,
                                        name="zlt-native-udp", daemon=True)
        self._thread.start()

    # ---------------------------------------------------------------- sends
    def sendto(self, data: bytes, addr: Tuple[str, int]) -> None:
        ip_be = struct.unpack("=I", socket.inet_aton(addr[0]))[0]
        port_be = socket.htons(addr[1])
        self._lib.zl_udp_send(self.fd, data, len(data), ip_be, port_be)

    def close(self) -> None:
        self._running = False
        if self._thread:
            self._thread.join(timeout=2.0)
        self._lib.zl_udp_close(self.fd)

    # ----------------------------------------------------------------- recv
    def _drain_loop(self) -> None:
        arena = self._arena
        descs = self._descs
        while self._running:
            n = self._lib.zl_udp_recv_batch(
                self.fd, arena, ARENA_CAP, descs, MAX_PKTS, 100)
            if n < 0:
                log.warning("native recv error: errno=%d", -n)
                continue
            if n == 0:
                continue
            batch = []
            base = ctypes.addressof(arena)
            for i in range(n):
                d = descs[i]
                # Copy just this datagram out of the arena (arena.raw would
                # copy the whole 4 MB buffer per batch).
                data = ctypes.string_at(base + d.offset, d.length)
                ip = socket.inet_ntoa(struct.pack("=I", d.ip_be))
                batch.append((data, (ip, socket.ntohs(d.port_be))))
            try:
                self.on_batch(batch)
            except Exception:  # noqa: BLE001
                log.exception("native batch handler failed")
