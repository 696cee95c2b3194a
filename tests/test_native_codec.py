"""Native C++ codec vs pure-Python codec cross-validation."""

import numpy as np
import pytest

from zero_latency_yolo_tpu.protocol import (
    AckPacket, Detection, DetectionResultPacket, FrameDataPacket,
    HeartbeatPacket, crc16, parse_packet,
)
from zero_latency_yolo_tpu.protocol import native

pytestmark = pytest.mark.skipif(
    not native.HAVE_NATIVE, reason="native codec unavailable")


def test_crc_matches_python():
    rng = np.random.default_rng(0)
    for n in (0, 1, 9, 100, 1500, 65000):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert native.crc16_native(data) == crc16(data)


def test_validate_accepts_python_packets():
    pkt = HeartbeatPacket(ping=7, sequence=42, timestamp=123456).serialize()
    out = native.validate_packet(pkt)
    assert out == (0, 4, 42, 123456)


def test_validate_rejects_corruption():
    pkt = bytearray(HeartbeatPacket(ping=7).serialize())
    assert native.validate_packet(bytes(pkt)) is not None
    pkt[23] ^= 0xFF
    assert native.validate_packet(bytes(pkt)) is None
    assert native.validate_packet(bytes(pkt[:10])) is None
    pkt2 = bytearray(HeartbeatPacket(ping=7).serialize())
    pkt2[0] ^= 1
    assert native.validate_packet(bytes(pkt2)) is None


def test_native_ack_parses_in_python():
    raw = native.build_ack(31337, 5, 999)
    pkt = parse_packet(raw)
    assert isinstance(pkt, AckPacket)
    assert pkt.acked_sequence == 31337 and pkt.sequence == 5 and pkt.timestamp == 999
    # Byte-identical to the Python serializer.
    assert raw == AckPacket(acked_sequence=31337, sequence=5, timestamp=999).serialize()


def test_native_heartbeat_byte_identical():
    raw = native.build_heartbeat(77, 9, 1000)
    assert raw == HeartbeatPacket(ping=77, sequence=9, timestamp=1000).serialize()


def test_native_detection_result_byte_identical():
    dets_np = np.array([
        [0.5, 0.25, 0.1, 0.2, 0.9, 2],
        [0.1, 0.2, 0.3, 0.4, 0.7, 0]], np.float32)
    tids = np.array([11, 22], np.uint32)
    raw = native.build_detection_result(
        frame_id=1234, frame_ts=5678, dets=dets_np, track_ids=tids,
        det_ts=4242, seq=3, ts_ms=777)
    py = DetectionResultPacket(
        frame_id=1234, frame_timestamp=5678, sequence=3, timestamp=777,
        detections=[
            Detection(0.5, 0.25, 0.1, 0.2, 0.9, 2, 11, 4242),
            Detection(0.1, 0.2, 0.3, 0.4, 0.7, 0, 22, 4242)]).serialize()
    assert raw == py
    back = parse_packet(raw)
    assert isinstance(back, DetectionResultPacket)
    assert back.detections[1].track_id == 22


def test_native_frame_header_parse():
    payload = b"x" * 100
    pkt = FrameDataPacket(frame_id=9, frame_timestamp=100, width=10, height=20,
                          keyframe=True, data=payload).serialize()
    out = native.parse_frame_header(pkt)
    assert out is not None
    fid, ts, w, h, kf, off = out
    assert (fid, ts, w, h, kf) == (9, 100, 10, 20, True)
    assert pkt[off:] == payload


def test_build_frame_data_byte_identity():
    """zl_build_frame_data must emit byte-identical packets to the Python
    FrameDataPacket serializer (client-side hot-path twin of the parse)."""
    import numpy as np
    from zero_latency_yolo_tpu.protocol import FrameDataPacket, parse_packet
    from zero_latency_yolo_tpu.protocol import native
    if not native.HAVE_FRAME_BUILDER:
        import pytest
        pytest.skip("native codec without zl_build_frame_data")
    payload = bytes(np.random.default_rng(0).integers(
        0, 256, 333, dtype=np.uint8))
    want = FrameDataPacket(frame_id=7, frame_timestamp=123456789,
                           width=800, height=600, keyframe=True,
                           data=payload, sequence=42,
                           timestamp=987654321).serialize()
    got = native.build_frame_data(7, 123456789, 800, 600, True, payload,
                                  42, 987654321)
    assert got == want
    pkt = parse_packet(got)  # and the Python parser accepts it
    assert pkt.frame_id == 7 and pkt.keyframe and pkt.data == payload
    # Empty payload edge
    got0 = native.build_frame_data(1, 2, 4, 4, False, b"", 3, 4)
    want0 = FrameDataPacket(frame_id=1, frame_timestamp=2, width=4, height=4,
                            keyframe=False, data=b"", sequence=3,
                            timestamp=4).serialize()
    assert got0 == want0
