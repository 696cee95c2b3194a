"""Wire-protocol codec tests, including golden byte strings.

Golden packets were hand-assembled from the reference C++ layouts
(src/common/protocol.h, src/common/types.h) — packed 22-byte header, natural
struct padding in CLIENT_INFO/SERVER_INFO/Detection bodies, CRC-16/CCITT-FALSE
over bytes [2:] with the checksum field zeroed.
"""

import struct

import pytest

from zero_latency_yolo_tpu.protocol import (
    HEADER_SIZE, MAGIC, AckPacket, ClientInfo, ClientInfoPacket, CommandPacket,
    Detection, DetectionResultPacket, ErrorPacket, FrameDataPacket,
    HeartbeatPacket, PacketType, ProtocolError, RoiHeader, ServerInfo,
    ServerInfoPacket, build_roi_header, crc16, parse_header, parse_packet,
    parse_roi_header,
)


def _golden(ptype: int, body: bytes, seq: int = 7, ts: int = 1234567890123) -> bytes:
    """Independent re-implementation of the C++ serializer for golden bytes."""
    hdr = struct.pack("<IBBHIQH", 0x59544C5A, 1, ptype, len(body), seq, ts, 0)
    pkt = bytearray(hdr + body)
    csum = crc16(bytes(pkt[2:]))
    struct.pack_into("<H", pkt, 20, csum)
    return bytes(pkt)


def test_header_size_is_packed_22_bytes():
    assert HEADER_SIZE == 22


def test_heartbeat_golden_roundtrip():
    golden = _golden(0, struct.pack("<I", 42))
    pkt = HeartbeatPacket(ping=42, sequence=7, timestamp=1234567890123)
    assert pkt.serialize() == golden
    back = parse_packet(golden)
    assert isinstance(back, HeartbeatPacket)
    assert back.ping == 42 and back.sequence == 7 and back.timestamp == 1234567890123


def test_client_info_padded_struct_layout():
    # ClientInfo is memcpy'd with natural padding: 13 data bytes -> 16 on wire.
    info = ClientInfo(client_id=3, protocol_version=1,
                      screen_width=800, screen_height=600, game_id=1)
    body = info.pack()
    assert len(body) == 16
    assert body == struct.pack("<IIHHB", 3, 1, 800, 600, 1) + b"\x00" * 3
    golden = _golden(1, body)
    back = parse_packet(golden)
    assert isinstance(back, ClientInfoPacket)
    assert back.info == info


def test_server_info_padded_struct_layout():
    info = ServerInfo(server_id=9, protocol_version=1, model_version=1.5,
                      max_clients=10, max_fps=60, status=0)
    body = info.pack()
    assert len(body) == 20
    # Layout: u32, u32, f32, u8, pad, u16, u8, pad3
    assert body[:12] == struct.pack("<IIf", 9, 1, 1.5)
    assert body[12] == 10 and body[13] == 0
    assert struct.unpack_from("<H", body, 14)[0] == 60
    assert body[16] == 0 and body[17:] == b"\x00" * 3
    back = parse_packet(_golden(2, body))
    assert isinstance(back, ServerInfoPacket)
    assert back.info == info


def test_detection_struct_is_40_bytes_with_pad_before_timestamp():
    d = Detection(x=0.5, y=0.25, width=0.1, height=0.2, confidence=0.9,
                  class_id=2, track_id=77, timestamp=999)
    raw = d.pack()
    assert len(raw) == 40
    assert struct.unpack_from("<4f", raw, 0) == pytest.approx((0.5, 0.25, 0.1, 0.2))
    assert struct.unpack_from("<f", raw, 16)[0] == pytest.approx(0.9)
    assert struct.unpack_from("<i", raw, 20)[0] == 2
    assert struct.unpack_from("<I", raw, 24)[0] == 77
    assert raw[28:32] == b"\x00" * 4  # alignment padding
    assert struct.unpack_from("<Q", raw, 32)[0] == 999
    back = Detection.unpack_from(raw)
    assert back.class_id == 2 and back.track_id == 77 and back.timestamp == 999
    assert back.width == pytest.approx(0.1)


def test_detection_result_roundtrip():
    dets = [Detection(0.1 * i, 0.2, 0.05, 0.1, 0.8, i % 4, i, 1000 + i)
            for i in range(5)]
    pkt = DetectionResultPacket(frame_id=1234, frame_timestamp=5678,
                                detections=dets, sequence=2, timestamp=3)
    raw = pkt.serialize()
    body = raw[HEADER_SIZE:]
    assert struct.unpack_from("<IQH", body) == (1234, 5678, 5)
    assert len(body) == 14 + 5 * 40
    back = parse_packet(raw)
    assert isinstance(back, DetectionResultPacket)
    assert back.frame_id == 1234 and len(back.detections) == 5
    for a, b in zip(back.detections, dets):
        assert a.class_id == b.class_id and a.track_id == b.track_id
        assert abs(a.x - b.x) < 1e-6


def test_frame_data_roundtrip_and_nonstrict_payload():
    payload = bytes(range(256)) * 3
    pkt = FrameDataPacket(frame_id=5, frame_timestamp=100, width=16, height=16,
                          keyframe=True, data=payload, sequence=9, timestamp=8)
    raw = pkt.serialize()
    back = parse_packet(raw)
    assert isinstance(back, FrameDataPacket)
    assert back.width == 16 and back.height == 16 and back.keyframe
    assert back.data == payload  # compressed payloads allowed (non-strict)


def test_command_error_ack_roundtrip():
    c = parse_packet(CommandPacket(command_type=5, command_data=b"xy").serialize())
    assert isinstance(c, CommandPacket) and c.command_type == 5 and c.command_data == b"xy"
    e = parse_packet(ErrorPacket(error_code=2, message="full").serialize())
    assert isinstance(e, ErrorPacket) and e.error_code == 2 and e.message == "full"
    a = parse_packet(AckPacket(acked_sequence=31337).serialize())
    assert isinstance(a, AckPacket) and a.acked_sequence == 31337
    assert a.TYPE == PacketType.ACK == 8


def test_corruption_detected():
    raw = bytearray(HeartbeatPacket(ping=1).serialize())
    raw[HEADER_SIZE] ^= 0xFF  # flip a body byte
    with pytest.raises(ProtocolError, match="checksum"):
        parse_packet(bytes(raw))


def test_bad_magic_and_truncation_rejected():
    raw = bytearray(HeartbeatPacket(ping=1).serialize())
    with pytest.raises(ProtocolError):
        parse_packet(bytes(raw[:10]))
    raw[0] ^= 0xFF
    with pytest.raises(ProtocolError, match="magic"):
        parse_packet(bytes(raw))


def test_length_mismatch_rejected():
    raw = HeartbeatPacket(ping=1).serialize() + b"\x00"
    with pytest.raises(ProtocolError, match="length"):
        parse_packet(raw)


def test_crc_is_ccitt_false():
    # Known-answer test: CRC-16/CCITT-FALSE("123456789") = 0x29B1.
    assert crc16(b"123456789") == 0x29B1


def test_header_parse():
    raw = HeartbeatPacket(ping=0, sequence=5, timestamp=6).serialize()
    hdr = parse_header(raw)
    assert hdr.magic == MAGIC and hdr.sequence == 5 and hdr.timestamp == 6
    assert hdr.type == PacketType.HEARTBEAT and hdr.length == 4


def test_roi_header_roundtrip():
    raw = build_roi_header(10, 20, 320, 240, 800)
    assert len(raw) == 16 and raw[:6] == b"ROIIMG"
    hdr = parse_roi_header(raw + b"jpegdata")
    assert hdr == RoiHeader(x=10, y=20, width=320, height=240, full_width=800)
    assert parse_roi_header(b"\xff\xd8jpeg-soi" + bytes(20)) is None


def test_parser_fuzz_random_and_mutated():
    """Host-side codec fuzz (the C++ twin has its own 200k ASan fuzz):
    random garbage and bit-flipped valid packets must raise ProtocolError
    at worst — never any other exception."""
    import numpy as np
    from zero_latency_yolo_tpu.protocol import (
        HeartbeatPacket, FrameDataPacket, ProtocolError, parse_packet)
    rng = np.random.default_rng(0)
    for n in (0, 1, 21, 22, 23, 64, 1500):
        for _ in range(200):
            blob = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            try:
                parse_packet(blob)
            except ProtocolError:
                pass
    valid = [HeartbeatPacket(ping=7).serialize(),
             FrameDataPacket(frame_id=1, frame_timestamp=2, width=4, height=4,
                             data=b"x" * 48).serialize()]
    for raw in valid:
        arr = np.frombuffer(raw, np.uint8).copy()
        for _ in range(500):
            mut = arr.copy()
            for _ in range(int(rng.integers(1, 4))):
                mut[int(rng.integers(len(mut)))] ^= 1 << int(rng.integers(8))
            try:
                parse_packet(mut.tobytes())
            except ProtocolError:
                pass


def test_frame_decoder_fuzz():
    import numpy as np
    from zero_latency_yolo_tpu.protocol import build_roi_header
    from zero_latency_yolo_tpu.runtime.frames import (
        FrameDecodeError, decode_frame_payload, encode_jpeg)
    rng = np.random.default_rng(1)
    samples = [rng.integers(0, 256, n, dtype=np.uint8).tobytes()
               for n in (0, 3, 16, 100, 4096) for _ in range(50)]
    # Mutated JPEG + ROI payloads.
    frame = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    jpeg = encode_jpeg(frame, 80)
    roi = build_roi_header(0, 0, 16, 16, 32) + jpeg
    for raw in (jpeg, roi):
        arr = np.frombuffer(raw, np.uint8).copy()
        for _ in range(200):
            mut = arr.copy()
            mut[int(rng.integers(len(mut)))] ^= 0xFF
            samples.append(mut.tobytes())
    for blob in samples:
        try:
            decode_frame_payload(blob, 16, 16)
        except FrameDecodeError:
            pass


def test_config_update_packet_roundtrip():
    from zero_latency_yolo_tpu.protocol import (
        ConfigUpdatePacket, ProtocolError, parse_packet)
    pkt = ConfigUpdatePacket(settings={"confidence_threshold": 0.6,
                                       "nms_threshold": 0.4})
    back = parse_packet(pkt.serialize())
    assert isinstance(back, ConfigUpdatePacket)
    assert back.settings == {"confidence_threshold": 0.6,
                             "nms_threshold": 0.4}
    # Malformed JSON body is a typed protocol error, not a crash.
    broken = _golden(7, b"\x05\x00{oops")  # u16 len + invalid json
    with pytest.raises(ProtocolError, match="json"):
        parse_packet(broken)
    # Non-object JSON rejected too.
    with pytest.raises(ProtocolError, match="object"):
        parse_packet(_golden(7, b"\x02\x00[]"))


def test_sequence_space_partitioned_from_native_acks():
    from zero_latency_yolo_tpu.protocol.packets import next_sequence
    for _ in range(1000):
        assert 1 <= next_sequence() < 0x80000000
