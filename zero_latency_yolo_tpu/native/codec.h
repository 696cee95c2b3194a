// Shared declarations between the codec and transport translation units.
//
// ZlHeader and the cross-TU prototypes used to be hand-duplicated in
// udp.cpp; mismatched struct definitions across C translation units are
// not diagnosed by the compiler OR the linker — a field added in one copy
// would silently misread header bytes at runtime. One header makes drift
// a compile error. The layout mirrors protocol/packets.py's parsed view
// of the 22-byte wire header (byte-frozen; golden tests in
// tests/test_protocol.py and byte-identity in tests/test_native_codec.py).
#ifndef ZL_CODEC_H
#define ZL_CODEC_H

#include <cstddef>
#include <cstdint>

struct ZlHeader {
    uint8_t type;
    uint16_t length;
    uint32_t sequence;
    uint64_t timestamp;
};

// Returns 0 ok; 1 too small; 2 bad magic/version; 3 bad length; 4 bad CRC.
extern "C" int zl_validate_packet(const uint8_t* data, size_t size,
                                  ZlHeader* out);
extern "C" int zl_build_ack(uint8_t* out, uint32_t acked_seq, uint32_t seq,
                            uint64_t ts);

#endif  // ZL_CODEC_H
