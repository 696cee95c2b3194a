// Native codec self-test + fuzz harness. Built with ASan/UBSan via
// `make test-native` (the sanitizer CI the reference never had — SURVEY §5.2).
//
//   codec_test            round-trip + known-answer checks
//   codec_test fuzz N     N random mutations of valid packets through
//                         zl_validate_packet / zl_parse_frame_header —
//                         must never crash or overread (ASan enforces)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

extern "C" {
uint16_t zl_crc16(const uint8_t*, size_t);
struct ZlHeader { uint8_t type; uint16_t length; uint32_t sequence; uint64_t timestamp; };
int zl_validate_packet(const uint8_t*, size_t, ZlHeader*);
int zl_build_ack(uint8_t*, uint32_t, uint32_t, uint64_t);
int zl_build_heartbeat(uint8_t*, uint32_t, uint32_t, uint64_t);
int zl_build_detection_result(uint8_t*, uint32_t, uint64_t, const float*,
                              const uint32_t*, uint64_t, int, uint32_t, uint64_t);
struct ZlFrameHeader { uint32_t frame_id; uint64_t timestamp; uint16_t width;
                       uint16_t height; uint8_t keyframe; uint32_t payload_offset;
                       uint32_t payload_size; };
int zl_parse_frame_header(const uint8_t*, size_t, ZlFrameHeader*);
}

#define CHECK(cond) do { if (!(cond)) { \
    std::fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond); \
    std::exit(1); } } while (0)

static void test_known_answers() {
    // CRC-16/CCITT-FALSE("123456789") == 0x29B1
    CHECK(zl_crc16(reinterpret_cast<const uint8_t*>("123456789"), 9) == 0x29B1);

    uint8_t buf[64];
    int n = zl_build_ack(buf, 31337, 5, 999);
    CHECK(n == 26);
    ZlHeader hdr;
    CHECK(zl_validate_packet(buf, n, &hdr) == 0);
    CHECK(hdr.type == 8 && hdr.sequence == 5 && hdr.timestamp == 999);
    uint32_t acked;
    std::memcpy(&acked, buf + 22, 4);
    CHECK(acked == 31337);

    // Corruption must be detected.
    buf[23] ^= 0xFF;
    CHECK(zl_validate_packet(buf, n, &hdr) == 4);
    buf[23] ^= 0xFF;
    CHECK(zl_validate_packet(buf, n - 1, &hdr) == 3);
    CHECK(zl_validate_packet(buf, 10, &hdr) == 1);
    buf[0] ^= 1;
    CHECK(zl_validate_packet(buf, n, &hdr) == 2);
}

static void test_detection_result() {
    float dets[2][6] = {{0.5f, 0.25f, 0.1f, 0.2f, 0.9f, 2.0f},
                        {0.1f, 0.2f, 0.3f, 0.4f, 0.7f, 0.0f}};
    uint32_t tids[2] = {11, 22};
    std::vector<uint8_t> buf(22 + 14 + 40 * 2);
    int n = zl_build_detection_result(buf.data(), 1234, 5678, &dets[0][0],
                                      tids, 4242, 2, 3, 777);
    CHECK(n == static_cast<int>(buf.size()));
    ZlHeader hdr;
    CHECK(zl_validate_packet(buf.data(), n, &hdr) == 0);
    CHECK(hdr.type == 4 && hdr.length == 14 + 80);
    uint16_t count;
    std::memcpy(&count, buf.data() + 22 + 12, 2);
    CHECK(count == 2);
    // Detection struct padding bytes must be zeroed (deterministic wire).
    for (int i = 0; i < 2; i++) {
        const uint8_t* d = buf.data() + 22 + 14 + 40 * i;
        CHECK(d[28] == 0 && d[29] == 0 && d[30] == 0 && d[31] == 0);
    }
}

static void test_frame_header() {
    // Hand-build a FRAME_DATA packet body.
    std::vector<uint8_t> pkt(22 + 17 + 5, 0xAB);
    uint32_t magic = 0x59544C5A;
    std::memcpy(pkt.data(), &magic, 4);
    pkt[4] = 1; pkt[5] = 3;
    uint16_t len = 22;
    std::memcpy(pkt.data() + 6, &len, 2);
    uint32_t fid = 9; std::memcpy(pkt.data() + 22, &fid, 4);
    uint64_t ts = 100; std::memcpy(pkt.data() + 26, &ts, 8);
    uint16_t w = 10, h = 20;
    std::memcpy(pkt.data() + 34, &w, 2);
    std::memcpy(pkt.data() + 36, &h, 2);
    pkt[38] = 1;
    ZlFrameHeader fh;
    CHECK(zl_parse_frame_header(pkt.data(), pkt.size(), &fh) == 0);
    CHECK(fh.frame_id == 9 && fh.width == 10 && fh.height == 20 && fh.keyframe == 1);
    CHECK(fh.payload_offset == 39 && fh.payload_size == 5);
    // Zero dimensions rejected.
    std::memset(pkt.data() + 34, 0, 2);
    CHECK(zl_parse_frame_header(pkt.data(), pkt.size(), &fh) == 1);
}

static void fuzz(int iters) {
    std::mt19937 rng(1234);
    uint8_t base[512];
    float dets[4][6] = {};
    uint32_t tids[4] = {1, 2, 3, 4};
    int n = zl_build_detection_result(base, 1, 2, &dets[0][0], tids, 3, 4, 5, 6);
    std::vector<uint8_t> buf;
    for (int i = 0; i < iters; i++) {
        size_t size = rng() % (n + 32);
        buf.assign(base, base + n);
        buf.resize(size > 0 ? size : 1);
        int flips = rng() % 8;
        for (int f = 0; f < flips && !buf.empty(); f++) {
            buf[rng() % buf.size()] ^= static_cast<uint8_t>(rng());
        }
        ZlHeader hdr;
        zl_validate_packet(buf.data(), buf.size(), &hdr);  // must not crash
        ZlFrameHeader fh;
        zl_parse_frame_header(buf.data(), buf.size(), &fh);
    }
    std::printf("fuzz: %d iterations clean\n", iters);
}

int main(int argc, char** argv) {
    if (argc > 1 && std::strcmp(argv[1], "fuzz") == 0) {
        fuzz(argc > 2 ? std::atoi(argv[2]) : 100000);
        return 0;
    }
    test_known_answers();
    test_detection_result();
    test_frame_header();
    std::printf("codec_test: all checks passed\n");
    return 0;
}
