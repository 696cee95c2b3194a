// Native UDP transport core: batched datagram intake via recvmmsg.
//
// TPU-native replacement for the reference's per-datagram recvfrom thread
// (reference: src/network/reliable_udp.cpp:465-539, one recvfrom + 100us
// sleep per loop). Here a single syscall drains up to ZL_RECV_BATCH packets
// into a caller-provided arena; ctypes releases the GIL for the call's
// duration, so Python threads keep running while this blocks in poll().
//
// API (all little-endian host structs, IPv4):
//   zl_udp_open(port, rcvbuf, sndbuf) -> fd (or -errno); binds 0.0.0.0:port
//   zl_udp_recv_batch(fd, arena, arena_cap, pkts, max_pkts, timeout_ms)
//       -> n packets written (0 on timeout, -errno on error)
//   zl_udp_send(fd, data, len, ip_be, port_be) -> sent bytes or -errno
//   zl_udp_close(fd)

#include <arpa/inet.h>
#include <cerrno>
#include <cstdint>
#include <cstring>
#include <netinet/in.h>
#include <poll.h>
#include <sys/socket.h>
#include <unistd.h>

extern "C" {

static const int ZL_RECV_BATCH_MAX = 128;

struct ZlPacketDesc {
    uint32_t offset;   // into the arena
    uint32_t length;
    uint32_t ip_be;    // sender IPv4, network byte order
    uint16_t port_be;  // sender port, network byte order
    uint16_t _pad;
};

int zl_udp_open(int port, int rcvbuf, int sndbuf) {
    int fd = ::socket(AF_INET, SOCK_DGRAM, 0);
    if (fd < 0) return -errno;
    int one = 1;
    ::setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
    if (rcvbuf > 0) ::setsockopt(fd, SOL_SOCKET, SO_RCVBUF, &rcvbuf, sizeof(rcvbuf));
    if (sndbuf > 0) ::setsockopt(fd, SOL_SOCKET, SO_SNDBUF, &sndbuf, sizeof(sndbuf));
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_addr.s_addr = htonl(INADDR_ANY);
    addr.sin_port = htons(static_cast<uint16_t>(port));
    if (::bind(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
        int e = errno;
        ::close(fd);
        return -e;
    }
    return fd;
}

int zl_udp_recv_batch(int fd, uint8_t* arena, int arena_cap,
                      ZlPacketDesc* pkts, int max_pkts, int timeout_ms) {
    if (max_pkts > ZL_RECV_BATCH_MAX) max_pkts = ZL_RECV_BATCH_MAX;
    pollfd pfd{fd, POLLIN, 0};
    int pr = ::poll(&pfd, 1, timeout_ms);
    if (pr < 0) return errno == EINTR ? 0 : -errno;
    if (pr == 0) return 0;

    static thread_local mmsghdr msgs[ZL_RECV_BATCH_MAX];
    static thread_local iovec iovs[ZL_RECV_BATCH_MAX];
    static thread_local sockaddr_in addrs[ZL_RECV_BATCH_MAX];

    const int slot = arena_cap / max_pkts;
    for (int i = 0; i < max_pkts; i++) {
        iovs[i].iov_base = arena + i * slot;
        iovs[i].iov_len = slot;
        std::memset(&msgs[i], 0, sizeof(mmsghdr));
        msgs[i].msg_hdr.msg_iov = &iovs[i];
        msgs[i].msg_hdr.msg_iovlen = 1;
        msgs[i].msg_hdr.msg_name = &addrs[i];
        msgs[i].msg_hdr.msg_namelen = sizeof(sockaddr_in);
    }
    int n = ::recvmmsg(fd, msgs, max_pkts, MSG_DONTWAIT, nullptr);
    if (n < 0) {
        int e = errno;
        return (e == EAGAIN || e == EWOULDBLOCK || e == EINTR) ? 0 : -e;
    }
    for (int i = 0; i < n; i++) {
        pkts[i].offset = static_cast<uint32_t>(i * slot);
        pkts[i].length = msgs[i].msg_len;
        pkts[i].ip_be = addrs[i].sin_addr.s_addr;
        pkts[i].port_be = addrs[i].sin_port;
        pkts[i]._pad = 0;
    }
    return n;
}

int zl_udp_send(int fd, const uint8_t* data, int len,
                uint32_t ip_be, uint16_t port_be) {
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_addr.s_addr = ip_be;
    addr.sin_port = port_be;
    ssize_t sent = ::sendto(fd, data, len, 0,
                            reinterpret_cast<sockaddr*>(&addr), sizeof(addr));
    return sent < 0 ? -errno : static_cast<int>(sent);
}

void zl_udp_close(int fd) {
    ::close(fd);
}

}  // extern "C"
