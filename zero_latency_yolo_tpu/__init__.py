"""zero_latency_yolo_tpu — a TPU-native real-time video-inference serving framework.

A from-scratch rebuild of the server-side detection engine of
`yynps737/zero-latency-yolo` (reference: /root/reference) designed TPU-first:

- Compute path (preprocess -> YOLOv8 backbone -> decode -> class-weighted NMS)
  is a single jitted JAX/XLA program per batch bucket, with Pallas kernels for
  the memory-bound stages, running on TPU.
- Host path (UDP transport, wire codec, continuous-batching scheduler, Kalman
  tracking, game adapters, config, metrics) is Python orchestrating a C++
  native codec tier.
- The wire protocol is byte-compatible with the reference ZLTY protocol
  (reference: src/common/protocol.h) so existing clients connect unchanged.

Layout:
    protocol/   wire codec (ZLTY packets, CRC16, ROI frame headers)
    models/     JAX YOLOv8 family (n/s/m/l/x), weight conversion, torch parity ref
    ops/        device kernels: letterbox preprocess, decode+NMS, ROI/diff, int8
    parallel/   jax.sharding mesh helpers, batch/tensor sharding for pjit
    runtime/    engine, continuous batcher, UDP server, tracker, adapters, metrics
    utils/      logging, events, timing
    native/     C++ codec/transport sources + build glue
"""

__version__ = "0.1.0"

PROTOCOL_MAGIC = 0x59544C5A  # "ZLTY" (reference: src/common/protocol.h:21)
PROTOCOL_VERSION = 1
