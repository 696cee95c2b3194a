#!/usr/bin/env bash
# Bootstrap + launch (the rebuild's equivalent of the reference's start.sh:
# deps are baked into the image, the model comes from configs/server.json's
# model_path — .onnx exported by ultralytics, .pt, or native .npz; missing
# weights => simulation mode).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[1/4] building native codec"
make -C zero_latency_yolo_tpu/native

echo "[2/4] preparing directories + default config"
mkdir -p logs models configs
python -c "from zero_latency_yolo_tpu.config import ServerConfig; ServerConfig.load('configs/server.json')"

echo "[3/4] running quick self-test (protocol + config)"
python -m pytest tests/test_protocol.py tests/test_config.py -q

echo "[4/4] starting detection server"
exec python -m zero_latency_yolo_tpu.runtime.server --config configs/server.json "$@"
