"""Shipped example configs must not rot: each boots a real server
(simulation mode — the referenced model artifacts aren't in-repo) and
serves a frame end-to-end (VERDICT r2 #7)."""

import glob
import os
import time

import pytest

from zero_latency_yolo_tpu.config import ServerConfig
from zero_latency_yolo_tpu.runtime.simulator import SimClient, synthetic_frame

EXAMPLES = sorted(glob.glob(os.path.join(
    os.path.dirname(__file__), "..", "configs", "examples", "*.json")))

_PORT = 27350


def test_examples_exist():
    assert len(EXAMPLES) >= 3  # the three staged BASELINE configs ship


@pytest.mark.parametrize("path", EXAMPLES, ids=[os.path.basename(p)
                                                for p in EXAMPLES])
def test_example_config_boots_and_serves(path):
    global _PORT
    cfg = ServerConfig.load(path, create_if_missing=False)
    # The example's model artifact isn't shipped => simulation mode; ports
    # are remapped so parallel tests don't collide with the example values.
    _PORT += 2
    cfg.model_path = "/nonexistent/example-model.npz"
    cfg.network.port = _PORT
    cfg.network.web_port = 0
    cfg.use_cpu_affinity = False
    cfg.use_high_priority = False
    from test_server_e2e import ServerHarness
    h = ServerHarness(cfg)
    server = h.start()
    c = SimClient(("127.0.0.1", server.port), screen_width=96,
                  screen_height=64)
    try:
        assert server.engine.simulation
        info = c.connect()
        assert info.info.max_clients == cfg.max_clients
        c.start_receiver()
        c.send_raw_frame(synthetic_frame(96, 64, seed=1))
        assert c.wait_results(1, timeout=10), f"{path}: no result served"
    finally:
        c.stop()
        h.stop()
