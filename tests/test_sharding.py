"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from zero_latency_yolo_tpu.models import fold_batchnorm, forward_decoded, get_spec, init_params
from zero_latency_yolo_tpu.models.weights import flatten
from zero_latency_yolo_tpu.parallel import (
    DATA_AXIS, MODEL_AXIS, batch_sharding, make_mesh, param_shardings,
    shard_params,
)
from zero_latency_yolo_tpu.train import init_train_state, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")

SIZE = 64


def test_mesh_construction():
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {DATA_AXIS: 4, MODEL_AXIS: 2}
    with pytest.raises(ValueError):
        make_mesh(data=3, model=2)


def test_param_shardings_split_conv_channels():
    mesh = make_mesh(data=4, model=2)
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    sh = param_shardings(params, mesh)
    flat_p = flatten(jax.tree.map(np.asarray, params))
    flat_s = dict(zip(flat_p.keys(), jax.tree.leaves(
        sh, is_leaf=lambda x: isinstance(x, NamedSharding))))
    # A large backbone conv shards its output channels.
    key = "m9/cv2/w"
    assert flat_s[key].spec == P(None, None, None, MODEL_AXIS)
    # Detect-head tip convs stay replicated.
    assert flat_s["m22/cv3/0/2/w"].spec == P()


def test_sharded_inference_matches_single_device():
    mesh = make_mesh(data=4, model=2)
    spec = get_spec("yolov8p", 4)
    params = fold_batchnorm(init_params(jax.random.PRNGKey(0), spec, folded=False))
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (8, SIZE, SIZE, 3)),
                   np.float32)
    ref = np.asarray(forward_decoded(params, spec, jnp.asarray(x)))

    params_sh = shard_params(params, mesh)
    x_sh = jax.device_put(x, batch_sharding(mesh, 4))
    fn = jax.jit(lambda p, x: forward_decoded(p, spec, x))
    got = np.asarray(fn(params_sh, x_sh))
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_spmd_train_step_runs_and_descends():
    mesh = make_mesh(data=4, model=2)
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=False)
    tx = optax.sgd(5e-3, momentum=0.9)
    state = init_train_state(params, tx)
    step = make_train_step(spec, tx, (SIZE, SIZE), mesh=mesh)
    state = step.shard_state(state)

    images = jax.device_put(
        np.random.default_rng(0).uniform(0, 1, (8, SIZE, SIZE, 3)).astype(np.float32),
        NamedSharding(mesh, P(DATA_AXIS, None, None, None)))
    targets = np.full((8, 4, 5), -1, np.float32)
    targets[:, 0] = [1, 0.5, 0.5, 0.25, 0.4]
    targets = jax.device_put(
        targets, NamedSharding(mesh, P(DATA_AXIS, None, None)))

    losses = []
    for _ in range(3):
        state, metrics = step(state, images, targets)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert float(metrics["num_pos"]) > 0
    assert losses[-1] < losses[0]  # same batch: loss must fall
    assert int(state.step) == 3


def test_engine_serving_mesh_matches_single_device(tmp_path):
    """tpu.mesh_data/mesh_model configure the live engine: the hosted
    dispatch AND the sharded device-cache path produce the same packed
    results as a single-device engine."""
    from zero_latency_yolo_tpu.config import ServerConfig
    from zero_latency_yolo_tpu.models import save_params
    from zero_latency_yolo_tpu.ops.roi import DeviceFrameCache
    from zero_latency_yolo_tpu.runtime.engine import (
        InferenceEngine, InferenceRequest)

    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(2), spec, folded=True)
    path = str(tmp_path / "m.npz")
    save_params(params, path)

    def cfg(md, mm):
        return ServerConfig.from_dict({
            "model_path": path,
            "confidence_threshold": 0.1,
            "detection": {"model_width": SIZE, "model_height": SIZE},
            "tpu": {"variant": "yolov8p", "num_classes": 4,
                    "dtype": "float32", "pre_nms_topk": 64,
                    "batch_buckets": [8], "frame_buckets": [[96, 96]],
                    "mesh_data": md, "mesh_model": mm},
        })

    single = InferenceEngine(cfg(1, 1), params=params)
    meshed = InferenceEngine(cfg(4, 2), params=params)
    assert meshed.mesh is not None

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (8, 96, 96, 3), np.uint8)
    reqs = [InferenceRequest(client_id=i + 1, frame_id=i, timestamp=0,
                             width=96, height=96, data=frames[i])
            for i in range(8)]
    import copy
    r1 = single.infer_batch(copy.deepcopy(reqs))
    r2 = meshed.infer_batch(copy.deepcopy(reqs))
    assert len(r1) == len(r2) == 8
    for a, b in zip(r1, r2):
        assert len(a.detections) == len(b.detections)
        for da, db in zip(a.detections, b.detections):
            assert da.x == pytest.approx(db.x, abs=1e-5)
            assert da.class_id == db.class_id

    # Sharded device-cache path: write frames into a slot-sharded cache and
    # run the fused gather+serve step SPMD.
    cache = DeviceFrameCache(8, 96, 96, sharding=meshed.batch_sharding(4))
    assert cache.num_slots == 8
    for i in range(8):
        assert cache.acquire(i + 1) is not None
        assert cache.write_keyframe(i + 1, frames[i])
    reqs3 = [InferenceRequest(client_id=i + 1, frame_id=i, timestamp=0,
                              width=96, height=96, data=None)
             for i in range(8)]
    pending = cache.dispatch_with(
        lambda c, s, hs, ws: meshed.dispatch_from_cache(reqs3, c, s, hs, ws),
        [r.client_id for r in reqs3])
    r3 = meshed.complete(pending)
    for a, c in zip(r1, r3):
        assert len(a.detections) == len(c.detections)
        for da, dc in zip(a.detections, c.detections):
            assert da.x == pytest.approx(dc.x, abs=1e-5)


def test_detect_head_tips_replicated():
    """The final conv of each detect-head branch must stay replicated under
    tensor parallelism (its full channel dim feeds the DFL/class decode);
    the O=64 box tip used to slip past the size filter."""
    import jax
    from jax.sharding import PartitionSpec as P
    from zero_latency_yolo_tpu.models import get_spec, init_params
    from zero_latency_yolo_tpu.parallel.mesh import make_mesh, param_shardings
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    mesh = make_mesh(data=2, model=4, devices=jax.devices()[:8])
    sh = param_shardings(params, mesh)
    head = sh["m22"]
    for branch in ("cv2", "cv3"):
        for lvl in range(3):
            assert head[branch][lvl][2]["w"].spec == P(), (branch, lvl)
            assert head[branch][lvl][2]["b"].spec == P(), (branch, lvl)
    # Backbone convs with large O still shard.
    assert sh["m1"]["w"].spec == P(None, None, None, "model")


def test_warmup_executable_matches_live_dispatch_under_mesh():
    """Committed input shardings are part of the jit cache key: warmup must
    place inputs exactly like live dispatch or the first live batch pays a
    fresh XLA compile on the serving mesh (regression: warmup used
    uncommitted jnp.asarray, live used device_put + NamedSharding)."""
    import jax
    import numpy as np
    from zero_latency_yolo_tpu.config import ServerConfig
    from zero_latency_yolo_tpu.models import get_spec, init_params
    from zero_latency_yolo_tpu.runtime.engine import (
        InferenceEngine, InferenceRequest)

    cfg = ServerConfig.from_dict({
        "model_path": "/nonexistent.npz",
        "detection": {"model_width": 64, "model_height": 64},
        "tpu": {"variant": "yolov8p", "num_classes": 4, "dtype": "float32",
                "batch_buckets": [2], "frame_buckets": [[96, 96]],
                "pre_nms_topk": 64, "mesh_data": 2, "mesh_model": 1},
    })
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    eng = InferenceEngine(cfg, params=params)
    assert eng.mesh is not None
    eng.warmup(batches=[2])
    step = eng.get_step(2, (96, 96))
    n_warm = step._cache_size()
    rng = np.random.default_rng(0)
    reqs = [InferenceRequest(client_id=i + 1, frame_id=i, timestamp=0,
                             width=96, height=64,
                             data=rng.integers(0, 256, (64, 96, 3),
                                               dtype=np.uint8))
            for i in range(2)]
    res = eng.infer_batch(reqs)
    assert len(res) == 2
    assert step._cache_size() == n_warm == 1  # ONE shared executable


def test_full_server_e2e_on_serving_mesh(tmp_path):
    """FULL DetectionServer on a tpu.mesh_data=4 serving mesh (VERDICT r2
    #4): sharded DeviceFrameCache + deferred ROI writes + batcher + UDP all
    together, gated against the single-device server on the SAME frames.
    Exactly the integration where slot rounding, bucket filtering and shw
    shardings could disagree."""
    import time as _time

    from zero_latency_yolo_tpu.config import ServerConfig
    from zero_latency_yolo_tpu.models import save_params
    from zero_latency_yolo_tpu.runtime.simulator import (
        SimClient, synthetic_frame)
    from test_server_e2e import ServerHarness

    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(2), spec, folded=True)
    path = str(tmp_path / "m.npz")
    save_params(params, path)

    def make_cfg(md, port):
        return ServerConfig.from_dict({
            "model_path": path, "port": port, "web_port": 0,
            "max_clients": 4, "worker_threads": 1,
            "confidence_threshold": 0.1,
            "network": {"timeout_ms": 120000},
            "detection": {"model_width": SIZE, "model_height": SIZE,
                          "enable_tracking": False},
            "tpu": {"variant": "yolov8p", "num_classes": 4,
                    "dtype": "float32", "pre_nms_topk": 64,
                    "batch_buckets": [4], "frame_buckets": [[96, 96]],
                    "batch_window_ms": 2.0, "mesh_data": md},
        })

    frames = {cid: synthetic_frame(96, 64, seed=cid) for cid in (1, 2)}
    regions = {cid: synthetic_frame(32, 16, seed=10 + cid) for cid in (1, 2)}
    collected = {}
    for name, md, port in (("mesh", 4, 27411), ("single", 1, 27413)):
        h = ServerHarness(make_cfg(md, port))
        server = h.start()
        clients = {}
        try:
            if name == "mesh":
                assert server.engine.mesh is not None
                # Slots round up to a multiple of the data axis.
                assert server.device_cache.num_slots % 4 == 0
            else:
                assert server.engine.mesh is None
            for cid in (1, 2):
                c = SimClient(("127.0.0.1", server.port),
                              screen_width=96, screen_height=64)
                c.connect()
                c.start_receiver()
                clients[cid] = c
            # Keyframes (raw RGB: byte-exact on both servers), then two ROI
            # deltas each — sequenced so cache state is deterministic.
            for cid, c in clients.items():
                c.send_raw_frame(frames[cid])
            for c in clients.values():
                assert c.wait_results(1, timeout=300)  # first = SPMD compile
            for step_i in (0, 1):
                for cid, c in clients.items():
                    c.send_roi_update(regions[cid], x=8 * (step_i + 1), y=8)
                for c in clients.values():
                    deadline = _time.monotonic() + 60
                    while (_time.monotonic() < deadline
                           and len(c.results) < 2 + step_i):
                        _time.sleep(0.05)
                    assert len(c.results) >= 2 + step_i
            collected[name] = {
                cid: {r.frame_id: [(d.x, d.y, d.width, d.height,
                                    d.confidence, d.class_id)
                                   for d in r.detections]
                      for r in c.results}
                for cid, c in clients.items()}
        finally:
            for c in clients.values():
                c.stop()
            h.stop()

    for cid in (1, 2):
        mesh_r, single_r = collected["mesh"][cid], collected["single"][cid]
        shared = set(mesh_r) & set(single_r)
        assert shared, "no common frame ids to compare"
        for fid in shared:
            assert len(mesh_r[fid]) == len(single_r[fid]), (cid, fid)
            for a, b in zip(mesh_r[fid], single_r[fid]):
                np.testing.assert_allclose(a[:5], b[:5], atol=1e-4)
                assert a[5] == b[5]


def test_floored_split_dispatch_on_serving_mesh(tmp_path):
    """Per-client accuracy floors compose with SPMD serving: a mixed batch
    splits into one dispatch per effective rung, each group count-buckets
    to a mesh-conforming bucket, and results match the single-device
    engine at the same rungs (review r5 coverage gap)."""
    from zero_latency_yolo_tpu.config import ServerConfig
    from zero_latency_yolo_tpu.models import save_params
    from zero_latency_yolo_tpu.runtime.engine import (
        InferenceEngine, InferenceRequest)

    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(3), spec, folded=True)
    path = str(tmp_path / "m.npz")
    save_params(params, path)

    def cfg(md):
        return ServerConfig.from_dict({
            "model_path": path,
            "confidence_threshold": 0.1,
            "detection": {"model_width": SIZE, "model_height": SIZE},
            "tpu": {"variant": "yolov8p", "num_classes": 4,
                    "dtype": "float32", "pre_nms_topk": 64,
                    "batch_buckets": [4, 8], "frame_buckets": [[96, 96]],
                    "serve_sizes": [SIZE, 32], "mesh_data": md},
        })

    single = InferenceEngine(cfg(1), params=params)
    meshed = InferenceEngine(cfg(4), params=params)
    assert meshed.mesh is not None
    single._serve_size = 32
    meshed._serve_size = 32

    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (8, 96, 96, 3), np.uint8)

    def reqs():
        out = []
        for i in range(8):
            r = InferenceRequest(client_id=i + 1, frame_id=i, timestamp=0,
                                 width=96, height=96, data=frames[i],
                                 min_size=SIZE if i < 4 else 0)
            out.append(r)
        return out

    try:
        r1 = single.infer_batch(reqs())
        r2 = meshed.infer_batch(reqs())
    finally:
        single._serve_size = SIZE
        meshed._serve_size = SIZE
    assert len(r1) == len(r2) == 8
    by1 = {r.client_id: r for r in r1}
    by2 = {r.client_id: r for r in r2}
    for cid in range(1, 9):
        a, b = by1[cid], by2[cid]
        # Floored clients served at the model rung, the rest at 32 — on
        # BOTH engines (the split happens per effective rung).
        expect = SIZE if cid <= 4 else 32
        assert a.serve_size == b.serve_size == expect, (cid, a.serve_size,
                                                        b.serve_size)
        assert len(a.detections) == len(b.detections)
        for da, db in zip(a.detections, b.detections):
            assert da.x == pytest.approx(db.x, abs=1e-5)
            assert da.class_id == db.class_id
