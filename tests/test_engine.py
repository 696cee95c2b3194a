"""InferenceEngine real-compute tests (pico variant for fast CPU compiles)."""

import time

import jax
import numpy as np
import pytest

from zero_latency_yolo_tpu.config import ServerConfig
from zero_latency_yolo_tpu.models import get_spec, init_params, save_params
from zero_latency_yolo_tpu.ops.roi import DeviceFrameCache
from zero_latency_yolo_tpu.runtime.engine import (
    InferenceEngine, InferenceRequest, _pick_batch, _pick_bucket,
)


def _cfg(**over):
    base = {
        "model_path": "/nonexistent.npz",
        "confidence_threshold": 0.25,
        "detection": {"model_width": 64, "model_height": 64},
        "tpu": {"variant": "yolov8p", "num_classes": 4, "dtype": "float32",
                "batch_buckets": [1, 2, 4], "frame_buckets": [[96, 96]],
                "pre_nms_topk": 64},
    }
    base.update(over)
    return ServerConfig.from_dict(base)


@pytest.fixture(scope="module")
def engine():
    cfg = _cfg()
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    return InferenceEngine(cfg, params=params)


def _req(cid, fid, h=72, w=96, seed=0):
    rng = np.random.default_rng(seed)
    return InferenceRequest(
        client_id=cid, frame_id=fid, timestamp=1000 + fid, width=w, height=h,
        data=rng.integers(0, 256, (h, w, 3), dtype=np.uint8))


def test_bucket_selection():
    assert _pick_batch([1, 2, 4], 3) == 4
    assert _pick_batch([1, 2, 4], 5) == 4  # clamp to max
    assert _pick_bucket([(96, 96), (128, 256)], 100, 200) == (128, 256)
    assert _pick_bucket([(96, 96), (128, 256)], 50, 50) == (96, 96)
    # Oversized frames are rejected, never compiled (no per-shape program
    # mint on request-controlled dimensions).
    assert _pick_bucket([(96, 96), (128, 256)], 129, 50) is None
    assert _pick_bucket([(96, 96)], 96, 97) is None


def test_infer_batch_shapes_and_padding(engine):
    results = engine.infer_batch([_req(1, 1), _req(2, 2), _req(3, 3)])
    assert len(results) == 3
    for i, r in enumerate(results):
        assert r.client_id == i + 1 and r.frame_id == i + 1
        assert len(r.detections) <= 32
        for d in r.detections:
            assert 0 <= d.x <= 1 and 0 <= d.y <= 1
            assert 0 <= d.confidence
            assert d.timestamp == r.timestamp
    # One compiled program for the padded (4, 96, 96) bucket.
    assert len(engine._step_cache) == 1
    # Re-running the same sizes hits the cache.
    engine.infer_batch([_req(4, 4)])
    assert len(engine._step_cache) == 2  # batch bucket 1 compiles separately


def test_infer_deterministic(engine):
    r1 = engine.infer_batch([_req(1, 1, seed=7)])[0]
    r2 = engine.infer_batch([_req(1, 1, seed=7)])[0]
    assert len(r1.detections) == len(r2.detections)
    for a, b in zip(r1.detections, r2.detections):
        assert a.x == b.x and a.confidence == b.confidence


def test_device_cache_path_matches_host_path(engine):
    cache = DeviceFrameCache(num_slots=2, height=96, width=96)
    req = _req(5, 9, seed=3)
    assert cache.write_keyframe(5, req.data)
    frames, hs, ws = cache.gather([5])
    cached = engine.infer_batch_cached([req], frames, hs, ws)[0]
    hosted = engine.infer_batch([_req(5, 9, seed=3)])[0]
    assert len(cached.detections) == len(hosted.detections)
    for a, b in zip(cached.detections, hosted.detections):
        assert a.x == pytest.approx(b.x, abs=1e-6)
        assert a.class_id == b.class_id


def test_dispatch_cached_rejects_unbucketed_shapes(engine):
    """Programs are keyed by (batch bucket, frame bucket); the cached path
    trusts the caller's gather, so a request-driven shape must fail loudly
    instead of silently minting one XLA program per distinct N."""
    import numpy as np

    import jax.numpy as jnp
    bad_batch = jnp.zeros((3, 96, 96, 3), jnp.uint8)  # 3 not a batch bucket
    with pytest.raises(ValueError, match="compile-storm"):
        engine.dispatch_cached([_req(1, 1)] * 3, bad_batch,
                               np.array([64] * 3), np.array([96] * 3))
    bad_bucket = jnp.zeros((1, 64, 64, 3), jnp.uint8)  # not a frame bucket
    with pytest.raises(ValueError, match="compile-storm"):
        engine.dispatch_cached([_req(1, 1)], bad_bucket,
                               np.array([64]), np.array([64]))


def test_hot_reload(tmp_path):
    spec = get_spec("yolov8p", 4)
    p1 = init_params(jax.random.PRNGKey(1), spec, folded=True)
    p2 = init_params(jax.random.PRNGKey(2), spec, folded=True)
    path = tmp_path / "model.npz"
    save_params(p1, str(path))
    cfg = _cfg(model_path=str(path))
    eng = InferenceEngine(cfg)
    assert not eng.simulation
    h1 = eng._model_hash
    assert not eng.maybe_reload()  # unchanged
    save_params(p2, str(path))
    assert eng.maybe_reload()
    assert eng._model_hash != h1


def test_hot_reload_out_of_simulation(tmp_path):
    """A server started modelless must leave simulation mode when the model
    file is later deployed (regression: the dispatch simulation early-return
    used to starve _current_params, so the staged swap never applied)."""
    spec = get_spec("yolov8p", 4)
    path = tmp_path / "late.npz"
    cfg = _cfg(model_path=str(path))
    eng = InferenceEngine(cfg)
    assert eng.simulation
    save_params(init_params(jax.random.PRNGKey(3), spec, folded=True),
                str(path))
    assert eng.maybe_reload()
    out = eng.infer_batch([_req(1, 1, seed=5)])
    assert not eng.simulation  # flipped on the dispatch path
    assert len(out) == 1
    # Real compute now: deterministic across calls (simulation is random).
    again = eng.infer_batch([_req(1, 1, seed=5)])
    assert [d.x for d in out[0].detections] == [
        d.x for d in again[0].detections]


def test_staging_freelist_depth_tracks_inflight(engine):
    """Staging buffers must not be reused while their batch is in flight
    (regression: a fixed double-buffer corrupted inputs at max_inflight>2)."""
    reqs = [[_req(10 + i, i, seed=30 + i)] for i in range(3)]
    singles = [engine.infer_batch([_req(10 + i, i, seed=30 + i)])[0]
               for i in range(3)]
    pendings = [engine.dispatch(r) for r in reqs]  # 3 deep, none completed
    bufs = {id(p.staging_buf) for p in pendings}
    assert len(bufs) == 3  # distinct buffers while all are in flight
    key = pendings[0].staging_key
    results = engine.complete_many(pendings)
    # Buffers recycled after readback...
    assert len(engine._staging[key]) >= 3
    # ...and the deep-pipelined results match the single-dispatch ones.
    for got, want in zip(results, singles):
        assert [d.x for d in got[0].detections] == [
            d.x for d in want.detections]


def test_complete_many_pads_to_fixed_rows(engine):
    """Mixed batch buckets drain through ONE concat program keyed by drain
    count only (regression: the per-sequence concat shapes were
    request-driven programs)."""
    a = engine.dispatch([_req(1, 1, seed=40)])                # bucket 1
    b = engine.dispatch([_req(2, 2, seed=41), _req(3, 3, seed=42),
                         _req(4, 4, seed=43)])                # bucket 4
    res = engine.complete_many([a, b])
    assert len(res[0]) == 1 and len(res[1]) == 3
    assert set(engine._pad_cache) >= {(1, 4)}
    want = engine.infer_batch([_req(2, 2, seed=41), _req(3, 3, seed=42),
                               _req(4, 4, seed=43)])
    for got, exp in zip(res[1], want):
        assert [d.x for d in got.detections] == [d.x for d in exp.detections]


def test_simulation_mode_fallback():
    eng = InferenceEngine(_cfg(model_path="/no/such/file.onnx"), params=None)
    assert eng.simulation
    out = eng.infer_batch([_req(1, 1)])
    assert len(out) == 1
    assert all(0 <= d.x <= 1 for d in out[0].detections)


def test_int8_engine_path():
    cfg = _cfg()
    cfg.tpu.quantize_int8 = True
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    eng = InferenceEngine(cfg, params=params)
    out = eng.infer_batch([_req(1, 1, seed=11)])
    assert len(out) == 1
    for d in out[0].detections:
        assert 0 <= d.x <= 1 and d.confidence > 0
    # Backbone weights on device are int8.
    assert eng._params["m1"]["w_q"].dtype.name == "int8"


def test_engine_registry():
    from zero_latency_yolo_tpu.runtime.engine import (
        ENGINE_REGISTRY, SimulationEngine, create_engine, register_engine)
    # "onnx" (the reference config default) aliases the JAX engine.
    assert ENGINE_REGISTRY["onnx"] is InferenceEngine
    eng = create_engine(_cfg(inference_engine="simulation"))
    assert isinstance(eng, SimulationEngine) and eng.simulation
    out = eng.infer_batch([_req(1, 1)])
    assert len(out) == 1
    assert not eng.maybe_reload()  # sim engine never flips modes
    # Unknown names fall back to the default engine with a warning
    # (reference server/main.cpp:226-240); no model file => simulation.
    fallback = create_engine(_cfg(inference_engine="tensorrt"))
    assert type(fallback) is InferenceEngine

    @register_engine("custom-test")
    class Custom(SimulationEngine):
        pass

    assert isinstance(create_engine(_cfg(inference_engine="custom-test")),
                      Custom)
    del ENGINE_REGISTRY["custom-test"]


def test_status_map(engine):
    st = engine.status()
    assert st["engine"] == "jax-tpu"
    assert st["simulation"] == "false"
    assert int(st["inferences"]) > 0
    assert float(st["pipeline_avg_ms"]) > 0


def test_oversized_frames_shed_not_compiled(engine):
    engine.infer_batch([_req(1, 0)])  # ensure the (1, 96, 96) program exists
    programs_before = len(engine._step_cache)
    dropped_before = engine.frames_dropped.value
    results = engine.infer_batch([_req(1, 1), _req(2, 2, h=500, w=700)])
    assert len(results) == 1 and results[0].client_id == 1
    assert engine.frames_dropped.value == dropped_before + 1
    assert len(engine._step_cache) == programs_before  # no new program
    # All-oversized batch yields no results and no compile.
    assert engine.infer_batch([_req(3, 3, h=500, w=700)]) == []
    assert len(engine._step_cache) == programs_before


def test_s2d_stem_engine_matches_baseline():
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    base = InferenceEngine(_cfg(), params=params,
                           preprocess_mode="letterbox_mxu")
    cfg = _cfg()
    cfg.tpu.stem = "s2d"
    s2d = InferenceEngine(cfg, params=params, preprocess_mode="letterbox_mxu")
    req = _req(1, 1, seed=21)
    a = base.infer_batch([req])[0]
    b = s2d.infer_batch([_req(1, 1, seed=21)])[0]
    assert len(a.detections) == len(b.detections)
    for da, db in zip(a.detections, b.detections):
        assert da.class_id == db.class_id
        assert abs(da.x - db.x) < 1e-3 and abs(da.confidence - db.confidence) < 1e-3


def test_perlevel_select_engine_matches_baseline():
    """tpu.select="perlevel" + tpu.c2f="split" (the serving-layout pair that
    kills the full-anchor concat and the C2f slice/concat) must serve the
    same detections as the default concat path."""
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    base = InferenceEngine(_cfg(), params=params,
                           preprocess_mode="letterbox_mxu")
    cfg = _cfg()
    cfg.tpu.select = "perlevel"
    cfg.tpu.c2f = "split"
    pl = InferenceEngine(cfg, params=params, preprocess_mode="letterbox_mxu")
    for seed in (21, 22):
        a = base.infer_batch([_req(1, 1, seed=seed)])[0]
        b = pl.infer_batch([_req(1, 1, seed=seed)])[0]
        assert len(a.detections) == len(b.detections)
        for da, db in zip(a.detections, b.detections):
            assert da.class_id == db.class_id
            assert abs(da.x - db.x) < 1e-3
            assert abs(da.confidence - db.confidence) < 1e-3


def test_c2f_auto_resolution():
    """tpu.c2f="auto" maps each batch bucket to its measured winner (split at
    32 only — scripts/layout_compare.py); explicit values pass through. The
    table is keyed by the full measured serving config: unmeasured variants/
    sizes/dtypes never inherit the yolov8n@416/bf16 measurement."""
    from zero_latency_yolo_tpu.runtime.engine import resolve_c2f
    assert resolve_c2f("auto", 32) == "split"
    for b in (1, 2, 4, 8, 16, 64, 128):
        assert resolve_c2f("auto", b) == "slice"
    assert resolve_c2f("slice", 32) == "slice"
    assert resolve_c2f("split", 64) == "split"
    # Outside the measured config, auto stays on the default form everywhere.
    assert resolve_c2f("auto", 32, variant="yolov8s") == "slice"
    assert resolve_c2f("auto", 32, size=640) == "slice"
    assert resolve_c2f("auto", 32, dtype="float32") == "slice"
    assert resolve_c2f("split", 32, variant="yolov8s") == "split"  # explicit


def test_c2f_auto_engine_matches_forced_slice(monkeypatch):
    """An auto engine serving from a split-resolved bucket must produce the
    same detections as the forced-slice engine (the split rewrite is exact;
    this gates the auto WIRING, bucket→impl, not the math again)."""
    import zero_latency_yolo_tpu.runtime.engine as eng_mod
    monkeypatch.setattr(eng_mod, "C2F_AUTO_SPLIT",
                        {("yolov8p", 64, "float32"): frozenset({1})})
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    cfg_s = _cfg()
    cfg_s.tpu.c2f = "slice"
    base = InferenceEngine(cfg_s, params=params,
                           preprocess_mode="letterbox_mxu")
    cfg_a = _cfg()
    cfg_a.tpu.c2f = "auto"
    auto = InferenceEngine(cfg_a, params=params,
                           preprocess_mode="letterbox_mxu")
    a = base.infer_batch([_req(1, 1, seed=31)])[0]
    b = auto.infer_batch([_req(1, 1, seed=31)])[0]
    assert len(a.detections) == len(b.detections)
    for da, db in zip(a.detections, b.detections):
        assert da.class_id == db.class_id
        assert abs(da.x - db.x) < 1e-3
        assert abs(da.confidence - db.confidence) < 1e-3


def test_mixed_orientation_buckets_grouped_not_crashed():
    """Non-nested frame buckets (portrait+landscape): no single bucket covers
    a mixed batch — infer_batch groups by bucket; dispatch defends."""
    cfg = _cfg()
    cfg.tpu.frame_buckets = ((96, 64), (64, 96))
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    eng = InferenceEngine(cfg, params=params)
    res = eng.infer_batch([_req(1, 1, h=90, w=60), _req(2, 2, h=60, w=90)])
    assert [r.client_id for r in res] == [1, 2]  # both served, request order
    # Direct mixed dispatch doesn't crash: keeps the larger group, sheds rest.
    before = eng.frames_dropped.value
    pending = eng.dispatch([_req(1, 3, h=90, w=60), _req(2, 4, h=60, w=90),
                            _req(3, 5, h=60, w=90)])
    out = eng.complete(pending)
    assert len(out) == 2 and eng.frames_dropped.value == before + 1


def test_model_watcher_skips_unchanged_and_failed_files(tmp_path):
    """The 10s watcher must not re-hash (mtime+size sig) or re-parse (failed
    hash memo) a file that hasn't changed."""
    spec = get_spec("yolov8p", 4)
    path = tmp_path / "m.npz"
    save_params(init_params(jax.random.PRNGKey(0), spec, folded=True),
                str(path))
    eng = InferenceEngine(_cfg(model_path=str(path)))
    assert not eng.maybe_reload()
    sig = eng._file_sig
    assert sig is not None
    assert not eng.maybe_reload()  # second call: sig short-circuit
    # A bad file is parsed once, then skipped until it changes.
    path.write_bytes(b"NOT A MODEL")
    assert not eng.maybe_reload()
    assert eng._failed_hash is not None
    failed = eng._failed_hash
    assert not eng.maybe_reload()
    assert eng._failed_hash == failed


def test_warmup_precompiles_drain_programs():
    """With a deep inflight window, warmup must pre-compile the pad/concat
    drain programs so the first live drain doesn't stall the batcher."""
    cfg = _cfg()
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    eng = InferenceEngine(cfg, params=params)
    eng.warmup(batches=[1, 4], inflight=8)
    assert (1, 4) in eng._pad_cache  # pad program warmed
    # The concat for the steady drain count compiles without a live batch;
    # a drain of 7 (inflight-1) now hits the warmed program path.
    pendings = [eng.dispatch([_req(50 + i, i, seed=i)]) for i in range(3)]
    res = eng.complete_many(pendings)
    assert [len(r) for r in res] == [1, 1, 1]


def test_recycle_staging_on_failed_completion(engine):
    """A batch whose completion fails must still return its staging buffer
    to the free-list (one full-size host buffer leaked per failure
    otherwise — unbounded growth under a wedged device link)."""
    p = engine.dispatch([_req(1, 1, seed=50)])
    key = p.staging_key
    depth = len(engine._staging.get(key, []))
    assert p.staging_buf is not None
    engine.recycle_staging([p])
    assert p.staging_buf is None
    assert len(engine._staging[key]) == depth + 1
    # Idempotent: an already-recycled batch doesn't double-insert.
    engine.recycle_staging([p])
    assert len(engine._staging[key]) == depth + 1


def test_synthetic_step_mode_serializes_fake_steps():
    """tpu.synthetic_step_ms replaces device compute with a fixed-duration
    fake step so loadtests can measure the host path. Steps must serialize
    like the single real device lane (back-to-back dispatches queue), and
    complete() must block until the fake step 'finishes'."""
    import time as _time
    cfg = _cfg(tpu={"variant": "yolov8p", "num_classes": 4,
                    "batch_buckets": [1, 2, 4], "frame_buckets": [[96, 96]],
                    "synthetic_step_ms": 20.0})
    eng = InferenceEngine(cfg)
    assert eng.simulation and eng.warmed  # fake path, no device warmup
    t0 = _time.perf_counter()
    pendings = [eng.dispatch([_req(1, i)]) for i in range(3)]
    # Dispatch returns without sleeping (generous bound: a preempted
    # 1-core CI box must not flake this).
    dispatch_took = _time.perf_counter() - t0
    assert dispatch_took < 0.1
    # Fake steps serialize: each ready_at is one step after the previous
    # (exactly, when dispatches landed inside the previous step's window;
    # at most dispatch-gap later otherwise).
    gaps = [pendings[i + 1].ready_at - pendings[i].ready_at for i in range(2)]
    assert all(0.020 - 1e-6 <= g <= 0.020 + dispatch_took for g in gaps)
    res = eng.complete_many(pendings)
    elapsed = _time.perf_counter() - t0
    assert elapsed >= 0.058  # 3 serialized 20 ms steps
    assert [len(r) for r in res] == [1, 1, 1]
    assert eng.latency.snapshot()["p99_ms"] >= 20.0


def test_hot_swap_rejects_geometry_change(tmp_path):
    """A file with a different architecture must NOT stage into live jitted
    programs — rejected with the failed-hash memo, old model keeps serving."""
    spec = get_spec("yolov8p", 4)
    path = tmp_path / "model.npz"
    save_params(init_params(jax.random.PRNGKey(1), spec, folded=True),
                str(path))
    eng = InferenceEngine(_cfg(model_path=str(path)))
    assert not eng.simulation
    before = eng.infer_batch([_req(1, 1, seed=11)])[0]
    other = get_spec("yolov8p", 6)  # nc change = geometry change
    save_params(init_params(jax.random.PRNGKey(2), other, folded=True),
                str(path))
    assert not eng.maybe_reload()
    assert not eng.maybe_reload()  # failed-hash memo short-circuits
    after = eng.infer_batch([_req(1, 1, seed=11)])[0]
    assert [d.x for d in before.detections] == [d.x for d in after.detections]
    assert eng.spec.num_classes == 4


def test_hot_swap_out_of_simulation_adopts_geometry(tmp_path):
    """Modelless boot + a later file with a DIFFERENT variant/nc: simulation
    built no programs, so the engine adopts the file's own geometry."""
    path = tmp_path / "late.npz"
    cfg = _cfg(model_path=str(path))  # configured yolov8p/4
    eng = InferenceEngine(cfg)
    assert eng.simulation
    other = get_spec("yolov8p", 6)
    save_params(init_params(jax.random.PRNGKey(3), other, folded=True),
                str(path))
    assert eng.maybe_reload()
    out = eng.infer_batch([_req(1, 1, seed=5)])
    assert not eng.simulation
    assert eng.spec.num_classes == 6
    assert len(eng._class_weights) == 6
    assert len(out) == 1
