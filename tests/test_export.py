"""Deployment ONNX export (models/ultra.load_params_into_twin /
export_deployment_onnx): our trained params leave as a genuine
ultralytics-convention .onnx that round-trips bit-identically through the
import path and matches the JAX forward numerically."""

import jax
import numpy as np
import pytest

from zero_latency_yolo_tpu.models import get_spec, init_params
from zero_latency_yolo_tpu.models.weights import (
    flatten, from_onnx, load_model, load_params, save_params,
)
from zero_latency_yolo_tpu.models.yolov8 import fold_batchnorm, forward_decoded


def _noise(params, seed):
    """Perturb every leaf so no two tensors are value-identical: fresh-init
    folded biases are all-zero and the ONNX exporter deduplicates equal
    initializers (export_deployment_onnx refuses such degenerate weights)."""
    from zero_latency_yolo_tpu.models.weights import flatten, unflatten
    rng = np.random.default_rng(seed)
    return unflatten({k: np.asarray(v, np.float32) +
                      rng.normal(0, 0.05, np.shape(v)).astype(np.float32)
                      for k, v in flatten(params).items()})


def _folded_params(spec, seed=0):
    params = init_params(jax.random.PRNGKey(seed), spec, folded=False)
    return _noise(fold_batchnorm(params), seed + 100)


def test_roundtrip_bit_identical(tmp_path):
    from zero_latency_yolo_tpu.models.ultra import export_deployment_onnx
    spec = get_spec("yolov8p", 4)
    params = _folded_params(spec)
    path = str(tmp_path / "export.onnx")
    export_deployment_onnx(params, spec, path, 64)
    back = flatten(from_onnx(path))
    src = flatten(params)
    assert set(back) == set(src)
    for k in src:
        np.testing.assert_array_equal(
            back[k].astype(np.float32), np.asarray(src[k], np.float32),
            err_msg=k)


def test_unfolded_params_fold_on_export(tmp_path):
    from zero_latency_yolo_tpu.models.ultra import export_deployment_onnx
    spec = get_spec("yolov8p", 4)
    params = _noise(init_params(jax.random.PRNGKey(1), spec, folded=False), 9)
    path = str(tmp_path / "export_unfolded.onnx")
    export_deployment_onnx(params, spec, path, 64)
    back = flatten(from_onnx(path))
    want = flatten(fold_batchnorm(params))
    assert set(back) == set(want)
    for k in want:
        np.testing.assert_allclose(
            back[k].astype(np.float32), np.asarray(want[k], np.float32),
            atol=1e-6, err_msg=k)


def test_exported_twin_matches_jax_forward(tmp_path):
    """The torch twin built FROM our params (the export direction) decodes
    within the framework-wide 1e-3 parity gate of the JAX model."""
    from zero_latency_yolo_tpu.models.ultra import (
        UltralyticsTwin, decoded_reference, load_params_into_twin,
    )
    spec = get_spec("yolov8p", 4)
    params = _folded_params(spec, seed=2)
    twin = load_params_into_twin(UltralyticsTwin(spec), params)
    x = np.random.default_rng(4).uniform(0, 1, (1, 64, 64, 3)).astype(
        np.float32)
    want = decoded_reference(twin, x)
    got = np.asarray(forward_decoded(params, spec, x))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_exported_file_serves_via_load_model(tmp_path):
    from zero_latency_yolo_tpu.models.ultra import export_deployment_onnx
    spec = get_spec("yolov8p", 4)
    params = _folded_params(spec, seed=3)
    path = str(tmp_path / "serve.onnx")
    export_deployment_onnx(params, spec, path, 64)
    loaded, _, simulation = load_model(path, "yolov8p", 4)
    assert not simulation
    np.testing.assert_array_equal(np.asarray(loaded["m0"]["w"]),
                                  np.asarray(params["m0"]["w"]))


def test_wrong_spec_raises_with_shapes():
    from zero_latency_yolo_tpu.models.ultra import (
        UltralyticsTwin, load_params_into_twin,
    )
    spec = get_spec("yolov8p", 4)
    params = _folded_params(spec)
    wrong = get_spec("yolov8p", 7)  # num_classes mismatch
    with pytest.raises(ValueError, match="shape|source param"):
        load_params_into_twin(UltralyticsTwin(wrong), params)


def test_degenerate_weights_refused(tmp_path):
    """Fresh-init folded params carry identical all-zero biases; the
    exporter would deduplicate them into a partial initializer set — the
    library must refuse and clean up rather than write it."""
    import os
    from zero_latency_yolo_tpu.models.ultra import export_deployment_onnx
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(6), spec, folded=True)
    path = str(tmp_path / "degenerate.onnx")
    with pytest.raises(ValueError, match="dedup"):
        export_deployment_onnx(params, spec, path, 64)
    assert not os.path.exists(path)


def test_export_cli_roundtrip(tmp_path):
    import json
    import subprocess
    import sys
    spec = get_spec("yolov8p", 4)
    src = str(tmp_path / "src.npz")
    save_params(_folded_params(spec, seed=5), src)
    out = str(tmp_path / "cli.onnx")
    r = subprocess.run(
        [sys.executable, "scripts/export_onnx.py", "--weights", src,
         "--variant", "yolov8p", "--size", "64", "--out", out],
        capture_output=True, text=True, cwd=".",
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    line = json.loads(r.stdout.strip().splitlines()[-1])
    assert line["roundtrip_max_diff"] == 0.0
    assert load_params(src) is not None  # source untouched
