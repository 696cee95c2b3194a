"""scripts/flywheel.py: the capture -> fine-tune -> eval -> promote loop.

Mechanics-level coverage on the pico variant at size 64 (this box is one
CPU core): the deterministic holdout split, the same-variant fine-tune +
gated atomic promote, and the cross-variant (distillation) path refusing
the hot-swap promote (architecture changes need a fleet roll by design).
"""

import importlib.util
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "flywheel.py")


def _load_flywheel():
    spec = importlib.util.spec_from_file_location("flywheel", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def base_weights(tmp_path_factory):
    import jax
    from zero_latency_yolo_tpu.models.weights import save_params
    from zero_latency_yolo_tpu.models.yolov8 import get_spec, init_params
    p = tmp_path_factory.mktemp("w") / "base_pico.npz"
    spec = get_spec("yolov8p", 4)
    save_params(init_params(jax.random.PRNGKey(0), spec, folded=True), str(p))
    return str(p)


@pytest.fixture(scope="module")
def capture_dir(tmp_path_factory):
    """A tiny YOLO-convention dir shaped like runtime/capture.py's output:
    blob images + 'cls cx cy w h' label lines, capture-style stems."""
    import cv2
    root = tmp_path_factory.mktemp("cap")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(7)
    for i in range(24):
        img = np.zeros((64, 64, 3), np.uint8)
        cls = int(rng.integers(0, 4))
        w = h = 0.3
        cx, cy = float(rng.uniform(0.2, 0.8)), float(rng.uniform(0.2, 0.8))
        x0, y0 = int((cx - w / 2) * 64), int((cy - h / 2) * 64)
        img[y0:y0 + 19, x0:x0 + 19, cls % 3] = 230
        stem = f"zl{1000 + i}_c1_f{i}"
        cv2.imwrite(str(root / "images" / f"{stem}.jpg"), img)
        (root / "labels" / f"{stem}.txt").write_text(
            f"{cls} {cx:.4f} {cy:.4f} {w} {h}\n")
    return str(root)


def _run(args, timeout=900):
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run([sys.executable, SCRIPT, *args], capture_output=True,
                       text=True, env=env, cwd=REPO, timeout=timeout)
    out = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    return r, (json.loads(out[-1]) if out else None)


def test_split_deterministic_and_disjoint():
    fw = _load_flywheel()
    pairs = [(f"/x/images/zl{i}_c1_f{i}.jpg", f"/x/labels/zl{i}_c1_f{i}.txt")
             for i in range(200)]
    tr1, ho1 = fw._split_pairs(pairs, 0.25)
    tr2, ho2 = fw._split_pairs(list(reversed(pairs)), 0.25)
    assert set(tr1) | set(ho1) == set(pairs)
    assert not (set(tr1) & set(ho1))
    # Stable regardless of listing order, and stable under dataset growth:
    assert set(ho1) == set(ho2)
    tr3, ho3 = fw._split_pairs(pairs[:100], 0.25)
    assert set(ho3) <= set(ho1) and set(tr3) <= set(tr1)
    # The 1000-bucket hash split lands near the requested fraction.
    assert 0.10 <= len(ho1) / len(pairs) <= 0.40


def test_finetune_gate_and_promote(base_weights, capture_dir, tmp_path):
    out = tmp_path / "cand.npz"
    live = tmp_path / "serving" / "model.npz"
    live.parent.mkdir()
    live.write_bytes(open(base_weights, "rb").read())
    r, row = _run(["--capture-dir", capture_dir, "--base", base_weights,
                   "--out", str(out), "--steps", "2", "--batch", "2",
                   "--size", "64", "--no-distill", "--holdout-frac", "0.3",
                   "--allow-small-eval", "--min-gain", "-1",
                   "--promote", str(live)])
    assert r.returncode == 0, r.stderr[-3000:]
    assert row is not None and row["passed"] and row["promoted"]
    assert row["variant"] == "yolov8p" and row["mode"] == "finetune"
    assert row["train_images"] + row["eval"]["images"] == 24
    for side in ("base", "candidate"):
        assert set(row["eval"][side]) == {"mAP", "mAP50_95", "recall"}
    # Promote is a byte-faithful atomic copy of the candidate.
    assert out.exists()
    assert live.read_bytes() == out.read_bytes()
    assert not any(p.name.endswith(".flywheel.tmp")
                   for p in live.parent.iterdir())
    # No work dirs left behind next to the candidate.
    assert not [p for p in out.parent.iterdir() if p.name.startswith("flywheel-")]


def test_cross_variant_distills_and_refuses_hot_promote(
        base_weights, capture_dir, tmp_path):
    out = tmp_path / "student.npz"
    live = tmp_path / "model.npz"
    live.write_bytes(open(base_weights, "rb").read())
    before = live.read_bytes()
    r, row = _run(["--capture-dir", capture_dir, "--base", base_weights,
                   "--out", str(out), "--student-variant",
                   "yolov8-d0.17-w0.125-mc256", "--steps", "2", "--batch",
                   "2", "--size", "64", "--holdout-frac", "0.3",
                   "--allow-small-eval", "--min-gain", "-1",
                   "--promote", str(live)])
    assert r.returncode == 0, r.stderr[-3000:]
    assert row["mode"] == "distill" and row["passed"]
    assert not row["promoted"] and "roll" in row["note"]
    assert live.read_bytes() == before  # untouched
    # The student artifact is the requested architecture.
    from zero_latency_yolo_tpu.models.weights import (
        infer_spec_from_params, load_params)
    assert (infer_spec_from_params(load_params(str(out))).variant
            == "yolov8-d0.17-w0.125-mc256")


def test_refuses_unreliable_small_eval(base_weights, capture_dir, tmp_path):
    r, _ = _run(["--capture-dir", capture_dir, "--base", base_weights,
                 "--out", str(tmp_path / "c.npz"), "--steps", "1",
                 "--size", "64"])
    assert r.returncode != 0
    assert "unreliable" in (r.stderr + r.stdout)
