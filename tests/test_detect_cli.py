"""Offline detect CLI (scripts/detect.py): images, dirs, videos -> JSON
lines + annotated copies + YOLO label files, via the deployed inference
path (letterbox -> forward_decoded -> class-weighted NMS)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "detect.py")


@pytest.fixture(scope="module")
def weights(tmp_path_factory):
    import jax
    from zero_latency_yolo_tpu.models.weights import save_params
    from zero_latency_yolo_tpu.models.yolov8 import get_spec, init_params
    p = tmp_path_factory.mktemp("w") / "pico.npz"
    spec = get_spec("yolov8p", 4)
    save_params(init_params(jax.random.PRNGKey(0), spec, folded=True), str(p))
    return str(p)


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp("media")
    imgs = root / "imgs"
    imgs.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        cv2.imwrite(str(imgs / f"im{i}.png"), arr)
    video = root / "clip.avi"
    vw = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"MJPG"),
                         10, (64, 48))
    assert vw.isOpened(), "cv2 VideoWriter MJPG unavailable"
    for i in range(6):
        vw.write(rng.integers(0, 256, (48, 64, 3), dtype=np.uint8))
    vw.release()
    return root


def _run(args):
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run([sys.executable, SCRIPT, *args], capture_output=True,
                       text=True, env=env, cwd=REPO, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    return [json.loads(line) for line in r.stdout.splitlines() if line]


def test_detect_images_dir(weights, media, tmp_path):
    save, labels = tmp_path / "ann", tmp_path / "lb"
    rows = _run(["--weights", weights, str(media / "imgs"),
                 "--size", "64", "--conf", "0.01", "--batch", "2",
                 "--save-dir", str(save), "--labels-dir", str(labels)])
    assert len(rows) == 3
    for row in rows:
        assert row["width"] == 64 and row["height"] == 48
        for d in row["detections"]:
            assert 0.0 <= d["cx"] <= 1.0 and 0.0 <= d["cy"] <= 1.0
            assert set(d) == {"class", "confidence", "cx", "cy", "w", "h"}
    # One annotated copy + one label file per image (labels may be empty).
    assert len(os.listdir(save)) == 3
    assert len(os.listdir(labels)) == 3


def test_detect_video_stride(weights, media):
    rows = _run(["--weights", weights, str(media / "clip.avi"),
                 "--size", "64", "--video-stride", "3"])
    assert [r["source"].split("#")[1] for r in rows] == ["frame0", "frame3"]


def test_detect_video_annotated_output(weights, media, tmp_path):
    """A video source with --save-dir writes ONE annotated video (processed
    frames only), not per-frame stills."""
    import cv2
    save = tmp_path / "ann"
    _run(["--weights", weights, str(media / "clip.avi"),
          "--size", "64", "--conf", "0.01", "--video-stride", "2",
          "--save-dir", str(save)])
    outs = os.listdir(save)
    assert len(outs) == 1 and outs[0].endswith("_annotated.avi")
    cap = cv2.VideoCapture(str(save / outs[0]))
    assert cap.isOpened()
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 3  # frames 0, 2, 4 of the 6-frame clip


def test_detect_rejects_bad_args(weights, media):
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, SCRIPT, "--weights", weights, "--size", "65",
         str(media / "imgs")], capture_output=True, text=True, env=env,
        timeout=120)
    assert r.returncode != 0 and "multiple of 32" in r.stderr


def test_detect_same_basename_different_dirs_no_collision(weights, tmp_path):
    """Same-named inputs from different directories must not overwrite each
    other's label/annotated files (stems derive from the full path)."""
    import cv2
    rng = np.random.default_rng(1)
    for d in ("a", "b"):
        (tmp_path / d).mkdir()
        arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        cv2.imwrite(str(tmp_path / d / "img.png"), arr)
    labels = tmp_path / "lb"
    rows = _run(["--weights", weights, str(tmp_path / "a"),
                 str(tmp_path / "b"), "--size", "64", "--conf", "0.01",
                 "--labels-dir", str(labels)])
    assert len(rows) == 2
    assert len(os.listdir(labels)) == 2  # one label file per input


def test_iter_frames_direct_unopenable_video_raises(tmp_path):
    """A directly-named undecodable video fails loudly (exit != 0), even
    when other inputs produced frames."""
    from zero_latency_yolo_tpu.runtime.media import iter_frames
    bad = tmp_path / "nope.mp4"
    bad.write_bytes(b"not a video")
    with pytest.raises(ValueError, match="cannot open video"):
        list(iter_frames([str(bad)]))
