"""YOLO-convention directory dataset loader (train/data.py): letterbox
geometry matches the serving preprocess, labels remap exactly, the batch
iterator is seeded/shape-stable, and the train loop consumes a directory."""

import os

import cv2
import numpy as np
import pytest

from zero_latency_yolo_tpu.train.data import (
    find_pairs, letterbox_image, load_sample, load_yolo_dir, read_labels,
    yolo_dir_batches,
)

S = 64


def _write_dataset(root, n=6, flat=False):
    """n images, 80x40 (w>h), each with one centered 40x20 rectangle of a
    per-class color; image i has class i%4; image n-1 ships no label file
    (negative sample)."""
    img_dir = root if flat else os.path.join(root, "images")
    lbl_dir = root if flat else os.path.join(root, "labels")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    for i in range(n):
        img = np.zeros((40, 80, 3), np.uint8)
        img[:] = 60
        cls = i % 4
        color = [0, 0, 0]
        color[cls % 3] = 230
        img[10:30, 20:60] = color
        cv2.imwrite(os.path.join(img_dir, f"im{i}.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        if i < n - 1:
            with open(os.path.join(lbl_dir, f"im{i}.txt"), "w") as f:
                f.write(f"{cls} 0.5 0.5 0.5 0.5\n")
    return root


@pytest.fixture()
def dataset(tmp_path):
    return _write_dataset(str(tmp_path))


def test_find_pairs_and_negative(dataset):
    pairs = find_pairs(dataset)
    assert len(pairs) == 6
    assert all(p[1] is not None for p in pairs[:-1])
    assert pairs[-1][1] is None  # negative sample keeps its image


def test_find_pairs_flat_layout(tmp_path):
    root = _write_dataset(str(tmp_path), n=3, flat=True)
    pairs = find_pairs(root)
    assert len(pairs) == 3 and pairs[0][1].endswith("im0.txt")


def test_letterbox_geometry_matches_serving():
    # 80x40 into 64: scale = min(64/40, 64/80) = 0.8 -> 64x32, pad_y 16.
    img = np.full((40, 80, 3), 200, np.uint8)
    out, scale, pad_x, pad_y = letterbox_image(img, S)
    assert out.shape == (S, S, 3)
    assert scale == pytest.approx(0.8)
    assert (pad_x, pad_y) == (0, 16)
    # Serving-gray fill (ops/preprocess.FILL = 114/255).
    assert np.all(out[:16] == 114) and np.all(out[48:] == 114)
    assert np.all(out[16:48] == 200)


def test_load_sample_remaps_boxes_exactly(dataset):
    pairs = find_pairs(dataset)
    img, tgt = load_sample(*pairs[0], size=S, max_boxes=8, num_classes=4)
    # cx: (0.5*80*0.8 + 0)/64 = 0.5; cy: (0.5*40*0.8 + 16)/64 = 0.5
    # w: 0.5*80*0.8/64 = 0.5;    h: 0.5*40*0.8/64 = 0.25
    assert tgt[0] == pytest.approx([0, 0.5, 0.5, 0.5, 0.25], abs=1e-6)
    assert np.all(tgt[1:] == -1)
    # The labeled rectangle's pixels are where the remapped box says.
    y0, y1 = int((0.5 - 0.25 / 2) * S), int((0.5 + 0.25 / 2) * S)
    x0, x1 = int((0.5 - 0.5 / 2) * S), int((0.5 + 0.5 / 2) * S)
    assert img[(y0 + y1) // 2, (x0 + x1) // 2, 0] > 150  # class-0 red fill
    # Pad rows carry the SERVING letterbox fill (ops/preprocess.FILL gray),
    # not black: a fine-tune must see serving-time pad pixels.
    assert np.all(img[:16] == 114)


def test_negative_sample_all_padding(dataset):
    pairs = find_pairs(dataset)
    _, tgt = load_sample(*pairs[-1], size=S, max_boxes=4)
    assert np.all(tgt == -1)


def test_read_labels_rejects_malformed(tmp_path):
    p = str(tmp_path / "bad.txt")
    with open(p, "w") as f:
        f.write("0 0.5 0.5\n")
    with pytest.raises(ValueError, match="expected"):
        read_labels(p)
    with open(p, "w") as f:
        f.write("7 0.5 0.5 0.2 0.2\n")
    with pytest.raises(ValueError, match="class"):
        read_labels(p, num_classes=4)
    with open(p, "w") as f:
        f.write("1.5 0.5 0.5 0.2 0.2\n")  # fractional class id
    with pytest.raises(ValueError, match="integer"):
        read_labels(p)


def test_load_yolo_dir_shapes(dataset):
    images, targets = load_yolo_dir(dataset, S, max_boxes=8, num_classes=4)
    assert images.shape == (6, S, S, 3) and images.dtype == np.uint8
    assert targets.shape == (6, 8, 5)
    assert (targets[:, 0, 0] >= 0).sum() == 5  # one negative image


def test_batches_seeded_stable_and_cycling(dataset):
    def take(k, **kw):
        it = yolo_dir_batches(dataset, batch=4, size=S, max_boxes=8, **kw)
        return [next(it) for _ in range(k)]

    a = take(4, seed=3)
    b = take(4, seed=3)
    for (ia, ta), (ib, tb) in zip(a, b):
        assert ia.shape == (4, S, S, 3) and ia.dtype == np.float32
        assert 0.0 <= ia.min() and ia.max() <= 1.0
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ta, tb)
    # A different seed shuffles differently (4 batches span >1 epoch of 6).
    c = take(4, seed=4)
    assert any(not np.array_equal(x[0], y[0]) for x, y in zip(a, c))


def test_batches_nonresident_matches_resident(dataset):
    it_r = yolo_dir_batches(dataset, batch=4, size=S, max_boxes=8, seed=1)
    it_d = yolo_dir_batches(dataset, batch=4, size=S, max_boxes=8, seed=1,
                            cache_mb=0)
    for _ in range(3):
        (ir, tr), (id_, td) = next(it_r), next(it_d)
        np.testing.assert_array_equal(ir, id_)
        np.testing.assert_array_equal(tr, td)


def test_batch_larger_than_split_rejected(dataset):
    with pytest.raises(ValueError, match="fewer"):
        next(yolo_dir_batches(dataset, batch=64, size=S))


def test_train_loop_consumes_directory(dataset):
    from zero_latency_yolo_tpu.train.loop import train
    state = train(variant="yolov8p", num_classes=4, size=32, batch=4,
                  steps=2, lr=1e-3, data=dataset, max_boxes=8, log_every=1)
    assert int(state.step) == 2


def test_eval_consumes_directory(dataset):
    import jax
    from zero_latency_yolo_tpu.models import get_spec, init_params
    from zero_latency_yolo_tpu.train.eval import evaluate
    images, targets = load_yolo_dir(dataset, 32, max_boxes=8, num_classes=4)
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=True)
    m = evaluate(params, spec, images.astype(np.float32) / 255, targets,
                 batch=4)
    assert 0.0 <= m["mAP"] <= 1.0 and m["num_gt"] == 5


def test_coco_to_yolo_roundtrip(tmp_path):
    """COCO-format annotations convert to the YOLO layout this loader
    consumes: sparse category ids remap contiguously, boxes convert from
    absolute corner-format to normalized center-format exactly, crowd and
    degenerate boxes are skipped, and the converted split loads."""
    import json

    from zero_latency_yolo_tpu.train.data import coco_to_yolo

    src = tmp_path / "src"
    os.makedirs(src)
    img = np.zeros((40, 80, 3), np.uint8)
    cv2.imwrite(str(src / "a.png"), img)
    cv2.imwrite(str(src / "b.png"), img)
    coco = {
        "images": [
            {"id": 7, "file_name": "a.png", "width": 80, "height": 40},
            {"id": 9, "file_name": "b.png", "width": 80, "height": 40},
        ],
        # Sparse, unordered category ids -> contiguous {3: 0, 11: 1}.
        "categories": [{"id": 11, "name": "t"}, {"id": 3, "name": "head"}],
        "annotations": [
            # [x_min, y_min, w, h] absolute: center (40, 20), half-size box.
            {"image_id": 7, "category_id": 11, "bbox": [20, 10, 40, 20]},
            {"image_id": 7, "category_id": 3, "bbox": [0, 0, 8, 8],
             "iscrowd": 1},                     # skipped (crowd)
            {"image_id": 9, "category_id": 3, "bbox": [76, 36, 20, 20]},
            {"image_id": 9, "category_id": 3, "bbox": [-5, -5, 3, 3]},
        ],
    }
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(coco))
    out = tmp_path / "out"
    n, cat_map = coco_to_yolo(str(ann), str(src), str(out))
    assert n == 2 and cat_map == {3: 0, 11: 1}
    assert (out / "classes.txt").read_text().splitlines() == ["head", "t"]

    labels_a = read_labels(str(out / "labels" / "a.txt"), num_classes=2)
    np.testing.assert_allclose(labels_a, [[1, 0.5, 0.5, 0.5, 0.5]],
                               atol=1e-6)
    labels_b = read_labels(str(out / "labels" / "b.txt"), num_classes=2)
    # Clamped to the image: x in [76, 80], y in [36, 40].
    np.testing.assert_allclose(
        labels_b, [[0, 78 / 80, 38 / 40, 4 / 80, 4 / 40]], atol=1e-6)
    # The degenerate box vanished; the converted split loads end-to-end.
    images, targets = load_yolo_dir(str(out), 32, max_boxes=4, num_classes=2)
    assert images.shape == (2, 32, 32, 3)
    assert int((targets[..., 0] >= 0).sum()) == 2


def test_coco_to_yolo_missing_image_raises(tmp_path):
    import json

    from zero_latency_yolo_tpu.train.data import coco_to_yolo

    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps({
        "images": [{"id": 1, "file_name": "gone.png",
                    "width": 8, "height": 8}],
        "categories": [{"id": 1, "name": "x"}],
        "annotations": [],
    }))
    with pytest.raises(FileNotFoundError, match="gone.png"):
        coco_to_yolo(str(ann), str(tmp_path), str(tmp_path / "out"))


def test_coco_to_yolo_subdir_names_and_rerun(tmp_path):
    """Subdirectory file_names flatten without cross-linking; identical
    flattened names from DISTINCT paths are refused; reruns retarget stale
    symlinks instead of crashing or silently keeping old sources."""
    import json

    from zero_latency_yolo_tpu.train.data import coco_to_yolo

    src = tmp_path / "src"
    os.makedirs(src / "p1")
    os.makedirs(src / "p2")
    cv2.imwrite(str(src / "p1" / "a.png"), np.zeros((10, 10, 3), np.uint8))
    cv2.imwrite(str(src / "p2" / "a.png"),
                np.full((10, 10, 3), 200, np.uint8))
    coco = {
        "images": [
            {"id": 1, "file_name": "p1/a.png", "width": 10, "height": 10},
            {"id": 2, "file_name": "p2/a.png", "width": 10, "height": 10},
        ],
        "categories": [{"id": 1, "name": "x"}],
        "annotations": [
            {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10]},
        ],
    }
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(coco))
    out = tmp_path / "out"
    n, _ = coco_to_yolo(str(ann), str(src), str(out))
    assert n == 2
    # Both images exist independently (no basename cross-link) and the
    # labeled one is p1's.
    assert sorted(os.listdir(out / "images")) == ["p1_a.png", "p2_a.png"]
    assert read_labels(str(out / "labels" / "p1_a.txt")).shape == (1, 5)
    assert read_labels(str(out / "labels" / "p2_a.txt")).shape == (0, 5)

    # Rerun after the source moved: stale links retarget, no crash.
    src2 = tmp_path / "moved"
    os.rename(src, src2)
    n, _ = coco_to_yolo(str(ann), str(src2), str(out))
    assert n == 2
    img, _t = load_yolo_dir(str(out), 16, max_boxes=2, num_classes=1)
    assert img.shape[0] == 2  # links resolve again

    # Distinct paths flattening to one name are refused loudly.
    coco["images"].append({"id": 3, "file_name": "p1_a.png",
                           "width": 10, "height": 10})
    ann.write_text(json.dumps(coco))
    with pytest.raises(ValueError, match="both map to output"):
        coco_to_yolo(str(ann), str(src2), str(tmp_path / "out2"))
