"""Detection-loss and checkpoint/resume tests (single device, pico variant)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from zero_latency_yolo_tpu.models import forward_raw, get_spec, init_params
from zero_latency_yolo_tpu.train import (
    TrainState, detection_loss, init_train_state, make_train_step,
)
from zero_latency_yolo_tpu.train.checkpoint import CheckpointManager

SIZE = 64


@pytest.fixture(scope="module")
def setup():
    spec = get_spec("yolov8p", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=False)
    images = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (2, SIZE, SIZE, 3)), jnp.float32)
    targets = np.full((2, 4, 5), -1, np.float32)
    targets[:, 0] = [0, 0.5, 0.5, 0.25, 0.4]
    targets[0, 1] = [2, 0.2, 0.3, 0.1, 0.15]
    return spec, params, images, jnp.asarray(targets)


def test_loss_components_finite_and_positive(setup):
    spec, params, images, targets = setup
    outs = forward_raw(params, spec, images)
    loss, metrics = detection_loss(spec, outs, targets, (SIZE, SIZE))
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert float(metrics["num_pos"]) > 0
    for k in ("box", "cls", "dfl"):
        assert np.isfinite(float(metrics[k]))


def test_no_targets_means_no_positives(setup):
    spec, params, images, _ = setup
    outs = forward_raw(params, spec, images)
    empty = jnp.full((2, 4, 5), -1.0, jnp.float32)
    loss, metrics = detection_loss(spec, outs, empty, (SIZE, SIZE))
    assert float(metrics["num_pos"]) == 0 or float(metrics["num_pos"]) == 1.0
    assert np.isfinite(float(loss))


def _copy(params):
    # The train step donates its input state; give each test fresh buffers.
    return jax.tree.map(jnp.array, params)


def test_train_overfits_single_batch(setup):
    spec, params, images, targets = setup
    tx = optax.adam(1e-3)
    state = init_train_state(_copy(params), tx)
    step = make_train_step(spec, tx, (SIZE, SIZE), mesh=None)
    losses = []
    for _ in range(8):
        state, metrics = step(state, images, targets)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.9, losses


def test_checkpoint_roundtrip(tmp_path, setup):
    spec, params, images, targets = setup
    tx = optax.adam(1e-3)
    state = init_train_state(_copy(params), tx)
    step = make_train_step(spec, tx, (SIZE, SIZE), mesh=None)
    state, _ = step(state, images, targets)
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    saved_step = mgr.save(state)
    assert saved_step == 1
    template = init_train_state(params, tx)
    restored = mgr.restore(template)
    assert restored is not None
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Training continues from the restored state identically.
    s1, m1 = step(state, images, targets)
    s2, m2 = step(restored, images, targets)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)


def test_ema_tracks_params_and_checkpoints(tmp_path, setup):
    spec, params, images, targets = setup
    tx = optax.adam(1e-3)
    state = init_train_state(_copy(params), tx, ema=True)
    assert state.ema_params is not None
    step = make_train_step(spec, tx, (SIZE, SIZE), mesh=None, ema_decay=0.5)
    p0 = np.asarray(jax.tree.leaves(state.ema_params)[0]).copy()
    for _ in range(3):
        state, _ = step(state, images, targets)
    e = np.asarray(jax.tree.leaves(state.ema_params)[0])
    p = np.asarray(jax.tree.leaves(state.params)[0])
    # EMA moved from init toward live params, but is not equal to either.
    assert not np.allclose(e, p0)
    assert not np.allclose(e, p)
    # Round-trips through the checkpoint.
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    mgr.save(state)
    template = init_train_state(_copy(params), tx, ema=True)
    restored = mgr.restore(template)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.ema_params)[0]), e)


def test_checkpoint_retention(tmp_path, setup):
    spec, params, *_ = setup
    tx = optax.sgd(1e-3)
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    state = init_train_state(params, tx)
    for step_num in (1, 2, 3):
        state = TrainState(params=state.params, opt_state=state.opt_state,
                           step=jnp.asarray(step_num, jnp.int32))
        mgr.save(state)
    assert mgr.latest_step() == 3


def test_mosaic_batches_shapes_and_validity():
    """Mosaic: same image shape, doubled target capacity, boxes in-window,
    classes drawn from the source label set, hflip math consistent."""
    from zero_latency_yolo_tpu.train.loop import mosaic_batches, synthetic_batches

    b, size, m = 4, 64, 4
    it = mosaic_batches(synthetic_batches(b, size, max_boxes=m, seed=3),
                        prob=1.0, hflip=0.5, seed=7)
    for _ in range(3):
        images, targets = next(it)
        assert images.shape == (b, size, size, 3)
        assert targets.shape == (b, 2 * m, 5)
        valid = targets[..., 0] >= 0
        assert valid.any(), "mosaic produced no boxes at all"
        cls = targets[..., 0][valid]
        assert set(np.unique(cls)).issubset({0.0, 1.0, 2.0, 3.0})
        cx, cy, w, h = (targets[..., i][valid] for i in (1, 2, 3, 4))
        assert (w >= 0.01).all() and (h >= 0.01).all()
        # Clipped boxes stay inside the crop window.
        assert (cx - w / 2 >= -1e-6).all() and (cx + w / 2 <= 1 + 1e-6).all()
        assert (cy - h / 2 >= -1e-6).all() and (cy + h / 2 <= 1 + 1e-6).all()


def test_mosaic_passthrough_prob_zero():
    """prob=0: images pass through unchanged (up to hflip) with the doubled
    target padding."""
    from zero_latency_yolo_tpu.train.loop import mosaic_batches, synthetic_batches

    b, size, m = 2, 32, 3
    src = list(x for _, x in zip(range(8), synthetic_batches(b, size, m, seed=1)))
    it = mosaic_batches(iter(src), prob=0.0, hflip=0.0, seed=0)
    images, targets = next(it)
    pool = np.concatenate([s[0] for s in src[:4]])
    # Every passthrough image must be one of the pooled source images.
    for img in images:
        assert any(np.array_equal(img, p) for p in pool)
    assert targets.shape == (b, 2 * m, 5)


def test_crowded_batches_occlusion_aware_labels():
    from zero_latency_yolo_tpu.train.loop import crowded_batches
    it = crowded_batches(batch=4, size=64, seed=0)
    images, targets = next(it)
    assert images.shape == (4, 64, 64, 3) and targets.shape == (4, 12, 5)
    assert images.min() >= 0.0 and images.max() <= 1.0
    valid = targets[targets[:, :, 0] >= 0]
    assert len(valid) >= 4  # dense scenes keep several visible boxes
    # Boxes normalized and inside the image.
    assert (valid[:, 1:] >= 0).all() and (valid[:, 1:] <= 1).all()
    assert (valid[:, 0] < 4).all()
    # Scenes stay dense after occlusion dropping.
    total_valid = 0
    total_imgs = 0
    for _ in range(5):
        _, t = next(it)
        total_valid += int((t[:, :, 0] >= 0).sum())
        total_imgs += t.shape[0]
    assert total_valid / total_imgs >= 2.0
    # determinism per seed
    a = next(crowded_batches(2, 32, seed=7))
    b = next(crowded_batches(2, 32, seed=7))
    assert (a[0] == b[0]).all() and (a[1] == b[1]).all()


def test_npz_batches_undersized_shards_raise(tmp_path):
    import numpy as np
    from zero_latency_yolo_tpu.train.loop import npz_batches
    np.savez(tmp_path / "small.npz",
             images=np.zeros((2, 8, 8, 3), np.uint8),
             targets=np.full((2, 4, 5), -1.0, np.float32))
    it = npz_batches(str(tmp_path / "*.npz"), batch=64)
    import pytest
    with pytest.raises(ValueError, match="fewer than batch"):
        next(it)


def test_train_step_on_parametric_variant():
    """Custom-scaled variants train through the same stack (the width lever
    the serving ladder points at needs a trainable model behind it)."""
    spec = get_spec("yolov8-d0.33-w0.125-mc256", 4)
    params = init_params(jax.random.PRNGKey(0), spec, folded=False)
    tx = optax.adam(1e-3)
    state = init_train_state(params, tx)
    step = make_train_step(spec, tx, (SIZE, SIZE), dtype=jnp.float32)
    images = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (2, SIZE, SIZE, 3)),
        jnp.float32)
    targets = np.full((2, 4, 5), -1, np.float32)
    targets[:, 0] = [1, 0.5, 0.5, 0.3, 0.3]
    # The step donates its input state; snapshot params on host first.
    before = jax.tree.map(np.asarray, state.params)
    state2, metrics = step(state, images, jnp.asarray(targets))
    assert np.isfinite(float(metrics["loss"]))
    # Params actually moved.
    moved = jax.tree.map(lambda a, b: float(np.max(np.abs(a - np.asarray(b)))),
                         before, state2.params)
    assert max(jax.tree.leaves(moved)) > 0


def test_multiscale_training_round_robins_sizes():
    """Multi-scale training (the serve-ladder companion): one jitted step
    per size, deterministic round-robin, shared optimizer state."""
    from zero_latency_yolo_tpu.train.loop import train
    state = train(variant="yolov8p", num_classes=4, size=64, batch=2,
                  steps=4, lr=1e-3, multiscale=(64, 32), log_every=1)
    assert int(state.step) == 4


def test_multiscale_rejects_bad_size():
    from zero_latency_yolo_tpu.train.loop import train
    with pytest.raises(ValueError, match="multiple of 32"):
        train(variant="yolov8p", num_classes=4, batch=2, steps=1,
              multiscale=(64, 48))


def test_multiscale_rejects_npz_shards(tmp_path):
    import numpy as np
    from zero_latency_yolo_tpu.train.loop import train
    path = tmp_path / "shard.npz"
    np.savez(str(path), images=np.zeros((4, 32, 32, 3), np.uint8),
             targets=np.full((4, 2, 5), -1, np.float32))
    with pytest.raises(ValueError, match="multiscale"):
        train(variant="yolov8p", num_classes=4, batch=2, steps=1,
              data=str(path), multiscale=(64, 32))


def test_cosine_schedule_trains_and_decays():
    """--schedule cosine: warmup-cosine over the run. The optimizer state
    carries the schedule index, so training completes and the loss stays
    finite; an unknown schedule name raises."""
    from zero_latency_yolo_tpu.train.loop import train
    state = train(variant="yolov8p", num_classes=4, size=64, batch=2,
                  steps=4, lr=1e-3, schedule="cosine", warmup_steps=2,
                  log_every=1)
    assert int(state.step) == 4
    with pytest.raises(ValueError, match="schedule"):
        train(variant="yolov8p", num_classes=4, batch=2, steps=1,
              schedule="linear")


# ------------------------------------------------------------ distillation

def test_distill_loss_minimized_at_teacher_match(setup):
    from zero_latency_yolo_tpu.train import distill_loss
    spec, params, images, _ = setup
    outs = forward_raw(params, spec, images)
    kd_same, m_same = distill_loss(spec, outs, outs)
    # The box term is a proper KL: exactly 0 when student == teacher.
    assert abs(float(m_same["kd_box"])) < 1e-5
    perturbed = [o + 0.5 for o in outs]
    kd_diff, m_diff = distill_loss(spec, outs, perturbed)
    assert float(kd_diff) > float(kd_same)
    assert float(m_diff["kd_box"]) > 0


def test_distill_gradient_descends_toward_teacher(setup):
    """The KD gradient alone must pull the student toward the teacher: one
    plain SGD step on distill_loss strictly decreases it. (Inside the full
    train step the detection loss co-exists and, against a RANDOM teacher,
    legitimately pulls the other way — so the mechanism is tested in
    isolation here and the integration in the loop/mesh tests.)"""
    from zero_latency_yolo_tpu.train import distill_loss
    spec, params, images, _ = setup
    teacher = init_params(jax.random.PRNGKey(7), spec, folded=False)
    t_outs = forward_raw(teacher, spec, images)

    def kd_only(p):
        return distill_loss(spec, t_outs, forward_raw(p, spec, images))[0]

    k0, grads = jax.jit(jax.value_and_grad(kd_only))(params)
    stepped = jax.tree.map(lambda p, g: p - 1e-2 * g, params, grads)
    k1 = jax.jit(kd_only)(stepped)
    assert np.isfinite(float(k0)) and np.isfinite(float(k1))
    assert float(k1) < float(k0), (float(k0), float(k1))


def test_distill_step_leaves_teacher_untouched(setup):
    spec, params, images, targets = setup
    teacher = init_params(jax.random.PRNGKey(7), spec, folded=False)
    t_copy = jax.tree.map(jnp.array, teacher)
    tx = optax.adam(1e-3)
    state = init_train_state(_copy(params), tx)
    step = make_train_step(spec, tx, (SIZE, SIZE), mesh=None,
                           teacher_spec=spec)
    for _ in range(2):
        state, metrics = step(state, images, targets, teacher)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["kd_cls"]))
    assert np.isfinite(float(metrics["kd_box"]))
    # The teacher is never updated (and never donated) by the step.
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), teacher, t_copy)


def test_distill_train_loop_from_folded_artifact(tmp_path):
    """End-to-end --distill-from path: a folded serving artifact is loaded,
    its geometry introspected, and the loop trains with kd metrics."""
    from zero_latency_yolo_tpu.models.yolov8 import fold_batchnorm
    from zero_latency_yolo_tpu.models.weights import save_params
    from zero_latency_yolo_tpu.train.loop import train
    spec = get_spec("yolov8p", 4)
    teacher = fold_batchnorm(
        init_params(jax.random.PRNGKey(3), spec, folded=False))
    path = tmp_path / "teacher.npz"
    save_params(teacher, str(path))
    state = train(variant="yolov8p", num_classes=4, size=SIZE, batch=2,
                  steps=2, distill_from=str(path), log_every=1)
    assert int(state.step) == 2


def test_distill_teacher_geometry_mismatch_raises(tmp_path):
    from zero_latency_yolo_tpu.models.weights import save_params
    from zero_latency_yolo_tpu.train.loop import train
    spec2 = get_spec("yolov8p", 2)
    teacher = init_params(jax.random.PRNGKey(0), spec2, folded=True)
    path = tmp_path / "teacher_nc2.npz"
    save_params(teacher, str(path))
    with pytest.raises(ValueError, match="teacher"):
        train(variant="yolov8p", num_classes=4, size=SIZE, batch=2, steps=1,
              distill_from=str(path))


def test_distill_mesh_step_runs_spmd(setup):
    """Distilled SPMD step: teacher replicated over the (data, model) mesh,
    student sharded; one step executes with finite loss."""
    from zero_latency_yolo_tpu.parallel.mesh import make_mesh
    spec, params, _, _ = setup
    mesh = make_mesh(data=4, model=2)
    teacher = init_params(jax.random.PRNGKey(7), spec, folded=False)
    tx = optax.adam(1e-3)
    state = init_train_state(_copy(params), tx)
    step = make_train_step(spec, tx, (SIZE, SIZE), mesh=mesh,
                           teacher_spec=spec)
    state = step.shard_state(state)
    t_sharded = step.shard_teacher(teacher)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.uniform(0, 1, (4, SIZE, SIZE, 3)), jnp.float32)
    targets = np.full((4, 4, 5), -1, np.float32)
    targets[:, 0] = [1, 0.5, 0.5, 0.3, 0.3]
    state, metrics = step(state, images, jnp.asarray(targets), t_sharded)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["kd_cls"]))


def test_train_step_bench_cli_smoke():
    """scripts/train_step_bench.py emits one JSON line with a batch row."""
    import json
    import subprocess
    import sys
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "train_step_bench.py"),
         "--platform", "cpu", "--variant", "yolov8p", "--size", "32",
         "--batches", "1", "--pipeline", "2,4"],
        capture_output=True, text=True, timeout=420, cwd=root)
    assert out.returncode == 0, out.stderr[-2000:]
    doc = json.loads(out.stdout.strip().splitlines()[-1])
    assert doc["metric"] == "train_step"
    row = doc["rows"][0]
    assert row["batch"] == 1 and row["step_ms"] > 0
    assert np.isfinite(row["final_loss"])


def test_tal_assigner_trains_finite():
    """The opt-in TAL assigner path (make_train_step(assigner='tal')) was
    shipped without coverage: one step must produce finite loss/grads and
    positive matches, including a crowded pair of overlapping GTs (the
    post-conflict normalization case)."""
    import jax
    import numpy as np
    import optax

    from zero_latency_yolo_tpu.models.yolov8 import get_spec, init_params
    from zero_latency_yolo_tpu.train.step import (
        init_train_state, make_train_step)

    spec = get_spec("yolov8p", 4)
    params = init_params(3, spec, folded=False)
    state = init_train_state(params, optax.sgd(1e-3))
    step = make_train_step(spec, optax.sgd(1e-3), (64, 64), assigner="tal")
    images = np.random.default_rng(0).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32)
    targets = np.full((2, 4, 5), -1, np.float32)
    targets[:, 0] = [0, 0.5, 0.5, 0.3, 0.4]
    targets[:, 1] = [1, 0.55, 0.5, 0.3, 0.4]  # overlapping second GT
    state, metrics = step(state, images, targets)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["num_pos"]) > 0
    leaves = jax.tree.leaves(state.params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)


def test_photometric_batches_label_free_and_bounded():
    """Photometric augmentation: targets pass through untouched, pixels are
    perturbed but stay in [0,1], and the stream is deterministic per seed."""
    from zero_latency_yolo_tpu.train.loop import (photometric_batches,
                                                  synthetic_batches)

    b, size = 4, 64
    src = list(x for _, x in zip(range(2), synthetic_batches(b, size, seed=9)))
    it = photometric_batches(iter(src), strength=1.0, seed=5)
    images, targets = next(it)
    np.testing.assert_array_equal(targets, src[0][1])
    assert not np.array_equal(images, src[0][0]), "no perturbation applied"
    assert images.min() >= 0.0 and images.max() <= 1.0
    assert images.dtype == np.float32
    # Deterministic per seed; different seed differs.
    again, _ = next(photometric_batches(iter(src), strength=1.0, seed=5))
    np.testing.assert_array_equal(images, again)
    other, _ = next(photometric_batches(iter(src), strength=1.0, seed=6))
    assert not np.array_equal(images, other)


def test_clutter_batches_labels_safe():
    """Clutter augmentation: targets pass through untouched, distractors
    never bury a labeled box (rejection keeps overlap <=20% of the box,
    stripes are thin), deterministic per seed."""
    from zero_latency_yolo_tpu.train.loop import (clutter_batches,
                                                  synthetic_batches)

    b, size = 4, 96
    src = list(x for _, x in zip(range(2), synthetic_batches(b, size, seed=2)))
    images, targets = next(clutter_batches(iter(src), strength=1.0, seed=4))
    np.testing.assert_array_equal(targets, src[0][1])
    assert not np.array_equal(images, src[0][0])
    assert images.min() >= 0.0 and images.max() <= 1.0
    again, _ = next(clutter_batches(iter(src), strength=1.0, seed=4))
    np.testing.assert_array_equal(images, again)
    # Label safety holds CUMULATIVELY and across seeds (ADVICE r4: the
    # per-rect 20% check at one seed let several rects bury a box
    # piecewise): over many seeds, rect-painted coverage of every labeled
    # box stays within the 20% budget plus stripe/rounding slack.
    orig = src[0][0]
    for seed in range(8):
        imgs, tg = next(clutter_batches(iter(src), strength=1.0, seed=seed))
        for i in range(b):
            for t in tg[i]:
                if t[0] < 0:
                    continue
                x0 = int((t[1] - t[3] / 2) * size)
                x1 = max(int((t[1] + t[3] / 2) * size), x0 + 1)
                y0 = int((t[2] - t[4] / 2) * size)
                y1 = max(int((t[2] + t[4] / 2) * size), y0 + 1)
                changed = (imgs[i, y0:y1, x0:x1]
                           != orig[i, y0:y1, x0:x1]).any(axis=-1).mean()
                assert changed <= 0.35, (seed, i, changed)


def test_resume_without_ema_from_ema_checkpoint(tmp_path, setup):
    """Resuming WITHOUT --ema from a checkpoint saved WITH it must restore
    cleanly and DISCARD the file's EMA (review r5: the orbax path only
    handled the opposite mismatch direction and re-raised; carrying the
    EMA would silently re-enable tracking the user turned off)."""
    spec, params, *_ = setup
    tx = optax.adam(1e-3)
    state = init_train_state(_copy(params), tx, ema=True)
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    mgr.save(state)
    template = init_train_state(_copy(params), tx, ema=False)
    restored = mgr.restore(template)
    assert restored is not None
    assert restored.ema_params is None
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]))
