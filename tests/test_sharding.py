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
