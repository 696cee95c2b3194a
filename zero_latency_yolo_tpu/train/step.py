"""pjit training step: data-parallel batch + tensor-parallel conv channels.

The train step is one XLA program over the (data, model) mesh
(parallel/mesh.py): activations shard their batch dim over 'data', conv
kernels shard output channels over 'model'; gradients reduce over 'data' via
the psum XLA inserts from the sharding constraints. bf16 compute with f32
master weights/optimizer state.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.yolov8 import ModelSpec, forward_raw
from ..parallel.mesh import DATA_AXIS, param_shardings
from .loss import detection_loss, distill_loss

Params = Dict[str, Any]


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    params: Params
    opt_state: Any
    step: jnp.ndarray
    # Exponential moving average of params (None when EMA is off). Deployed
    # checkpoints should serve the EMA weights.
    ema_params: Any = None


def init_train_state(params: Params, tx: optax.GradientTransformation,
                     ema: bool = False) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32),
                      ema_params=jax.tree.map(jnp.array, params) if ema else None)


def make_train_step(spec: ModelSpec, tx: optax.GradientTransformation,
                    input_hw: Tuple[int, int],
                    mesh: Optional[Mesh] = None,
                    dtype=jnp.bfloat16,
                    remat: bool = False,
                    ema_decay: float = 0.9998,
                    assigner: str = "center",
                    teacher_spec: Optional[ModelSpec] = None,
                    distill_weight: float = 1.0,
                    distill_box_weight: float = 1.0,
                    distill_temp: float = 2.0) -> Callable:
    """Build the jitted train step.

    step(state, images (B,H,W,3) f32, targets (B,M,5)) -> (state, metrics)

    With teacher_spec set, the step distills: it takes a fourth argument
    (teacher params, folded or unfolded — forward_raw handles both) and
    adds distill_weight * distill_loss to the detection loss. The teacher
    forward runs inside the same XLA program under stop_gradient, so the
    whole distilled step is still ONE compiled program per shape.

    With a mesh, in/out shardings are annotated so the program runs SPMD:
    images/targets over 'data', params/opt state tensor-parallel over 'model'.
    remat=True rematerializes the backbone in the backward pass
    (jax.checkpoint) — trades FLOPs for activation memory so large batches /
    the bigger family members fit HBM.
    """

    def fwd(params, images):
        # accum_f32=False: the serving fast path's widened conv output dtype
        # has no transpose rule; training uses the autodiff-safe form.
        return forward_raw(params, spec, images, dtype=dtype, accum_f32=False)

    if remat:
        fwd = jax.checkpoint(
            fwd, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)

    def loss_fn(params, images, targets, teacher_outs):
        outs = fwd(params, images)
        loss, metrics = detection_loss(spec, outs, targets, input_hw,
                                       assigner=assigner)
        if teacher_outs is not None:
            kd, kd_metrics = distill_loss(spec, teacher_outs, outs,
                                          temp=distill_temp,
                                          w_box=distill_box_weight)
            loss = loss + distill_weight * kd
            metrics = dict(metrics, **kd_metrics)
        return loss, metrics

    def train_step(state: TrainState, images, targets, teacher_params=None):
        if teacher_spec is not None and teacher_params is None:
            # Fail at trace time with a REAL message — forward_raw(None)
            # otherwise dies deep in the conv stack.
            raise ValueError(
                "this train step was built with teacher_spec (distill "
                "mode): call it as step(state, images, targets, "
                "teacher_params)")
        teacher_outs = None
        if teacher_spec is not None:
            teacher_outs = [
                jax.lax.stop_gradient(o)
                for o in forward_raw(teacher_params, teacher_spec, images,
                                     dtype=dtype, accum_f32=False)]
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, images, targets,
                                   teacher_outs)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            # Ramped decay (ultralytics ModelEMA): effective decay grows
            # from 0 to ema_decay over ~2k steps, so short fine-tunes don't
            # leave the EMA dominated by the random init (observed: decay
            # 0.9998 flat over 2500 steps kept 61% init weight, mAP 0).
            t = state.step.astype(jnp.float32) + 1.0
            d = jnp.asarray(ema_decay, jnp.float32) * (1.0 - jnp.exp(-t / 2000.0))
            ema = jax.tree.map(lambda e, p: e * d + p.astype(e.dtype) * (1 - d),
                               ema, params)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, ema_params=ema)
        metrics = dict(metrics, loss=loss)
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    data_img = NamedSharding(mesh, P(DATA_AXIS, None, None, None))
    data_tgt = NamedSharding(mesh, P(DATA_AXIS, None, None))

    def shard_state(state: TrainState) -> TrainState:
        ps = param_shardings(state.params, mesh)
        params = jax.tree.map(jax.device_put, state.params, ps)
        # Optimizer-state sub-trees that mirror the param pytree (momentum /
        # mu / nu) inherit the param shardings leaf-for-leaf — a replicated
        # momentum against 'model'-sharded params would pay a gather/reshard
        # on every step. Everything else (counts, scalars) replicates.
        pstruct = jax.tree.structure(state.params)
        repl = NamedSharding(mesh, P())

        def is_param_like(node) -> bool:
            return jax.tree.structure(node) == pstruct

        def opt_shard(node):
            if is_param_like(node):
                return jax.tree.map(jax.device_put, node, ps)
            return jax.device_put(node, repl)

        opt_state = jax.tree.map(opt_shard, state.opt_state,
                                 is_leaf=is_param_like)
        ema = state.ema_params
        if ema is not None:
            ema = jax.tree.map(jax.device_put, ema, ps)
        return TrainState(params=params, opt_state=opt_state,
                          step=jax.device_put(state.step, NamedSharding(mesh, P())),
                          ema_params=ema)

    if teacher_spec is None:
        jitted = jax.jit(
            train_step,
            in_shardings=(None,  # state keeps its committed shardings
                          data_img, data_tgt),
            donate_argnums=(0,))
    else:
        # The teacher replicates over the mesh (it only runs forward, data
        # parallel); callers commit it once via shard_teacher.
        jitted = jax.jit(
            train_step,
            in_shardings=(None, data_img, data_tgt, None),
            donate_argnums=(0,))
        repl = NamedSharding(mesh, P())
        jitted.shard_teacher = lambda tp: jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), repl), tp)
    jitted.shard_state = shard_state  # convenience for callers
    return jitted
