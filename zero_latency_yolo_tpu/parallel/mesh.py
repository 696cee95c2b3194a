"""Device-mesh and sharding helpers (jax.sharding / pjit).

The reference is a single-node CPU server with no collectives (SURVEY §2.8);
its TPU-native scaling axes are:

- **data ('data')**: the batch of concurrent client streams — the serving
  scale-out axis (SURVEY §5.7: scale batch, not sequence). Activations shard
  their leading batch dim here; gradients psum over it.
- **model ('model')**: conv output-channel sharding — tensor parallelism for
  a conv net. Kernels (H, W, I, O) shard O; the next layer's input-channel
  dim I shards to match, and XLA inserts the all-gathers/reduce-scatters on
  ICI. Useful for the larger family members (yolov8l/x) or very large batch.

Pipeline/sequence/expert parallelism are not meaningful for a small
single-pass conv detector (no layer-serial memory pressure, no sequence dim,
no experts) — by design this mesh exposes dp+tp, and the sharding rules keep
every collective on ICI.
"""

from __future__ import annotations

import re

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int = 1, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh. data*model must equal len(devices)."""
    explicit = devices is not None
    devices = list(devices if devices is not None else jax.devices())
    if data * model != len(devices):
        raise ValueError(
            f"mesh {data}x{model} != {len(devices)} devices")
    if not explicit:
        # Topology-aware grid: jax.devices() enumeration order does not
        # make consecutive devices ICI neighbors on real slices, and the
        # 'model' axis carries the collective-heavy tensor-parallel
        # traffic. mesh_utils picks an ICI-adjacent layout; fall back to
        # the naive reshape where it cannot (virtual CPU devices).
        try:
            from jax.experimental import mesh_utils
            arr = mesh_utils.create_device_mesh((data, model),
                                                devices=devices)
            return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
        except Exception as e:  # noqa: BLE001 — e.g. host-platform devices
            # Loud, not silent (review r5): on REAL multi-chip hardware a
            # mesh_utils failure degrades to a topology-naive grid that
            # puts the collective-heavy model axis off ICI — exactly the
            # layout this call exists to avoid. Expected (and harmless)
            # for virtual host-platform devices.
            import logging
            logging.getLogger("zlt.mesh").warning(
                "mesh_utils.create_device_mesh failed (%s: %s) — falling "
                "back to a topology-naive device grid (fine for virtual "
                "CPU devices; suboptimal collectives on a real slice)",
                type(e).__name__, e)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over 'data', replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


_HEAD_TIP = re.compile(r"/cv[23]/\d+/2/[wb]$")


def _leaf_spec(path: str, leaf, model_size: int) -> P:
    """Tensor-parallel spec for one parameter leaf.

    Conv kernels (H, W, I, O): shard O over 'model' when divisible.
    Biases (O,): shard over 'model' when divisible.
    BN vectors and scalars: replicated.
    The detect-head tip convs stay replicated (their O = 4*reg_max or nc is
    small and must be gathered for decode anyway).
    """
    shape = getattr(leaf, "shape", ())
    if model_size <= 1:
        return P()
    # Detect-head TIP convs (the final conv of each cv2/cv3 branch,
    # path .../cv{2,3}/<level>/2/{w,b}) stay replicated regardless of size:
    # their outputs feed the DFL/class decode, which needs the full channel
    # dim — sharding them would force an all-gather on the hot path. (The
    # size filter below caught the class tip only by accident; the box tip
    # is O=4*reg_max=64 and slipped through.)
    if _HEAD_TIP.search(path):
        return P()
    if path.endswith("/w") and len(shape) == 4 and shape[3] % model_size == 0:
        if shape[3] >= 4 * model_size:  # skip tiny channel counts
            return P(None, None, None, MODEL_AXIS)
        return P()
    if path.endswith("/b") and len(shape) == 1 and shape[0] % model_size == 0:
        if shape[0] >= 4 * model_size:
            return P(MODEL_AXIS)
        return P()
    return P()


def param_shardings(params: Dict[str, Any], mesh: Mesh):
    """NamedSharding pytree matching the param pytree (dp-replicated,
    tp-sharded on conv output channels)."""
    model_size = mesh.shape[MODEL_AXIS]

    def walk(node, path=""):
        if isinstance(node, dict):
            return {k: walk(v, path + k + "/") for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, path + str(i) + "/") for i, v in enumerate(node)]
        return NamedSharding(mesh, _leaf_spec(path[:-1], node, model_size))

    return walk(params)


def shard_params(params: Dict[str, Any], mesh: Mesh):
    """Place params on the mesh with tensor-parallel shardings."""
    shardings = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
