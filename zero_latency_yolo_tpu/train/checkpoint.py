"""Training checkpoint / resume (orbax-backed, npz fallback).

The reference has no training and therefore no checkpointing; its closest
mechanism is the model hot-swap watcher (SURVEY §5.4). This module gives the
training side real checkpoint/resume: params + optimizer state + step are
saved atomically, with retention, and restore reproduces the exact TrainState.

Orbax is used when available (async-friendly, atomic renames); otherwise a
plain npz fallback keeps the feature alive in minimal images.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

import jax
import numpy as np

from ..models.weights import flatten, unflatten
from ..utils.logging import get_logger
from .step import TrainState

log = get_logger("checkpoint")

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3) -> None:
        self.directory = os.path.abspath(directory)
        self.max_to_keep = max_to_keep
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = None
        if _HAVE_ORBAX:
            try:
                self._mgr = ocp.CheckpointManager(
                    self.directory,
                    options=ocp.CheckpointManagerOptions(
                        max_to_keep=max_to_keep, create=True))
            except Exception:  # noqa: BLE001
                log.exception("orbax init failed; using npz fallback")
                self._mgr = None

    # ------------------------------------------------------------------ save
    def save(self, state: TrainState) -> int:
        step = int(state.step)
        if self._mgr is not None:
            payload = {"params": state.params,
                       "opt_state": state.opt_state,
                       "step": state.step}
            if state.ema_params is not None:
                payload["ema_params"] = state.ema_params
            self._mgr.save(step, args=ocp.args.StandardSave(payload))
            self._mgr.wait_until_finished()
            return step
        return self._save_npz(state, step)

    def _save_npz(self, state: TrainState, step: int) -> int:
        path = os.path.join(self.directory, f"ckpt_{step:08d}")
        tmp = path + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        np.savez(os.path.join(tmp, "params.npz"),
                 **flatten(jax.tree.map(np.asarray, state.params)))
        if state.ema_params is not None:
            np.savez(os.path.join(tmp, "ema.npz"),
                     **flatten(jax.tree.map(np.asarray, state.ema_params)))
        opt_leaves, opt_tree = jax.tree.flatten(state.opt_state)
        np.savez(os.path.join(tmp, "opt.npz"),
                 **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(opt_leaves)})
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump({"step": step}, f)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
        self._gc_npz()
        return step

    def _gc_npz(self) -> None:
        ckpts = sorted(d for d in os.listdir(self.directory)
                       if d.startswith("ckpt_") and not d.endswith(".tmp"))
        for d in ckpts[:-self.max_to_keep]:
            shutil.rmtree(os.path.join(self.directory, d))

    # --------------------------------------------------------------- restore
    def latest_step(self) -> Optional[int]:
        if self._mgr is not None:
            return self._mgr.latest_step()
        ckpts = sorted(d for d in os.listdir(self.directory)
                       if d.startswith("ckpt_") and not d.endswith(".tmp"))
        return int(ckpts[-1].split("_")[1]) if ckpts else None

    def restore(self, template: TrainState,
                step: Optional[int] = None) -> Optional[TrainState]:
        """Restore into the structure of `template` (needed to rebuild the
        optimizer pytree). Returns None when no checkpoint exists."""
        target = step if step is not None else self.latest_step()
        if target is None:
            return None
        if self._mgr is not None:
            tpl = {"params": template.params,
                   "opt_state": template.opt_state,
                   "step": template.step}
            if template.ema_params is not None:
                tpl["ema_params"] = template.ema_params
            try:
                restored = self._mgr.restore(
                    target, args=ocp.args.StandardRestore(tpl))
            except Exception:  # noqa: BLE001 — EMA-presence mismatch
                import logging
                if "ema_params" in tpl:
                    # Resuming WITH --ema from a checkpoint saved without
                    # it: restore the rest and seed the EMA from the
                    # restored params (the standard EMA init) instead of
                    # aborting.
                    del tpl["ema_params"]
                    restored = self._mgr.restore(
                        target, args=ocp.args.StandardRestore(tpl))
                    restored["ema_params"] = restored["params"]
                    logging.getLogger("zlt.train").warning(
                        "checkpoint %d has no EMA state; --ema resumes "
                        "with EMA seeded from the restored params", target)
                else:
                    # The opposite direction (review r5): resuming WITHOUT
                    # --ema from a checkpoint saved WITH it — orbax
                    # refuses the narrower template, so restore including
                    # the file's EMA and DISCARD it (exactly what the npz
                    # fallback does; carrying it would silently re-enable
                    # tracking the user turned off).
                    tpl["ema_params"] = template.params
                    restored = self._mgr.restore(
                        target, args=ocp.args.StandardRestore(tpl))
                    restored["ema_params"] = None
                    logging.getLogger("zlt.train").warning(
                        "checkpoint %d carries EMA state but this run has "
                        "no --ema; the file's EMA is discarded", target)
            ema = restored.get("ema_params")
            if ema is None and template.ema_params is not None:
                # JAX arrays are immutable: sharing leaves with params is a
                # correct EMA seed (updates build fresh trees).
                ema = restored["params"]
            return TrainState(params=restored["params"],
                              opt_state=restored["opt_state"],
                              step=restored["step"],
                              ema_params=ema)
        return self._restore_npz(template, target)

    def _restore_npz(self, template: TrainState, step: int) -> TrainState:
        path = os.path.join(self.directory, f"ckpt_{step:08d}")
        with np.load(os.path.join(path, "params.npz")) as z:
            params = unflatten({k: z[k] for k in z.files})
        _, opt_tree = jax.tree.flatten(template.opt_state)
        with np.load(os.path.join(path, "opt.npz")) as z:
            leaves = [z[f"leaf_{i}"] for i in range(len(z.files))]
        opt_state = jax.tree.unflatten(opt_tree, leaves)
        ema = None
        ema_path = os.path.join(path, "ema.npz")
        if os.path.exists(ema_path):
            with np.load(ema_path) as z:
                ema = unflatten({k: z[k] for k in z.files})
            if template.ema_params is None:
                # The run did not request --ema: carrying the file's EMA
                # would silently re-enable tracking the user turned off.
                ema = None
        elif template.ema_params is not None:
            # --ema resume from a checkpoint saved without it: seed from
            # the restored params (standard EMA init) instead of silently
            # disabling the requested EMA for the whole continued run.
            ema = params
        import jax.numpy as jnp
        return TrainState(params=jax.tree.map(jnp.asarray, params),
                          opt_state=opt_state,
                          step=jnp.asarray(step, jnp.int32),
                          ema_params=(jax.tree.map(jnp.asarray, ema)
                                      if ema is not None else None))
