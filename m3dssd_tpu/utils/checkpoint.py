"""Checkpoint save/restore via orbax.

Re-derivation of the reference's checkpoint/resume capability
(ref:lib/core.py:803-838) with preemption-safe orbax checkpoints: model
params, BN stats and optimizer state are saved per eval epoch and restorable
by step. Partial/pretrained weight loading with key filtering mirrors
ref:lib/core.py:477-511.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


_ASYNC_CKPTR = None


def _async_ckptr():
    """Process-wide AsyncCheckpointer (owns a background write thread)."""
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_saves():
    """Block until all in-flight async checkpoint writes are durable."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(ckpt_dir: str, state, step: int,
                    async_save: bool = False):
    """Save {params, batch_stats, opt_state, step} at `ckpt_dir/step_N`.

    `async_save`: return once the device->host snapshot is taken and let the
    filesystem write proceed on a background thread, overlapping it with the
    next training steps (safe with donated state: orbax's D2H copy happens
    synchronously inside `save`). Call `wait_for_saves()` before relying on
    the files (end of run / before restore). Saves are serialized against
    any still-in-flight previous save.
    """
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    payload = {"params": state.params, "batch_stats": state.batch_stats,
               "opt_state": state.opt_state,
               "step": np.asarray(state.step)}
    if async_save:
        ckptr = _async_ckptr()
        ckptr.wait_until_finished()     # one save in flight at a time
        ckptr.save(path, payload, force=True)
    else:
        _ckptr().save(path, payload, force=True)
    logging.info("saved checkpoint %s%s", path,
                 " (async)" if async_save else "")
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_")[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, state, step: Optional[int] = None):
    """Restore a TrainState saved by `save_checkpoint`."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    template = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "step": np.asarray(state.step)}
    restored = _ckptr().restore(path, item=template)
    logging.info("restored checkpoint %s", path)
    return state.replace(params=restored["params"],
                         batch_stats=restored["batch_stats"],
                         opt_state=restored["opt_state"],
                         step=jax.numpy.asarray(restored["step"]))


def save_seed(ckpt_dir: str, params, batch_stats) -> str:
    """Save an optimizer-agnostic SEED checkpoint (params + BN stats only)
    at `ckpt_dir/seed` — the output format of scripts/fetch_pretrained.py.
    Unlike `save_checkpoint` it carries no opt_state, so any solver config
    can start from it (the reference's ImageNet bootstrap has the same
    shape: weights only, ref:model/pose_dla_dcn.py:399-415)."""
    path = os.path.join(os.path.abspath(ckpt_dir), "seed")
    _ckptr().save(path, {"params": params, "batch_stats": batch_stats},
                  force=True)
    logging.info("saved seed checkpoint %s", path)
    return path


def is_seed_checkpoint(ckpt_dir: str) -> bool:
    return os.path.isdir(os.path.join(ckpt_dir, "seed"))


def restore_seed(ckpt_dir: str, params, batch_stats):
    """Restore (params, batch_stats) from a seed checkpoint dir."""
    path = os.path.join(os.path.abspath(ckpt_dir), "seed")
    restored = _ckptr().restore(path, item={"params": params,
                                            "batch_stats": batch_stats})
    logging.info("restored seed checkpoint %s", path)
    return restored["params"], restored["batch_stats"]


def load_pretrained_params(params, src_params, filter_prefixes=None):
    """Partial weight loading: copy matching-name/shape leaves from
    src_params into params (ref:lib/core.py:477-511 semantics)."""
    flat_dst = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_src = dict(jax.tree_util.tree_flatten_with_path(src_params)[0])
    loaded, skipped = 0, []
    out = dict(flat_dst)
    for k, v in flat_dst.items():
        if k in flat_src and flat_src[k].shape == v.shape:
            if filter_prefixes and not any(
                    str(k).startswith(p) for p in filter_prefixes):
                continue
            out[k] = flat_src[k]
            loaded += 1
        else:
            skipped.append(jax.tree_util.keystr(k))
    logging.info("loaded %d tensors; %d unmatched", loaded, len(skipped))
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [out[k] for k, _ in
                  jax.tree_util.tree_flatten_with_path(params)[0]])
