"""Train state, optimizer and the jitted train step.

TPU-native replacement for the reference's trainer plumbing
(ref:lib/core.py:49-102 optimizer construction, ref:scripts/train_rpn_3d.py
training loop body). The whole update — forward, loss, backward, optimizer,
BN running stats — is one jitted function; under a `jax.sharding.Mesh` the
same function is partitioned by GSPMD (batch over the 'data' axis, params
replicated) with gradient all-reduce riding ICI.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..losses.rpn_loss import RPNLossConfig, rpn_3d_loss
from .lr import make_lr_schedule


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def make_optimizer(conf, max_iter: int,
                   trainable_mask=None) -> optax.GradientTransformation:
    """SGD(momentum)+wd / Adam / Adamax with the reference's LR policy
    (ref:lib/core.py:77-99) and gradient accumulation via `batch_skip`
    (ref:lib/core.py:116, scripts/train_rpn_3d.py:216-218)."""
    sched = make_lr_schedule(conf, max_iter)
    solver = conf.solver_type.lower()
    clip = []
    if getattr(conf, "grad_clip_norm", None):
        clip = [optax.clip_by_global_norm(conf.grad_clip_norm)]
    if solver == "sgd":
        tx = optax.chain(
            *clip,
            optax.add_decayed_weights(conf.weight_decay),
            optax.sgd(sched, momentum=conf.momentum))
    elif solver == "adam":
        tx = optax.chain(*clip,
                         optax.add_decayed_weights(conf.weight_decay),
                         optax.adam(sched))
    elif solver == "adamax":
        tx = optax.chain(*clip,
                         optax.add_decayed_weights(conf.weight_decay),
                         optax.adamax(sched))
    else:
        raise ValueError(f"solver {conf.solver_type} not supported")
    if trainable_mask is not None:
        # frozen leaves get zero updates (optax.masked would pass the raw
        # gradient through for masked-out leaves)
        labels = jax.tree_util.tree_map(
            lambda m: "train" if m else "freeze", trainable_mask)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels)
    if getattr(conf, "batch_skip", 1) and conf.batch_skip > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=conf.batch_skip)
    return tx


def freeze_mask_fn(conf):
    """Trainable-mask from freeze_blacklist / freeze_whitelist
    (ref:lib/core.py:444-474). Returns None when nothing is frozen."""
    bl = conf.freeze_blacklist
    wl = conf.freeze_whitelist
    if not bl and not wl:
        return None

    def fn(path, _leaf):
        name = jax.tree_util.keystr(path)
        if bl and any(p in name for p in bl):
            return False
        if wl and not any(p in name for p in wl):
            return False
        return True

    return fn


def create_train_state(conf, model, rng, max_iter: int,
                       sample_input: Optional[np.ndarray] = None,
                       trainable_mask_fn=None) -> TrainState:
    """Initialize parameters and optimizer state.

    Init uses a small dummy input — parameter shapes are input-size
    independent, and this avoids compiling a full-resolution forward.
    """
    x = jnp.zeros((1, 64, 128, 3), jnp.float32) if sample_input is None \
        else jnp.asarray(sample_input)
    variables = model.init(rng, x, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if trainable_mask_fn is None:
        trainable_mask_fn = freeze_mask_fn(conf)
    mask = None
    if trainable_mask_fn is not None:
        mask = jax.tree_util.tree_map_with_path(trainable_mask_fn, params)
    tx = make_optimizer(conf, max_iter, trainable_mask=mask)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params),
                      tx=tx, apply_fn=model.apply)


def make_train_step(conf, rois: np.ndarray, packed_input: bool = False,
                    donate: bool = False):
    """Build the jitted `train_step(state, batch, rng) -> (state, stats)`.

    donate: donate the input `state` buffers to the call (the trainer does) —
    XLA aliases params/momentum/batch_stats in place instead of allocating a
    second copy of every buffer (~0.5 GB at dla102), freeing HBM headroom for
    bigger batches. Callers that reuse a state across calls (profiling loops)
    must keep the default.

    `rois`/anchors/whitening stats are closed-over constants (the reference
    keeps them as module buffers with device-migration hacks —
    ref:model/M3d_inference_align.py:62-64; under SPMD they are just arrays).

    packed_input: batch images arrive space-to-depth packed
    ([B, H/2, W/2, 4C], host-side relayout — data/loader.py pack_s2d).

    Layer freezing: frozen params get zero optimizer updates (make_optimizer)
    AND frozen layers' BatchNorm running stats are pinned — the reference
    puts frozen BN modules in `.eval()` so their running statistics stop
    drifting (ref:lib/core.py:462-473). The remaining (deliberate)
    difference: the reference's eval-mode BN also *normalizes by* the
    running stats in the frozen layers' train forward; here the forward
    keeps batch statistics (per-layer use_running_average would thread a
    path predicate through every flax module for a second-order effect).
    """
    loss_cfg = RPNLossConfig.from_conf(conf)
    rois_c = jnp.asarray(rois[:, :5], jnp.float32)
    anchors_c = jnp.asarray(conf.anchors, jnp.float32)
    means_c = jnp.asarray(conf.bbox_means, jnp.float32)
    stds_c = jnp.asarray(conf.bbox_stds, jnp.float32)
    bs_trainable = freeze_mask_fn(conf)   # path predicate, or None

    # on-device target assignment (pre_compute_target=False,
    # ref:lib/loss/rpn_3d.py:14-657 legacy path): the batch carries padded
    # gts (targets.build_gt_arrays) instead of dense [B,N] targets; the
    # assignment runs inside this jit and fuses with the step
    target_fn = None
    if not conf.pre_compute_target:
        from ..ops.targets_device import make_device_target_fn
        target_fn = make_device_target_fn(conf, rois, jit_wrap=False)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        if target_fn is not None:
            batch_t = dict(batch)
            batch_t.update(target_fn(
                batch["gt_boxes2d"], batch["gt_boxes3d"], batch["gt_cls"],
                batch["gt_valid"], batch["ign_boxes"], batch["ign_valid"]))
        else:
            batch_t = batch

        def loss_fn(params):
            outputs, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["images"], train=True, packed=packed_input,
                mutable=["batch_stats"])
            loss, stats = rpn_3d_loss(outputs, batch_t, rois_c, anchors_c,
                                      means_c, stds_c, loss_cfg, rng)
            return loss, (stats, mutated["batch_stats"])

        grads, (stats, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        if bs_trainable is not None:
            # frozen-layer BN running stats keep their old values (the
            # select happens at trace time — no runtime cost)
            new_bs = jax.tree_util.tree_map_with_path(
                lambda p, new, old: new if bs_trainable(p, new) else old,
                new_bs, state.batch_stats)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, stats

    return train_step


def make_eval_forward(conf):
    """Jitted eval forward: images -> model outputs (prob/bbox_2d/bbox_3d)."""
    @functools.partial(jax.jit, static_argnames=("apply_fn",))
    def forward(apply_fn, params, batch_stats, images):
        return apply_fn({"params": params, "batch_stats": batch_stats},
                        images, train=False)
    return forward
