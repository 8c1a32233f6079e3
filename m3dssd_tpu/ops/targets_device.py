"""On-device (jnp) anchor target assignment.

TPU-idiomatic equivalent of the reference's legacy on-the-fly target path
(`pre_compute_target=False`: ref:lib/loss/rpn_3d.py:14-657 computes targets
per batch on CPU via ref:lib/rpn_util.py:430-648). Here the full IoU matrix
and assignment run on device with static shapes: ground truths arrive as
padded, mask-validated arrays.

Inputs per image (padded to G_max):
    gt_boxes2d [G,4] xyxy; gt_boxes3d [G,11] (bbox_3d layout);
    gt_cls [G] int (1-based); gt_valid [G]; ign_boxes [G,4]; ign_valid [G].

Outputs match `m3dssd_tpu.targets.build_targets` semantics: labels (IGN_FLAG
sentinel), fg/bg/ign masks, whitened bbox_2d [N,4] / bbox_3d [N,7].
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

IGN_FLAG = 3000


def _iou_matrix(rois, gts, gt_valid):
    mx = jnp.minimum(rois[:, None, 2:4], gts[None, :, 2:4])
    mn = jnp.maximum(rois[:, None, 0:2], gts[None, :, 0:2])
    wh = jnp.clip(mx - mn, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_r = (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1])
    area_g = (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1])
    iou = inter / jnp.clip(area_r[:, None] + area_g[None, :] - inter,
                           1e-9, None)
    return jnp.where(gt_valid[None, :], iou, -1.0)


def _iou_ign(rois, igns, ign_valid):
    mx = jnp.minimum(rois[:, None, 2:4], igns[None, :, 2:4])
    mn = jnp.maximum(rois[:, None, 0:2], igns[None, :, 0:2])
    wh = jnp.clip(mx - mn, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_r = (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1])
    cov = inter / jnp.clip(area_r[:, None], 1e-9, None)
    return jnp.where(ign_valid[None, :], cov, -1.0)


def _encode(rois, anchors3d, gt2d, gt3d):
    """Per-roi regression targets against assigned gts.

    rois [N,4]; anchors3d [N,5]; gt2d [N,4]; gt3d [N,11] ->
    (t2d [N,4], t3d [N,7]). Same math as geometry.bbox_transform(_3d).
    """
    ew = rois[:, 2] - rois[:, 0] + 1.0
    eh = rois[:, 3] - rois[:, 1] + 1.0
    ecx = rois[:, 0] + 0.5 * (ew - 1)
    ecy = rois[:, 1] + 0.5 * (eh - 1)

    gw = gt2d[:, 2] - gt2d[:, 0] + 1.0
    gh = gt2d[:, 3] - gt2d[:, 1] + 1.0
    gcx = gt2d[:, 0] + 0.5 * (gw - 1.0)
    gcy = gt2d[:, 1] + 0.5 * (gh - 1.0)

    t2d = jnp.stack([(gcx - ecx) / ew, (gcy - ecy) / eh,
                     jnp.log(jnp.clip(gw / ew, 1e-9)),
                     jnp.log(jnp.clip(gh / eh, 1e-9))], axis=1)

    t3d = jnp.stack([
        (gt3d[:, 0] - ecx) / ew,
        (gt3d[:, 1] - ecy) / eh,
        gt3d[:, 2] - anchors3d[:, 0],
        jnp.log(jnp.clip(gt3d[:, 3] / anchors3d[:, 1], 1e-9)),
        jnp.log(jnp.clip(gt3d[:, 4] / anchors3d[:, 2], 1e-9)),
        jnp.log(jnp.clip(gt3d[:, 5] / anchors3d[:, 3], 1e-9)),
        gt3d[:, 6] - anchors3d[:, 4]], axis=1)
    return t2d, t3d


def compute_targets_device(rois, anchors, bbox_means, bbox_stds,
                           gt_boxes2d, gt_boxes3d, gt_cls, gt_valid,
                           ign_boxes, ign_valid, fg_thresh=0.5,
                           ign_thresh=0.5, bg_thresh_lo=0.0, bg_thresh_hi=0.5,
                           best_thresh=0.35) -> Dict[str, jnp.ndarray]:
    """Single-image assignment; vmap over the batch for [B,...] inputs.

    Returns the same dict keys as targets.build_targets (whitened targets).
    """
    rois = jnp.asarray(rois, jnp.float32)
    gt_valid = jnp.asarray(gt_valid).astype(bool)     # loader ships int8
    ign_valid = jnp.asarray(ign_valid).astype(bool)
    N = rois.shape[0]
    tracker = rois[:, 4].astype(jnp.int32)
    anchors3d = jnp.asarray(anchors, jnp.float32)[tracker][:, 4:9]
    means = jnp.asarray(bbox_means, jnp.float32).reshape(-1)
    stds = jnp.asarray(bbox_stds, jnp.float32).reshape(-1)

    iou = _iou_matrix(rois[:, :4], gt_boxes2d, gt_valid)        # [N,G]
    ols_max = jnp.max(iou, axis=1)
    assign = jnp.argmax(iou, axis=1)

    # best-anchor-per-gt forcing (ref:lib/rpn_util.py:469-478)
    gt_best_roi = jnp.argmax(iou, axis=0)                       # [G]
    gt_best_ols = jnp.max(iou, axis=0)
    force = gt_valid & (gt_best_ols >= best_thresh)
    fg = ols_max >= fg_thresh
    fg = fg | jnp.zeros(N, bool).at[gt_best_roi].max(force)
    # forced rois adopt their forcing gt; ties resolved to the argmax gt like
    # the reference (targets come from argmax over gts)
    has_gt = gt_valid.any()
    fg = fg & has_gt

    cov_ign = jnp.max(_iou_ign(rois[:, :4], ign_boxes, ign_valid), axis=1)
    ign = (cov_ign >= ign_thresh) & ~fg
    bg = (ols_max >= bg_thresh_lo) & (ols_max < bg_thresh_hi) & ~ign & ~fg
    # with no valid gts at all: everything bg (ref:lib/rpn_util.py:526-529)
    bg = jnp.where(has_gt | ign_valid.any(), bg, jnp.ones(N, bool) & ~ign)
    # anchors that are none of fg/bg become ignore-labelled
    ign_label = ~(fg | bg)

    g2 = gt_boxes2d[assign]
    g3 = gt_boxes3d[assign]
    t2d, t3d = _encode(rois[:, :4], anchors3d, g2, g3)
    t2d = (t2d - means[0:4]) / stds[0:4]
    t3d = (t3d - means[4:11]) / stds[4:11]
    fgf = fg[:, None]
    t2d = jnp.where(fgf, t2d, 0.0)
    t3d = jnp.where(fgf, t3d, 0.0)

    labels = jnp.where(fg, gt_cls[assign].astype(jnp.int32), 0)
    labels = jnp.where(ign_label, IGN_FLAG, labels)

    return {
        "labels": labels,
        "labels_fg": fg.astype(jnp.int8),
        "labels_bg": bg.astype(jnp.int8),
        "labels_ign": ign_label.astype(jnp.int8),
        # channel-major [P, N] to match the loss's batch contract
        "bbox_2d": t2d.T,
        "bbox_3d": t3d.T,
        "any_val": has_gt.astype(jnp.int32),
    }


def make_device_target_fn(conf, rois, jit_wrap: bool = True):
    """Batched target-assignment closure for the train step.

    `jit_wrap=False` returns the raw (traceable) function for inlining into
    an enclosing jit — the production train step
    (train/state.py:make_train_step under `pre_compute_target=False`) calls
    it inside the jitted update, so assignment fuses with the step and only
    the padded gts (targets.build_gt_arrays) travel host->device.
    """
    import numpy as np

    kw = dict(fg_thresh=conf.fg_thresh, ign_thresh=conf.ign_thresh,
              bg_thresh_lo=conf.bg_thresh_lo, bg_thresh_hi=conf.bg_thresh_hi,
              best_thresh=conf.best_thresh)
    rois_c = jnp.asarray(np.asarray(rois), jnp.float32)
    anchors_c = jnp.asarray(np.asarray(conf.anchors), jnp.float32)
    means_c = jnp.asarray(np.asarray(conf.bbox_means), jnp.float32)
    stds_c = jnp.asarray(np.asarray(conf.bbox_stds), jnp.float32)

    def fn(gt_boxes2d, gt_boxes3d, gt_cls, gt_valid, ign_boxes, ign_valid):
        return jax.vmap(lambda a, b, c, d, e, f: compute_targets_device(
            rois_c, anchors_c, means_c, stds_c, a, b, c, d, e, f, **kw))(
            gt_boxes2d, gt_boxes3d, gt_cls, gt_valid, ign_boxes, ign_valid)

    return jax.jit(fn) if jit_wrap else fn
