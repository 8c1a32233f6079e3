"""Single-image 3D detection: decode + top-k + NMS, fully on device.

Re-derivation of ref:lib/rpn_util.py:1416-1563 (`im_detect_3d`) as one jitted
function with static shapes: everything from the network forward through NMS
runs on the TPU; only the tiny [top_post, 14] detection table returns to host
(the reference round-trips 3000 boxes through numpy for its CUDA NMS).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import bbox_transform_inv, decode_bbox_3d
from ..ops.nms import nms

# detection table columns (matches ref aboxes layout :1550)
DET_COLS = ["x1", "y1", "x2", "y2", "score", "cls",
            "x3d", "y3d", "z3d", "w3d", "h3d", "l3d", "ry3d", "tracker"]


def make_detector(conf, rois: np.ndarray, model=None):
    """Build `detect(params, batch_stats, image, scale_factor) -> dets`.

    dets is a [nms_topN_post, 14] float32 array (DET_COLS); rows with
    score <= 0 are padding. `image` is [1, H, W, 3] preprocessed.
    """
    rois_c = jnp.asarray(rois[:, :5], jnp.float32)
    anchors_c = jnp.asarray(conf.anchors, jnp.float32)
    means_c = jnp.asarray(conf.bbox_means, jnp.float32).reshape(-1)
    stds_c = jnp.asarray(conf.bbox_stds, jnp.float32).reshape(-1)
    top_pre = int(min(conf.nms_topN_pre, rois.shape[0]))
    top_post = int(conf.nms_topN_post)
    nms_thres = float(conf.nms_thres)
    apply_fn = model.apply

    @jax.jit
    def detect(params, batch_stats, image, scale_factor):
        out = apply_fn({"params": params, "batch_stats": batch_stats},
                       image, train=False)
        prob = out["prob"][0].astype(jnp.float32)          # [N, C]
        bbox_2d = out["bbox_2d"][0].astype(jnp.float32)    # [N, 4]
        bbox_3d = out["bbox_3d"][0].astype(jnp.float32)    # [N, 7]

        scores = jnp.max(prob[:, 1:], axis=1)
        cls_pred = jnp.argmax(prob[:, 1:], axis=1) + 1

        # top-k pre-NMS (ref::1541-1544)
        top_scores, top_idx = jax.lax.top_k(scores, top_pre)
        rois_k = rois_c[top_idx]
        tracker = rois_k[:, 4].astype(jnp.int32)
        src3d = anchors_c[tracker][:, 4:9]

        coords_2d = bbox_transform_inv(rois_k[:, :4], bbox_2d[top_idx],
                                       means_c[0:4], stds_c[0:4])
        coords_3d = decode_bbox_3d(rois_k[:, :4], bbox_3d[top_idx], src3d,
                                   means_c, stds_c)
        # rescale image-plane quantities to the original resolution
        coords_2d = coords_2d / scale_factor
        coords_3d = coords_3d.at[:, 0:2].divide(scale_factor)

        keep = nms(coords_2d, top_scores, nms_thres, already_sorted=True)
        kept_scores = jnp.where(keep, top_scores, -1.0)

        # final top_post selection among kept boxes
        final_scores, fi = jax.lax.top_k(kept_scores, top_post)
        dets = jnp.concatenate([
            coords_2d[fi],
            final_scores[:, None],
            cls_pred[top_idx][fi][:, None].astype(jnp.float32),
            coords_3d[fi],
            tracker[fi][:, None].astype(jnp.float32),
        ], axis=1)
        return dets

    return detect
