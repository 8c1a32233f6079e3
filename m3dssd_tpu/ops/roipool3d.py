"""RoI pooling of 3D points inside rotated 3D boxes.

TPU-native equivalent of the reference's PointRCNN-vendored CUDA/OpenMP
extension (ref:lib/utils/roipool3d/src/roipool3d_kernel.cu,
shim ref:lib/utils/roipool3d/roipool3d_utils.py). Unused by the main M3DSSD
path — provided for capability parity.

All functions are static-shape and jit-safe: membership is a mask; pooling
pads/truncates to `sampled_pts_num` like the CUDA kernel does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pts_in_boxes3d(pts, boxes3d, eps=1e-6):
    """Point-in-rotated-3D-box membership mask.

    pts [P,3] camera coords; boxes3d [B,7] = [x,y,z,h,w,l,ry] (y = bottom).
    Returns bool [B, P] (ref:roipool3d_kernel.cu pt_in_box3d logic).
    """
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    cx = boxes3d[:, 0][:, None]
    by = boxes3d[:, 1][:, None]
    cz = boxes3d[:, 2][:, None]
    h = boxes3d[:, 3][:, None]
    w = boxes3d[:, 4][:, None]
    l = boxes3d[:, 5][:, None]
    ry = boxes3d[:, 6][:, None]

    in_y = (y[None] <= by + eps) & (y[None] >= by - h - eps)
    # rotate into the box frame (yaw about camera Y)
    dx = x[None] - cx
    dz = z[None] - cz
    ca, sa = jnp.cos(ry), jnp.sin(ry)
    lx = ca * dx - sa * dz          # along box length
    lz = sa * dx + ca * dz          # along box width
    in_l = jnp.abs(lx) <= l / 2 + eps
    in_w = jnp.abs(lz) <= w / 2 + eps
    return in_y & in_l & in_w


@functools.partial(jax.jit, static_argnames=("sampled_pts_num",))
def roipool3d(pts, pts_feature, boxes3d, pool_extra_width=1.0,
              sampled_pts_num: int = 512):
    """Pool up to `sampled_pts_num` (xyz + features) per enlarged box.

    pts [P,3]; pts_feature [P,C]; boxes3d [B,7].
    Returns (pooled [B, S, 3+C], empty_flag [B]) matching
    ref:roipool3d_utils.py:roipool3d_gpu outputs.
    """
    enlarged = enlarge_box3d(boxes3d, pool_extra_width)
    mask = pts_in_boxes3d(pts, enlarged)             # [B, P]
    feat = jnp.concatenate([pts, pts_feature], axis=1)  # [P, 3+C]

    def pool_one(m):
        # stable order: member points first (by index), zeros after
        key = jnp.where(m, jnp.arange(m.shape[0]), m.shape[0] + 1)
        order = jnp.argsort(key)
        take = order[:sampled_pts_num]
        valid = m[take]
        out = feat[take] * valid[:, None]
        # CUDA kernel duplicates the first point when fewer than S members;
        # zero-padding here (documented deviation: simpler, mask available)
        return out, ~m.any()

    pooled, empty = jax.vmap(pool_one)(mask)
    return pooled, empty


def enlarge_box3d(boxes3d, extra_width=1.0):
    """Symmetrically enlarge boxes (ref:lib/utils/kitti_utils.py:150-162)."""
    out = boxes3d.at[:, 3:6].add(extra_width * 2)
    # bottom y moves down by extra_width so the enlargement is centered
    out = out.at[:, 1].add(extra_width)
    return out
