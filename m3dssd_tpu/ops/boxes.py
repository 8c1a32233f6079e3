"""Device-side (jnp) box math — twins of `m3dssd_tpu.geometry`.

All functions are static-shape, mask-friendly, and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def bbox_transform_inv(rois, deltas, means=None, stds=None):
    """Decode whitened [dx,dy,dw,dh] against rois -> [..., 4] xyxy.

    rois [..., 4+] broadcastable against deltas [..., 4]
    (jnp twin of ref:lib/rpn_util.py:1188-1276).
    """
    w = rois[..., 2] - rois[..., 0] + 1.0
    h = rois[..., 3] - rois[..., 1] + 1.0
    cx = rois[..., 0] + 0.5 * w
    cy = rois[..., 1] + 0.5 * h

    dx, dy, dw, dh = (deltas[..., 0], deltas[..., 1],
                      deltas[..., 2], deltas[..., 3])
    if stds is not None:
        dx = dx * stds[0]; dy = dy * stds[1]; dw = dw * stds[2]; dh = dh * stds[3]
    if means is not None:
        dx = dx + means[0]; dy = dy + means[1]; dw = dw + means[2]; dh = dh + means[3]

    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = jnp.exp(dw) * w
    ph = jnp.exp(dh) * h
    return jnp.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                      pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1)


def decode_bbox_3d(rois, deltas_3d, anchors_3d, means, stds):
    """De-whiten and decode the 7 3D params against per-roi anchor priors.

    rois [..., 4+]; deltas_3d [..., 7] whitened (x,y,z,w,h,l,ry);
    anchors_3d [..., 5] = per-roi (z, w3, h3, l3, alpha) priors;
    means/stds [11] whitening stats (3D slots 4..10).
    Returns [..., 7] = (x2d, y2d, z, w3, h3, l3, alpha_decoded)
    (ref:lib/rpn_util.py:1462-1493).
    """
    d = deltas_3d * stds[4:11] + means[4:11]
    w = rois[..., 2] - rois[..., 0] + 1.0
    h = rois[..., 3] - rois[..., 1] + 1.0
    cx = rois[..., 0] + 0.5 * w
    cy = rois[..., 1] + 0.5 * h

    x2d = d[..., 0] * w + cx
    y2d = d[..., 1] * h + cy
    z = anchors_3d[..., 0] + d[..., 2]
    w3 = jnp.exp(d[..., 3]) * anchors_3d[..., 1]
    h3 = jnp.exp(d[..., 4]) * anchors_3d[..., 2]
    l3 = jnp.exp(d[..., 5]) * anchors_3d[..., 3]
    ry = anchors_3d[..., 4] + d[..., 6]
    return jnp.stack([x2d, y2d, z, w3, h3, l3, ry], axis=-1)


def iou_list(box_a, box_b, eps=1e-8):
    """Elementwise IoU of equal-shape box arrays [..., 4]."""
    mx = jnp.minimum(box_a[..., 2:4], box_b[..., 2:4])
    mn = jnp.maximum(box_a[..., 0:2], box_b[..., 0:2])
    wh = jnp.clip(mx - mn, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (box_a[..., 2] - box_a[..., 0]) * (box_a[..., 3] - box_a[..., 1])
    area_b = (box_b[..., 2] - box_b[..., 0]) * (box_b[..., 3] - box_b[..., 1])
    return inter / (area_a + area_b - inter + eps)


def iou_matrix(box_a, box_b):
    """Pairwise IoU: [M,4] x [N,4] -> [M,N] (no +1 convention,
    jnp twin of ref:lib/core.py:337-399)."""
    mx = jnp.minimum(box_a[:, None, 2:4], box_b[None, :, 2:4])
    mn = jnp.maximum(box_a[:, None, 0:2], box_b[None, :, 0:2])
    wh = jnp.clip(mx - mn, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (box_a[:, 2] - box_a[:, 0]) * (box_a[:, 3] - box_a[:, 1])
    area_b = (box_b[:, 2] - box_b[:, 0]) * (box_b[:, 3] - box_b[:, 1])
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def bbox_transform_inv_t(rois_t, deltas_t, means=None, stds=None):
    """Channel-major decode: rois_t [4+,N], deltas_t [...,4,N] -> [...,4,N].

    TPU-friendly twin of `bbox_transform_inv`: every operand keeps N on the
    lane dimension (a [N,4] layout pads 4 -> 128 lanes and multiplies HBM
    traffic ~32x; see PERF.md).
    """
    w = rois_t[2] - rois_t[0] + 1.0
    h = rois_t[3] - rois_t[1] + 1.0
    cx = rois_t[0] + 0.5 * w
    cy = rois_t[1] + 0.5 * h

    dx, dy, dw, dh = (deltas_t[..., 0, :], deltas_t[..., 1, :],
                      deltas_t[..., 2, :], deltas_t[..., 3, :])
    if stds is not None:
        dx = dx * stds[0]; dy = dy * stds[1]; dw = dw * stds[2]; dh = dh * stds[3]
    if means is not None:
        dx = dx + means[0]; dy = dy + means[1]; dw = dw + means[2]; dh = dh + means[3]

    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = jnp.exp(dw) * w
    ph = jnp.exp(dh) * h
    return jnp.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                      pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-2)


def decode_bbox_3d_t(rois_t, deltas_t, anchors3d_t, means, stds):
    """Channel-major 3D decode: rois_t [4+,N]; deltas_t [...,7,N] whitened;
    anchors3d_t [5,N] per-roi (z,w3,h3,l3,alpha) priors -> [...,7,N]."""
    d = deltas_t * stds[4:11, None] + means[4:11, None]
    w = rois_t[2] - rois_t[0] + 1.0
    h = rois_t[3] - rois_t[1] + 1.0
    cx = rois_t[0] + 0.5 * w
    cy = rois_t[1] + 0.5 * h

    x2d = d[..., 0, :] * w + cx
    y2d = d[..., 1, :] * h + cy
    z = anchors3d_t[0] + d[..., 2, :]
    w3 = jnp.exp(d[..., 3, :]) * anchors3d_t[1]
    h3 = jnp.exp(d[..., 4, :]) * anchors3d_t[2]
    l3 = jnp.exp(d[..., 5, :]) * anchors3d_t[3]
    ry = anchors3d_t[4] + d[..., 6, :]
    return jnp.stack([x2d, y2d, z, w3, h3, l3, ry], axis=-2)


def iou_list_t(a_t, b_t, eps=1e-8):
    """Elementwise IoU of channel-major box arrays [..., 4, N] -> [..., N]."""
    ix1 = jnp.maximum(a_t[..., 0, :], b_t[..., 0, :])
    iy1 = jnp.maximum(a_t[..., 1, :], b_t[..., 1, :])
    ix2 = jnp.minimum(a_t[..., 2, :], b_t[..., 2, :])
    iy2 = jnp.minimum(a_t[..., 3, :], b_t[..., 3, :])
    inter = jnp.clip(ix2 - ix1, 0, None) * jnp.clip(iy2 - iy1, 0, None)
    area_a = (a_t[..., 2, :] - a_t[..., 0, :]) * (a_t[..., 3, :] - a_t[..., 1, :])
    area_b = (b_t[..., 2, :] - b_t[..., 0, :]) * (b_t[..., 3, :] - b_t[..., 1, :])
    return inter / (area_a + area_b - inter + eps)


def convert_alpha_to_rot(alpha, z3d, x3d):
    """alpha -> rotY on the viewing ray (jnp twin of ref:lib/util.py:516-524).
    Wraps to (-pi, pi]."""
    ry = alpha + jnp.arctan2(-z3d, x3d) + 0.5 * jnp.pi
    return ry - jnp.round(ry / (2 * jnp.pi)) * 2 * jnp.pi


def backproject(p2_inv, x2d, y2d, z):
    """Back-project image points at depth z: returns [..., 4] camera coords.

    p2_inv [..., 4, 4] broadcastable against point arrays.
    """
    pts = jnp.stack([x2d * z, y2d * z, z, jnp.ones_like(z)], axis=-1)
    return jnp.einsum("...ij,...j->...i", p2_inv, pts)


def smooth_l1(pred, target):
    """Huber/smooth-L1 with beta=1 (torch F.smooth_l1_loss semantics)."""
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def masked_mean(x, mask, eps=1e-12):
    """sum(x*mask)/sum(mask) with a safe denominator."""
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), eps)
