"""Deformable position-sensitive RoI pooling (DCNv2Pooling).

TPU-native equivalent of ref:model/DCNv2/src/cuda/dcn_v2_psroi_pooling_cuda.cu
(shim ref:model/DCNv2/dcn_v2.py:73-171). Built and exposed by the reference
but unused by the M3DSSD graph — provided for API-surface parity.

Semantics: each RoI is divided into pooled_size^2 bins; each bin averages
`sample_per_part^2` bilinear samples from its (optionally offset) position,
reading from the channel group corresponding to the bin (position-sensitive).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .dcn import bilinear_sample


@functools.partial(jax.jit, static_argnames=("pooled_size", "output_dim",
                                             "no_trans", "group_size",
                                             "part_size", "sample_per_part"))
def dcn_v2_psroi_pooling(x, rois, offset, *, spatial_scale: float,
                         pooled_size: int, output_dim: int,
                         no_trans: bool = False, group_size: int = 1,
                         part_size: int = None, sample_per_part: int = 4,
                         trans_std: float = 0.0):
    """x [1,H,W,C] (C = output_dim * group_size^2); rois [R,5] =
    [batch_idx, x1, y1, x2, y2]; offset [R, part^2, 2] or empty.

    Returns pooled [R, pooled_size, pooled_size, output_dim].
    """
    part_size = part_size or pooled_size
    R = rois.shape[0]
    P = pooled_size
    C = x.shape[-1]
    assert C == output_dim * group_size * group_size, (C, output_dim, group_size)

    x1 = rois[:, 1] * spatial_scale - 0.5
    y1 = rois[:, 2] * spatial_scale - 0.5
    x2 = (rois[:, 3] + 1.0) * spatial_scale - 0.5
    y2 = (rois[:, 4] + 1.0) * spatial_scale - 0.5
    rw = jnp.maximum(x2 - x1, 0.1)
    rh = jnp.maximum(y2 - y1, 0.1)
    bin_w = rw / P
    bin_h = rh / P
    sub_w = bin_w / sample_per_part
    sub_h = bin_h / sample_per_part

    iy = jnp.arange(P)
    ix = jnp.arange(P)
    sy = jnp.arange(sample_per_part)
    sx = jnp.arange(sample_per_part)

    # sample grid [R, P(i), P(j), s(y), s(x)]
    row = y1[:, None] + iy[None, :] * bin_h[:, None]          # [R, P]
    col = x1[:, None] + ix[None, :] * bin_w[:, None]          # [R, P]
    base_y = (row[:, :, None, None, None]
              + (sy + 0.5)[None, None, None, :, None]
              * sub_h[:, None, None, None, None])
    base_x = (col[:, None, :, None, None]
              + (sx + 0.5)[None, None, None, None, :]
              * sub_w[:, None, None, None, None])
    base_y = jnp.broadcast_to(base_y, (R, P, P, sample_per_part,
                                       sample_per_part))
    base_x = jnp.broadcast_to(base_x, (R, P, P, sample_per_part,
                                       sample_per_part))

    if not no_trans and offset is not None and offset.size:
        # per-part learned offsets scaled by roi size (trans_std)
        py = (iy * part_size) // P
        px = (ix * part_size) // P
        part_idx = (py[:, None] * part_size + px[None, :])    # [P,P]
        off = offset[:, part_idx]                              # [R,P,P,2]
        base_y = base_y + (off[..., 0] * trans_std
                           * rh[:, None, None])[..., None, None]
        base_x = base_x + (off[..., 1] * trans_std
                           * rw[:, None, None])[..., None, None]

    pts_y = base_y.reshape(1, -1)
    pts_x = base_x.reshape(1, -1)
    sampled = bilinear_sample(x, pts_y, pts_x)       # [1, R*P*P*s*s, C]
    sampled = sampled.reshape(R, P, P, sample_per_part ** 2, C)
    pooled_all = sampled.mean(axis=3)                # [R, P, P, C]

    # position-sensitive channel selection: bin (i,j) reads group (gy, gx)
    gy = jnp.clip((iy * group_size) // P, 0, group_size - 1)
    gx = jnp.clip((ix * group_size) // P, 0, group_size - 1)
    gidx = (gy[:, None] * group_size + gx[None, :])  # [P,P]
    chan = gidx[..., None] * output_dim + jnp.arange(output_dim)  # [P,P,D]
    out = jnp.take_along_axis(pooled_all,
                              jnp.broadcast_to(chan[None], (R, P, P, output_dim)),
                              axis=-1)
    return out
