"""Feature alignment: shape-align and center-align.

Re-derivation of ref:model/module/feturealign_mgpu.py. Both modules compute
*derived* (not learned) deformable offsets from the classification confidence
and the box regressions, then apply a DCNv2 with those explicit offsets plus
a residual connection:

  * shape_align — per-anchor kernel-shaped offsets spreading the 3x3 taps over
    the anchor's width/height; the offset field of the most confident anchor
    at each position is selected (ref::102-208).
  * center_align — the predicted (detached) delta-x/delta-y regressions,
    un-whitened and converted to feature-map pixels, shift a 1x1 deformable
    tap toward the object center (ref::7-99).

The reference's device-migration guards for DataParallel replicas (ref::52-56)
disappear under SPMD: constants are closed-over arrays.

Layouts: feature x [B,H,W,C]; per-anchor confidence prob [B,H,W,A].
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.dcn import dcn_v2


def _topk_anchor_gather(prob, fields, k: int, thresh: float):
    """Shared selection logic: top-k anchors by confidence, softmax-weighted
    combination of per-anchor `fields`, hard-masked by max confidence.

    prob [B,H,W,A]; fields [B,H,W,A,F] -> (combined [B,H,W,F], mask [B,H,W,1]).
    """
    prob = jax.lax.stop_gradient(prob)
    if k == 1:
        # lax.top_k(k=1) lowers through full sort machinery (~1.3 ms/img at
        # 512x1760 bs=8); max/argmax is the same selection
        mask = jnp.max(prob, axis=-1, keepdims=True)   # [B,H,W,1]
        ind = jnp.argmax(prob, axis=-1, keepdims=True)  # [B,H,W,1]
        hard = (mask > thresh).astype(prob.dtype)
        sel = jnp.take_along_axis(fields, ind[..., None], axis=3)
        combined = sel[:, :, :, 0] * hard              # softmax over 1 == 1
        return combined, mask
    pk, ind = jax.lax.top_k(prob, k)                   # [B,H,W,k]
    w = nn.softmax(pk, axis=-1)
    mask = jnp.max(pk, axis=-1, keepdims=True)         # [B,H,W,1]
    hard = (mask > thresh).astype(prob.dtype)
    sel = jnp.take_along_axis(fields, ind[..., None], axis=3)  # [B,H,W,k,F]
    combined = jnp.sum(sel * w[..., None], axis=3) * hard
    return combined, mask


class ShapeAlign(nn.Module):
    """Anchor-shape-driven 3x3 deformable alignment (ref::102-208)."""
    features: int
    anchors: np.ndarray          # [A, >=4]
    feat_stride: int
    kernel: int = 3
    k: int = 1
    thresh: float = 0.5
    dtype: Any = jnp.float32

    def setup(self):
        K = self.kernel
        A = self.anchors.shape[0]
        aw = (self.anchors[:, 2] - self.anchors[:, 0])
        ah = (self.anchors[:, 3] - self.anchors[:, 1])
        h_step = ah / self.feat_stride / K
        w_step = aw / self.feat_stride / K
        # per-anchor per-tap (dy, dx): spread taps across the anchor extent
        # (ref::126-136 — the (step-1) factor is relative to the rigid grid)
        off = np.zeros([A, K * K, 2], dtype=np.float32)
        for i in range(K):
            for j in range(K):
                t = i * K + j
                off[:, t, 0] = (h_step - 1) * (i - K / 2 + 0.5)
                off[:, t, 1] = (w_step - 1) * (j - K / 2 + 0.5)
        self.anchor_offsets = jnp.asarray(off)

        self.weight = self.param(
            "weight", nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                       "uniform"),
            (K, K, self.features, self.features))
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,))

    def __call__(self, x, prob):
        B, H, W, C = x.shape
        K = self.kernel
        if self.k == 1:
            # the offset field is a CONSTANT per-anchor table: select rows
            # of the [A, K*K*2] table by the argmax anchor instead of
            # broadcasting the table to [B,H,W,A,K*K*2] and gathering
            prob = jax.lax.stop_gradient(prob)
            mask = jnp.max(prob, axis=-1, keepdims=True)
            ind = jnp.argmax(prob, axis=-1)                # [B,H,W]
            hard = (mask > self.thresh).astype(x.dtype)
            table = self.anchor_offsets.reshape(-1, K * K * 2).astype(x.dtype)
            offset = table[ind] * hard                     # [B,H,W,KK*2]
        else:
            fields = jnp.broadcast_to(
                self.anchor_offsets.reshape(1, 1, 1, -1, K * K * 2),
                (B, H, W, self.anchor_offsets.shape[0],
                 K * K * 2)).astype(x.dtype)
            offset, mask = _topk_anchor_gather(prob, fields, self.k,
                                               self.thresh)
        offset = offset.reshape(B, H, W, K * K, 2)
        dcn_mask = jnp.broadcast_to(mask, (B, H, W, K * K)).astype(x.dtype)
        aligned = dcn_v2(x, offset, dcn_mask, self.weight.astype(x.dtype),
                         self.bias.astype(x.dtype), stride=1, padding=K // 2)
        return aligned + x


class CenterAlign(nn.Module):
    """Regression-driven 1x1 deformable alignment (ref::7-99)."""
    features: int
    anchors: np.ndarray
    xy_mean: np.ndarray          # whitening means of (dx, dy)
    xy_std: np.ndarray
    feat_stride: int
    kernel: int = 1
    k: int = 1
    thresh: float = 0.5
    dtype: Any = jnp.float32

    def setup(self):
        K = self.kernel
        self.anchor_w = jnp.asarray(
            (self.anchors[:, 2] - self.anchors[:, 0]) / self.feat_stride,
            dtype=jnp.float32)
        self.anchor_h = jnp.asarray(
            (self.anchors[:, 3] - self.anchors[:, 1]) / self.feat_stride,
            dtype=jnp.float32)
        self._mean = jnp.asarray(np.asarray(self.xy_mean), dtype=jnp.float32)
        self._std = jnp.asarray(np.asarray(self.xy_std), dtype=jnp.float32)
        self.weight = self.param(
            "weight", nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                       "uniform"),
            (K, K, self.features, self.features))
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,))

    def __call__(self, x, bbox_x, bbox_y, prob):
        """bbox_x/bbox_y: per-anchor whitened delta predictions [B,H,W,A]."""
        B, H, W, C = x.shape
        K = self.kernel
        bbox_x = jax.lax.stop_gradient(bbox_x).astype(jnp.float32)
        bbox_y = jax.lax.stop_gradient(bbox_y).astype(jnp.float32)
        # un-whiten and convert to feature-map pixels (ref::67-68)
        off_x = (bbox_x * self._std[0] + self._mean[0]) * self.anchor_w
        off_y = (bbox_y * self._std[1] + self._mean[1]) * self.anchor_h
        fields = jnp.stack([off_y, off_x], axis=-1)    # [B,H,W,A,2] (dy,dx)
        offset, mask = _topk_anchor_gather(prob, fields, self.k, self.thresh)
        offset = jnp.broadcast_to(offset[:, :, :, None, :],
                                  (B, H, W, K * K, 2)).astype(x.dtype)
        dcn_mask = jnp.broadcast_to(mask, (B, H, W, K * K)).astype(x.dtype)
        aligned = dcn_v2(x, offset, dcn_mask, self.weight.astype(x.dtype),
                         self.bias.astype(x.dtype), stride=1, padding=K // 2)
        return aligned + x
