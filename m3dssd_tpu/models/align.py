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

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.dcn import bilinear_sample_rows, dcn_v2


class SparseSel(NamedTuple):
    """Shared top-M confident-position selection for the alignment modules.

    Both align flavors mask their derived offsets by `max anchor confidence
    > thresh` — at every other position the DCN collapses EXACTLY to
    `mask * conv(x) + bias` (offsets are zero, bilinear weights degenerate
    to the rigid grid). So the full-map deformable gather — the detect hot
    spot, ~3 ms of 13.5 ms at 512x1760 (PERF.md) — only ever matters at the
    confident positions, which a trained detector has a few dozen of per
    image. The sparse path computes the cheap dense form everywhere plus a
    gather/scatter correction at the top-M confident positions; when more
    than M positions are confident it falls back to the dense DCN
    (`lax.cond`), so the result is exact in both regimes.
    """
    pos: jnp.ndarray    # [M] flat indices into B*H*W; sentinel B*H*W = unused
    ok: jnp.ndarray     # scalar bool: every confident position fits in M
    mask: jnp.ndarray   # [B,H,W,1] max anchor confidence (stop-gradded)
    ind: jnp.ndarray    # [B,H,W] argmax anchor


def confident_topm(prob, thresh: float, m_per_image: int) -> SparseSel:
    """Select (up to) the first M = m_per_image*B confident positions.

    Selection is compaction, not sorting: a cumsum over the confidence flags
    gives each confident position its output slot, and `searchsorted` on the
    (monotone) cumsum inverts that map with log2(B*H*W) tiny gathers — a
    full `lax.top_k` over B*H*W scores lowers through TPU sort machinery
    (~20 ms at 507k rows, PERF.md) and is never needed for exactness.
    """
    from ..ops.compact import first_m_true

    B, H, W, A = prob.shape
    prob = jax.lax.stop_gradient(prob)
    mask = jnp.max(prob, axis=-1, keepdims=True)
    ind = jnp.argmax(prob, axis=-1)
    M = int(min(m_per_image * B, B * H * W))
    pos, ok = first_m_true((mask[..., 0] > thresh).reshape(-1), M)
    return SparseSel(pos, ok, mask, ind)


def _flat_coords(pos, B, H, W):
    """pos [M] flat B*H*W indices -> (b, y, x) int32 components."""
    HW = H * W
    bi = pos // HW
    rem = pos - bi * HW
    yy = rem // W
    xx = rem - yy * W
    return bi, yy, xx


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

    def __call__(self, x, prob, sparse_sel: Optional[SparseSel] = None):
        B, H, W, C = x.shape
        K = self.kernel
        if self.k == 1 and sparse_sel is not None:
            # the dense expression mask*conv3x3(x)+b is hoisted OUT of the
            # cond: it fuses with its surroundings and the cond body is only
            # the top-M correction (or, on overflow, the full deformable
            # path, which ignores `base` — one wasted conv in that regime)
            base = self._base(x, sparse_sel)
            aligned = jax.lax.cond(
                sparse_sel.ok,
                lambda: self._sparse_correct(base, x, sparse_sel),
                lambda: self._dense(x, sparse_sel))
            return aligned + x
        if self.k == 1:
            # the offset field is a CONSTANT per-anchor table: select rows
            # of the [A, K*K*2] table by the argmax anchor instead of
            # broadcasting the table to [B,H,W,A,K*K*2] and gathering
            prob = jax.lax.stop_gradient(prob)
            mask = jnp.max(prob, axis=-1, keepdims=True)
            ind = jnp.argmax(prob, axis=-1)                # [B,H,W]
            aligned = self._dense(x, SparseSel(None, None, mask, ind))
            return aligned + x
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

    def _dense(self, x, sel: SparseSel):
        """Full-map deformable path (k=1): exact reference semantics."""
        B, H, W, C = x.shape
        K = self.kernel
        hard = (sel.mask > self.thresh).astype(x.dtype)
        table = self.anchor_offsets.reshape(-1, K * K * 2).astype(x.dtype)
        offset = (table[sel.ind] * hard).reshape(B, H, W, K * K, 2)
        dcn_mask = jnp.broadcast_to(sel.mask,
                                    (B, H, W, K * K)).astype(x.dtype)
        return dcn_v2(x, offset, dcn_mask, self.weight.astype(x.dtype),
                      self.bias.astype(x.dtype), stride=1, padding=K // 2)

    def _base(self, x, sel: SparseSel):
        """The zero-offset collapse `mask*conv3x3(x)+b` (see _sparse_correct)."""
        K = self.kernel
        pad = K // 2
        w = self.weight.astype(x.dtype)
        bias = self.bias.astype(x.dtype)
        # NOTE: no preferred_element_type here — the MXU accumulates convs
        # in f32 regardless, and JAX's conv transpose rule (unlike
        # dot_general's) rejects a widened output dtype against bf16
        # operands when differentiated
        base = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return sel.mask.astype(x.dtype) * base + bias

    def _sparse_correct(self, dense, x, sel: SparseSel):
        """Gather/scatter correction of the hoisted dense base at the top-M
        confident positions. Exact vs `_dense` (modulo float reassociation):
        at non-confident positions the offsets are zero so the deformable
        sampling IS the rigid 3x3 grid."""
        B, H, W, C = x.shape
        K = self.kernel
        KK = K * K
        pad = K // 2
        w = self.weight.astype(x.dtype)
        bias = self.bias.astype(x.dtype)
        f32 = jnp.float32
        acc_t = jnp.promote_types(x.dtype, f32)

        pos = sel.pos
        M = pos.shape[0]
        bi, yy, xx = _flat_coords(pos, B, H, W)
        ind_p = jnp.take(sel.ind.reshape(-1), pos, mode="clip")
        mask_p = jnp.take(sel.mask.reshape(-1), pos, mode="clip")
        table = self.anchor_offsets.reshape(-1, KK, 2)          # f32 [A,KK,2]
        off_p = jnp.take(table, ind_p, axis=0, mode="clip")     # [M,KK,2]
        tap_y = jnp.repeat(jnp.arange(K, dtype=f32), K)
        tap_x = jnp.tile(jnp.arange(K, dtype=f32), K)
        py = (yy.astype(f32)[:, None] - pad + tap_y[None, :]) + off_p[..., 0]
        px = (xx.astype(f32)[:, None] - pad + tap_x[None, :]) + off_p[..., 1]
        sampled = bilinear_sample_rows(x, bi, py, px)           # [M,KK,C]
        cols = (sampled * mask_p[:, None, None].astype(x.dtype)
                ).reshape(M, KK * C)
        val = jax.lax.dot_general(cols, w.reshape(KK * C, -1),
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=acc_t)
        val = val.astype(x.dtype) + bias
        out = dense.reshape(B * H * W, -1).at[pos].set(
            val, mode="drop", unique_indices=True)
        return out.reshape(B, H, W, -1)


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

    def __call__(self, x, bbox_x, bbox_y, prob,
                 sparse_sel: Optional[SparseSel] = None):
        """bbox_x/bbox_y: per-anchor whitened delta predictions [B,H,W,A]."""
        if self.k == 1 and self.kernel == 1 and sparse_sel is not None:
            # dense base hoisted out of the cond (see ShapeAlign.__call__)
            base = self._base(x, sparse_sel)
            aligned = jax.lax.cond(
                sparse_sel.ok,
                lambda: self._sparse_correct(base, x, bbox_x, bbox_y,
                                             sparse_sel),
                lambda: self._dense(x, bbox_x, bbox_y, prob))
            return aligned + x
        aligned = self._dense(x, bbox_x, bbox_y, prob)
        return aligned + x

    def _dense(self, x, bbox_x, bbox_y, prob):
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
        return dcn_v2(x, offset, dcn_mask, self.weight.astype(x.dtype),
                      self.bias.astype(x.dtype), stride=1, padding=K // 2)

    def _base(self, x, sel: SparseSel):
        """The zero-offset collapse `mask*(x@W)+b` — NO gather at all (a
        zero offset on a 1x1 kernel is the identity sample). [B*H*W, Cout]."""
        B, H, W, C = x.shape
        acc_t = jnp.promote_types(x.dtype, jnp.float32)
        w = self.weight.astype(x.dtype).reshape(C, -1)          # [C,Cout]
        bias = self.bias.astype(x.dtype)
        base = jax.lax.dot_general(x.reshape(B * H * W, C), w,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=acc_t)
        return (sel.mask.reshape(-1, 1).astype(x.dtype)
                * base.astype(x.dtype) + bias)

    def _sparse_correct(self, dense, x, bbox_x, bbox_y, sel: SparseSel):
        """Bilinear correction of the hoisted dense base at the top-M
        confident positions."""
        B, H, W, C = x.shape
        f32 = jnp.float32
        acc_t = jnp.promote_types(x.dtype, f32)
        w = self.weight.astype(x.dtype).reshape(C, -1)          # [C,Cout]
        bias = self.bias.astype(x.dtype)

        pos = sel.pos
        bi, yy, xx = _flat_coords(pos, B, H, W)
        A = bbox_x.shape[-1]
        bx = jnp.take(jax.lax.stop_gradient(bbox_x).astype(f32)
                      .reshape(-1, A), pos, axis=0, mode="clip")   # [M,A]
        by = jnp.take(jax.lax.stop_gradient(bbox_y).astype(f32)
                      .reshape(-1, A), pos, axis=0, mode="clip")
        ind_p = jnp.take(sel.ind.reshape(-1), pos, mode="clip")
        mask_p = jnp.take(sel.mask.reshape(-1), pos, mode="clip")
        bx_p = jnp.take_along_axis(bx, ind_p[:, None], axis=1)[:, 0]
        by_p = jnp.take_along_axis(by, ind_p[:, None], axis=1)[:, 0]
        aw = jnp.take(self.anchor_w, ind_p, mode="clip")
        ah = jnp.take(self.anchor_h, ind_p, mode="clip")
        off_x = (bx_p * self._std[0] + self._mean[0]) * aw
        off_y = (by_p * self._std[1] + self._mean[1]) * ah
        py = yy.astype(f32) + off_y
        px = xx.astype(f32) + off_x
        sampled = bilinear_sample_rows(x, bi, py[:, None], px[:, None])[:, 0]
        val = jax.lax.dot_general(
            sampled * mask_p[:, None].astype(x.dtype), w,
            (((1,), (0,)), ((), ())), preferred_element_type=acc_t)
        val = val.astype(x.dtype) + bias
        out = dense.at[pos].set(val, mode="drop", unique_indices=True)
        return out.reshape(B, H, W, -1)
