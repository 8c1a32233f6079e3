"""Auxiliary loss components (PointRCNN-vendored capability parity).

jnp re-derivations of ref:lib/utils/loss_utils.py (DiceLoss,
SigmoidFocalClassificationLoss, bin-based localization loss) and
ref:lib/utils/bbox_transform.py (bin-based center/heading encode/decode).
Unused by the stock M3DSSD configs — capability surface for extensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.boxes import smooth_l1


def sigmoid_focal_loss(logits, targets, weights=None, gamma=2.0, alpha=0.25):
    """Per-element sigmoid focal loss (ref:loss_utils.py Sigmoid
    FocalClassificationLoss). targets in {0,1}; returns same shape."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.logaddexp(0.0, logits) - logits * targets  # BCE with logits
    p_t = targets * p + (1 - targets) * (1 - p)
    a_t = targets * alpha + (1 - targets) * (1 - alpha)
    loss = a_t * (1 - p_t) ** gamma * ce
    if weights is not None:
        loss = loss * weights
    return loss


def dice_loss(logits, targets, eps=1e-7):
    """Soft Dice loss on sigmoid scores (ref:loss_utils.py DiceLoss)."""
    p = jax.nn.sigmoid(logits).reshape(-1)
    t = targets.reshape(-1).astype(p.dtype)
    inter = jnp.sum(p * t)
    return 1.0 - (2 * inter + eps) / (jnp.sum(p) + jnp.sum(t) + eps)


# ----------------------------------------------------------------------------
# bin-based center / heading encoding (ref:lib/utils/bbox_transform.py)
# ----------------------------------------------------------------------------

def encode_bin(value, search_range, num_bins):
    """Value in [-range, range) -> (bin id, normalized intra-bin residual)."""
    bin_size = 2 * search_range / num_bins
    shifted = jnp.clip(value + search_range, 0, 2 * search_range - 1e-4)
    bin_id = jnp.floor(shifted / bin_size).astype(jnp.int32)
    residual = (shifted - (bin_id.astype(value.dtype) + 0.5) * bin_size) \
        / (bin_size / 2)
    return bin_id, residual


def decode_bin(bin_id, residual, search_range, num_bins):
    bin_size = 2 * search_range / num_bins
    center = (bin_id.astype(residual.dtype) + 0.5) * bin_size - search_range
    return center + residual * (bin_size / 2)


def encode_heading(angle, num_bins=12):
    """Angle (-pi, pi] -> (bin, residual) with bin centers at 2pi/num_bins."""
    two_pi = 2 * jnp.pi
    shifted = jnp.mod(angle + jnp.pi, two_pi)            # [0, 2pi)
    bin_size = two_pi / num_bins
    bin_id = jnp.floor(shifted / bin_size).astype(jnp.int32)
    residual = (shifted - (bin_id.astype(angle.dtype) + 0.5) * bin_size) \
        / (bin_size / 2)
    return bin_id, residual


def decode_heading(bin_id, residual, num_bins=12):
    two_pi = 2 * jnp.pi
    bin_size = two_pi / num_bins
    shifted = (bin_id.astype(residual.dtype) + 0.5) * bin_size \
        + residual * (bin_size / 2)
    a = shifted - jnp.pi
    return a - jnp.round(a / two_pi) * two_pi


def bin_based_reg_loss(bin_logits, residual_pred, gt_value, search_range,
                       num_bins, mask=None):
    """Classification-over-bins + smooth-L1 on the intra-bin residual
    (ref:loss_utils.py get_reg_loss, simplified to one dimension).

    bin_logits [..., num_bins]; residual_pred [..., num_bins] (per-bin
    residual heads, the gt bin's head is supervised). Returns scalar.
    """
    gt_bin, gt_res = encode_bin(gt_value, search_range, num_bins)
    logp = jax.nn.log_softmax(bin_logits, axis=-1)
    cls_loss = -jnp.take_along_axis(logp, gt_bin[..., None], axis=-1)[..., 0]
    res_pred = jnp.take_along_axis(residual_pred, gt_bin[..., None],
                                   axis=-1)[..., 0]
    res_loss = smooth_l1(res_pred, gt_res)
    loss = cls_loss + res_loss
    if mask is not None:
        m = mask.astype(loss.dtype)
        return jnp.sum(loss * m) / jnp.maximum(jnp.sum(m), 1e-9)
    return jnp.mean(loss)
