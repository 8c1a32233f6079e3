"""Attention modules: ANAB (asymmetric non-local attention block) and friends.

Re-derivation of ref:model/module/attention.py. ANAB keeps the query at full
resolution but pyramid-pools keys/values to S = sum(s^2) tokens (337 for
sizes 1/4/8/16), so attention costs O(HW * S) instead of O((HW)^2) — two
batched MXU matmuls plus adaptive pooling. The per-scale spatial attention
(sigmoid gates multiplying the features before each pooling level) is PAPA
(ref:model/module/attention.py:120-147).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import AdaptiveAvgPool2d


def papa_pool(feats, atten, sizes):
    """Pyramid adaptive pooling with optional per-scale spatial attention.

    feats [B,H,W,C]; atten [B,H,W,len(sizes)] or None.
    Returns [B, S, C] with S = sum(s^2) (ref:model/module/attention.py:136-147).
    """
    tokens = []
    for i, s in enumerate(sizes):
        f = feats if atten is None else feats * atten[..., i:i + 1]
        p = AdaptiveAvgPool2d.apply(f, s, s)          # [B, s, s, C]
        tokens.append(p.reshape(p.shape[0], s * s, p.shape[-1]))
    return jnp.concatenate(tokens, axis=1)


class ANAB(nn.Module):
    """Asymmetric non-local attention (ref:model/module/attention.py:150-216)."""
    psp_sizes: Sequence[int] = (1, 4, 8, 16)
    with_atten: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        key_num = sum(s * s for s in self.psp_sizes)
        key_ch = key_num // 2

        query = nn.Conv(key_ch, (1, 1), use_bias=False, dtype=self.dtype,
                        name="query_conv")(x)
        query = query.reshape(B, H * W, key_ch)

        if self.with_atten:
            psp_atten = nn.sigmoid(nn.Conv(len(self.psp_sizes), (1, 1),
                                           use_bias=False, dtype=self.dtype,
                                           name="spatial_conv")(x))
        else:
            psp_atten = None

        key = nn.Conv(key_ch, (1, 1), use_bias=False, dtype=self.dtype,
                      name="key_conv")(x)
        key = papa_pool(key, psp_atten, self.psp_sizes)       # [B, S, key_ch]

        value = nn.Conv(C, (1, 1), use_bias=False, dtype=self.dtype,
                        name="value_conv")(x)
        value = papa_pool(value, psp_atten, self.psp_sizes)   # [B, S, C]

        att = jnp.einsum("bqk,bsk->bqs", query, key)          # [B, HW, S]
        att = nn.softmax(att.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bqs,bsc->bqc", att, value)
        return out.reshape(B, H, W, C) + x


class NLUp(nn.Module):
    """Cross-resolution position attention (SAGAN-style) between a query map
    and a (possibly coarser) value map (ref:model/pose_dla_dcn.py:591-639
    NL_Up). Full O(q_HW x v_HW) attention — two batched MXU matmuls.

    Capability-parity side module: available to necks but unused by the
    trained reference configuration (like its upstream counterpart).
    """
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, v, train: bool = True):
        B, qh, qw, q_ch = q.shape
        _, vh, vw, v_ch = v.shape
        from .layers import BN_MOMENTUM

        if v_ch != q_ch:
            key = nn.Conv(q_ch, (1, 1), use_bias=False, dtype=self.dtype,
                          name="k_conv")(v)
            value = nn.Conv(q_ch, (1, 1), use_bias=False, dtype=self.dtype,
                            name="v_conv")(v)
        else:
            key, value = v, v
        qn = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                          dtype=self.dtype, name="q_bn")(q)
        kn = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                          dtype=self.dtype, name="k_bn")(key)

        qf = qn.reshape(B, qh * qw, q_ch)
        kf = kn.reshape(B, vh * vw, q_ch)
        vf = value.reshape(B, vh * vw, q_ch)
        att = nn.softmax(jnp.einsum("bqc,bsc->bqs", qf, kf)
                         .astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bqs,bsc->bqc", att, vf)
        return out.reshape(B, qh, qw, q_ch)


class NLPM(nn.Module):
    """Non-local pyramid module variant without the learned spatial gates
    (ref:model/module/attention.py:43-109). Capability-parity module."""
    out_features: int
    key_features: int
    psp_sizes: Sequence[int] = (1, 4, 8, 16)
    residual: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        q = nn.Conv(self.key_features, (1, 1), use_bias=False,
                    dtype=self.dtype)(x).reshape(B, H * W, self.key_features)
        k = nn.Conv(self.key_features, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        k = papa_pool(k, None, self.psp_sizes)
        v = nn.Conv(self.out_features, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        v = papa_pool(v, None, self.psp_sizes)
        att = nn.softmax(jnp.einsum("bqk,bsk->bqs", q, k).astype(jnp.float32),
                         axis=-1).astype(x.dtype)
        out = jnp.einsum("bqs,bsc->bqc", att, v).reshape(B, H, W,
                                                         self.out_features)
        return out + x if self.residual else out
