"""Shared NN building blocks (Flax linen, NHWC).

Conventions matching the reference:
  * BatchNorm momentum 0.1 (torch) == decay/momentum 0.9 here
    (ref:model/pose_dla_dcn.py:24)
  * LeakyReLU with torch's default negative_slope 0.01
  * Learnable depthwise transposed-conv upsampling initialized to bilinear
    (ref:model/pose_dla_dcn.py:459-468,536-539)
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

BN_MOMENTUM = 0.9  # torch momentum 0.1 -> running-average decay 0.9


def leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=0.01)


class ConvBNAct(nn.Module):
    """Conv -> BatchNorm -> LeakyReLU."""
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = self.dilation * (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=self.use_bias, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         dtype=self.dtype)(x)
        if self.act:
            x = leaky_relu(x)
        return x


def bilinear_upsample_kernel(f: int, channels: int, dtype=np.float32):
    """Depthwise transposed-conv kernel of size (2f x 2f) initialized to
    bilinear interpolation (ref:model/pose_dla_dcn.py:459-468).

    Returns HWIO kernel [2f, 2f, 1, channels] for feature_group_count=channels.
    """
    size = 2 * f
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    w = np.zeros([size, size], dtype=dtype)
    for i in range(size):
        for j in range(size):
            w[i, j] = (1 - abs(i / f - c)) * (1 - abs(j / f - c))
    k = np.zeros([size, size, 1, channels], dtype=dtype)
    k[:, :, 0, :] = w[:, :, None]
    return k


class BilinearUpsample(nn.Module):
    """Learnable depthwise ConvTranspose upsampling (factor f), bilinear init.

    Matches torch ConvTranspose2d(o, o, f*2, stride=f, padding=f//2, groups=o).
    """
    channels: int
    factor: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.factor
        if f == 1:
            return x
        kernel = self.param(
            "kernel",
            lambda rng: jnp.asarray(bilinear_upsample_kernel(f, self.channels)))
        # torch convT output size: (H-1)*f - 2*pad + 2f with pad=f//2 -> H*f
        # lax: transposed conv == conv_general_dilated with lhs_dilation
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=[(2 * f - 1 - f // 2, 2 * f - 1 - f // 2)] * 2,
            lhs_dilation=(f, f), rhs_dilation=(1, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.channels)
        # transposed conv flips the kernel; bilinear kernels are symmetric for
        # even f... flip explicitly to match torch semantics exactly
        return y

    @staticmethod
    def output_size(h, f):
        return h * f


class LocalConv2d(nn.Module):
    """Row-banded ("depth-aware") convolution: the image is split into
    `num_rows` horizontal bands, each with its own 3x3 kernel
    (ref:model/pose_dla_dcn.py:36-91).

    TPU-native formulation: bands are folded into channel groups and processed
    by one grouped convolution (a single fused XLA op), exactly the trick the
    reference uses but without the unfold/permute round-trips.
    """
    num_rows: int
    features: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        r = self.num_rows
        k = self.kernel
        pad = k // 2
        t = H // r
        assert t * r == H, f"H={H} not divisible by num_rows={r}"

        xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)])
        # extract overlapping bands [B, r, t+2p, W+2p, C]
        bands = jnp.stack([xp[:, i * t:i * t + t + 2 * pad] for i in range(r)],
                          axis=1)
        # fold bands into channels: [B, t+2p, W+2p, r*C]
        bands = bands.transpose(0, 2, 3, 1, 4).reshape(
            B, t + 2 * pad, W + 2 * pad, r * C)
        y = nn.Conv(self.features * r, (k, k), padding="VALID",
                    feature_group_count=r, use_bias=True, dtype=self.dtype)(bands)
        # unfold back: [B, t, W, r, F] -> [B, H, W, F]
        y = y.reshape(B, t, W, r, self.features).transpose(0, 3, 1, 2, 4)
        y = y.reshape(B, H, W, self.features)
        return y


class AdaptiveAvgPool2d:
    """Exact torch AdaptiveAvgPool2d as two small pooling matmuls.

    Output cell i averages input rows floor(i*H/o) .. ceil((i+1)*H/o)-1.
    Implemented as P_h @ X @ P_w^T, which XLA maps onto the MXU.
    """

    @staticmethod
    def pool_matrix(in_size: int, out_size: int) -> np.ndarray:
        P = np.zeros([out_size, in_size], dtype=np.float32)
        for i in range(out_size):
            s = int(np.floor(i * in_size / out_size))
            e = int(np.ceil((i + 1) * in_size / out_size))
            P[i, s:e] = 1.0 / (e - s)
        return P

    @staticmethod
    def apply(x, out_h: int, out_w: int):
        B, H, W, C = x.shape
        Ph = jnp.asarray(AdaptiveAvgPool2d.pool_matrix(H, out_h), dtype=x.dtype)
        Pw = jnp.asarray(AdaptiveAvgPool2d.pool_matrix(W, out_w), dtype=x.dtype)
        y = jnp.einsum("oh,bhwc->bowc", Ph, x)
        y = jnp.einsum("pw,bowc->bopc", Pw, y)
        return y


def max_pool(x, window: int, stride: int):
    return nn.max_pool(x, (window, window), strides=(stride, stride))
