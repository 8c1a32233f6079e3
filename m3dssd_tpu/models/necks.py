"""DLA aggregation necks: DeformConv, IDAUp, DLAUp, DLASeg.

Re-derivation of ref:model/pose_dla_dcn.py:471-701. Upsampling merges deep
levels into the stride-8 map; projection/node convs are deformable (DCNv2
with learned offsets) when `ida_dcnv2` is on, plain 3x3 otherwise
(ref:model/pose_dla_dcn.py:529-534).
"""

from __future__ import annotations

import functools
from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.dcn import bilinear_sample, dcn_v2, dcn_v2_shift
from .dla import make_dla
from .layers import BN_MOMENTUM, BilinearUpsample, leaky_relu


class DCN(nn.Module):
    """Deformable conv with *learned* offsets/mask (ref:model/DCNv2/dcn_v2.py:44-70).

    A zero-initialized conv predicts per-tap (dy, dx) and a sigmoid mask; at
    init the op is exactly a plain conv (offsets 0, mask 0.5).

    `shift_clamp`: when set (default 1.0), offsets are clamped to that range
    and the op runs as gather-free shifted MACs (`dcn_v2_shift` — measured
    1.7x faster and scatter-free in backward; see PERF.md). Set None for the
    unbounded gather path.

    A fused Pallas kernel for the shift form exists (`ops/dcn_pallas.py`)
    but is NOT used here: it wins 1.3-1.5x in isolation yet loses in-model
    (the custom-call boundary breaks XLA fusion/layout — see the NOTE in
    `__call__` and dcn_pallas.py STATUS). Kept as a parity-tested probe.
    """
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    shift_clamp: Any = 1.0
    remat: bool = False   # jax.checkpoint around the shift-DCN (config.py)
    custom_vjp: bool = True   # hand-written shift-DCN transpose (config.py)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        K = self.kernel
        KK = K * K
        om = nn.Conv(3 * KK, (K, K), strides=(self.stride, self.stride),
                     padding=[(self.dilation * (K - 1) // 2,) * 2] * 2,
                     kernel_dilation=(self.dilation, self.dilation),
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     dtype=self.dtype, name="conv_offset_mask")(x)
        o_y, o_x, m = jnp.split(om, 3, axis=-1)
        offset = jnp.stack([o_y, o_x], axis=-1)          # [B,H,W,KK,2]
        mask = nn.sigmoid(m)                              # [B,H,W,KK]

        weight = self.param("weight",
                            nn.initializers.variance_scaling(
                                1.0 / 3.0, "fan_in", "uniform"),
                            (K, K, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.shift_clamp is not None and self.stride == 1 \
                and self.dilation == 1:
            # NOTE: a fused Pallas kernel (ops/dcn_pallas.py) beats this XLA
            # form 1.3-1.5x in ISOLATION at the neck shapes, but IN-MODEL
            # the custom-call boundary breaks XLA's fusion/layout choices
            # around it (backbone conv time tripled; end-to-end detect
            # 13.9 -> 18.9 ms measured) — so the XLA form stays. The kernel
            # is kept + parity-tested for future XLA/Mosaic versions.
            fn = functools.partial(dcn_v2_shift,
                                   clamp=float(self.shift_clamp),
                                   custom_vjp=self.custom_vjp)
            if self.remat:
                fn = jax.checkpoint(fn)
            return fn(x, offset, mask, weight.astype(x.dtype),
                      bias.astype(x.dtype))
        return dcn_v2(x, offset, mask, weight.astype(x.dtype),
                      bias.astype(x.dtype), stride=self.stride,
                      padding=self.dilation * (K - 1) // 2,
                      dilation=self.dilation)


class DeformConv(nn.Module):
    """DCN -> BN -> LeakyReLU (ref:model/pose_dla_dcn.py:471-485)."""
    features: int
    shift_clamp: Any = 1.0
    remat: bool = False
    custom_vjp: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = DCN(self.features, 3, shift_clamp=self.shift_clamp,
                remat=self.remat, custom_vjp=self.custom_vjp,
                dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         dtype=self.dtype)(x)
        return leaky_relu(x)


class DeformLocConv(nn.Module):
    """Row-banded ("depth-aware") deformable conv: each of `num_rows`
    horizontal bands has its own learned DCN offsets and weights
    (ref:model/pose_dla_dcn.py:487-517).

    TPU-native formulation: bands fold into the batch dim for one fused
    bilinear gather and into a batched MXU einsum for the per-band weights —
    no unfold/permute round trips, no grouped-DCN CUDA kernel. Offsets come
    from one grouped conv over the channel-folded bands (zero-init, so the
    op starts as 0.5x a per-band plain conv, like the reference DCN).

    Capability-parity side module (unused by the trained reference config).
    """
    features: int
    num_rows: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        B, H, W, C = x.shape
        r = self.num_rows
        K = self.kernel
        KK = K * K
        pad = K // 2
        t = H // r
        assert t * r == H, f"H={H} not divisible by num_rows={r}"

        xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)])
        # overlapping bands [B, r, t+2p, W+2p, C]
        bands = jnp.stack([xp[:, i * t:i * t + t + 2 * pad] for i in range(r)],
                          axis=1)

        # per-band offset/mask predictor: grouped conv on channel-folded bands
        folded = bands.transpose(0, 2, 3, 1, 4).reshape(
            B, t + 2 * pad, W + 2 * pad, r * C)
        om = nn.Conv(r * 3 * KK, (K, K), padding="VALID",
                     feature_group_count=r,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     dtype=self.dtype, name="conv_offset_mask")(folded)
        om = om.reshape(B, t, W, r, 3 * KK).transpose(0, 3, 1, 2, 4)
        o_y, o_x, m = jnp.split(om, 3, axis=-1)           # [B,r,t,W,KK]
        mask = nn.sigmoid(m)

        # deformable sampling with bands as batch
        xb = bands.reshape(B * r, t + 2 * pad, W + 2 * pad, C)
        f32 = jnp.float32
        ys = jnp.arange(t, dtype=f32)                     # padded coords
        xs = jnp.arange(W, dtype=f32)
        tap_y = jnp.repeat(jnp.arange(K, dtype=f32), K)
        tap_x = jnp.tile(jnp.arange(K, dtype=f32), K)
        py = (ys[None, :, None, None] + tap_y[None, None, None, :]
              + o_y.reshape(B * r, t, W, KK).astype(f32))
        px = (xs[None, None, :, None] + tap_x[None, None, None, :]
              + o_x.reshape(B * r, t, W, KK).astype(f32))
        sampled = bilinear_sample(xb, py, px)             # [B*r,t,W,KK,C]
        sampled = sampled * mask.reshape(B * r, t, W, KK)[..., None] \
            .astype(x.dtype)

        cols = sampled.reshape(B, r, t * W, KK * C)
        weight = self.param(
            "weight", nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                       "uniform"),
            (r, KK * C, self.features))
        bias = self.param("bias", nn.initializers.zeros,
                          (r, self.features))
        y = jnp.einsum("brnk,rko->brno", cols.astype(x.dtype),
                       weight.astype(x.dtype),
                       preferred_element_type=jnp.float32)
        y = (y + bias[None, :, None, :]).astype(x.dtype)
        y = y.reshape(B, H, W, self.features)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         dtype=self.dtype)(y)
        return leaky_relu(y)


class PlainConv(nn.Module):
    """3x3 conv used when ida_dcnv2=False (ref:model/pose_dla_dcn.py:533-534)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        return nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype)(x)


class IDAUp(nn.Module):
    """Iterative deep aggregation step (ref:model/pose_dla_dcn.py:519-552).

    For each level i>start: level_i = node(up(proj(level_i)) + level_{i-1}).
    """
    out_features: int
    up_factors: Sequence[int]   # per level, relative to the first
    use_dcn: bool = True
    shift_clamp: Any = 1.0
    remat: bool = False
    custom_vjp: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        if self.use_dcn:
            conv = lambda f, dtype: DeformConv(f, shift_clamp=self.shift_clamp,
                                               remat=self.remat,
                                               custom_vjp=self.custom_vjp,
                                               dtype=dtype)
        else:
            conv = PlainConv
        n = len(self.up_factors)
        self.projs = [conv(self.out_features, dtype=self.dtype)
                      for _ in range(1, n)]
        self.nodes = [conv(self.out_features, dtype=self.dtype)
                      for _ in range(1, n)]
        self.ups = [BilinearUpsample(self.out_features, int(self.up_factors[i]),
                                     dtype=self.dtype)
                    for i in range(1, n)]

    def __call__(self, layers: List, start: int, end: int, train: bool = True):
        layers = list(layers)
        for i in range(start + 1, end):
            j = i - start - 1
            up = self.ups[j](self.projs[j](layers[i], train))
            layers[i] = self.nodes[j](up + layers[i - 1], train)
        return layers


class DLAUp(nn.Module):
    """Full aggregation pyramid (ref:model/pose_dla_dcn.py:556-578)."""
    channels: Sequence[int]       # channels of levels [first_level:]
    use_dcn: bool = True
    shift_clamp: Any = 1.0
    remat: bool = False
    custom_vjp: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        ch = list(self.channels)
        in_ch = list(self.channels)
        scales = [2 ** i for i in range(len(ch))]
        idas = []
        for i in range(len(ch) - 1):
            j = -i - 2
            idas.append(IDAUp(ch[j],
                              [s // scales[j] for s in scales[j:]],
                              use_dcn=self.use_dcn,
                              shift_clamp=self.shift_clamp,
                              remat=self.remat,
                              custom_vjp=self.custom_vjp,
                              dtype=self.dtype))
            scales[j + 1:] = [scales[j]] * len(scales[j + 1:])
            in_ch[j + 1:] = [ch[j]] * len(in_ch[j + 1:])
        self.idas = idas

    def __call__(self, layers: List, train: bool = True):
        layers = list(layers)
        out = [layers[-1]]
        for i in range(len(self.channels) - 1):
            start = len(layers) - i - 2
            layers = self.idas[i](layers, start, len(layers), train)
            out.insert(0, layers[-1])
        return out


class DLASeg(nn.Module):
    """Backbone + DLAUp + final IDAUp -> single stride-8 feature map
    (ref:model/pose_dla_dcn.py:641-701)."""
    base_name: str = "dla102"
    down_ratio: int = 8
    last_level: int = 5
    use_dcn: bool = True
    shift_clamp: Any = 1.0
    remat: bool = False
    custom_vjp: bool = True
    stem_s2d: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.base, channels = make_dla(self.base_name, dtype=self.dtype,
                                       s2d=self.stem_s2d)
        self.channels = channels
        self.first_level = int(np.log2(self.down_ratio))
        self.out_channels = channels[self.first_level]
        self.dla_up = DLAUp(channels[self.first_level:], use_dcn=self.use_dcn,
                            shift_clamp=self.shift_clamp, remat=self.remat,
                            custom_vjp=self.custom_vjp, dtype=self.dtype)
        n_final = self.last_level - self.first_level
        self.ida_up = IDAUp(self.out_channels,
                            [2 ** i for i in range(n_final)],
                            use_dcn=self.use_dcn,
                            shift_clamp=self.shift_clamp, remat=self.remat,
                            custom_vjp=self.custom_vjp, dtype=self.dtype)

    def __call__(self, x, train: bool = True, packed: bool = False):
        levels = self.base(x, train, packed=packed)
        agg = self.dla_up(levels[self.first_level:], train)
        n_final = self.last_level - self.first_level
        y = list(agg[:n_final])
        y = self.ida_up(y, 0, n_final, train)
        return y[-1]
