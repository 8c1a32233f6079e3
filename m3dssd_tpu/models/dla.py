"""Deep Layer Aggregation backbones (Flax linen, NHWC).

Re-derivation of ref:model/pose_dla_dcn.py:93-441 — BasicBlock / Bottleneck /
BottleneckX blocks, recursive Tree/Root aggregation, and the dla34 / dla60 /
dla102 variants plus the depth-aware dla34_depth (row-banded LocalConv2d).
"""

from __future__ import annotations

from typing import Any, Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import BN_MOMENTUM, ConvBNAct, LocalConv2d, leaky_relu, max_pool


class BasicBlock(nn.Module):
    """Two 3x3 convs + residual (ref:model/pose_dla_dcn.py:93-121)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = True):
        if residual is None:
            residual = x
        out = ConvBNAct(self.planes, 3, self.stride, self.dilation,
                        use_bias=True, dtype=self.dtype)(x, train)
        out = ConvBNAct(self.planes, 3, 1, self.dilation, use_bias=True,
                        act=False, dtype=self.dtype)(out, train)
        return leaky_relu(out + residual)


class DepthBlock(nn.Module):
    """BasicBlock with a row-banded second conv (ref:model/pose_dla_dcn.py:123-160)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    num_rows: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = True):
        if residual is None:
            residual = x
        out = ConvBNAct(self.planes, 3, self.stride, self.dilation,
                        dtype=self.dtype)(x, train)
        out = LocalConv2d(self.num_rows, self.planes, 3, dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train,
                           momentum=BN_MOMENTUM, dtype=self.dtype)(out)
        return leaky_relu(out + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck, expansion 2 (ref:model/pose_dla_dcn.py:162-204)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    expansion: int = 2
    cardinality: int = 1  # >1 gives BottleneckX (ref:207-248)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = True):
        if residual is None:
            residual = x
        bottle = self.planes // self.expansion if self.cardinality == 1 \
            else self.planes * self.cardinality // 32
        out = ConvBNAct(bottle, 1, dtype=self.dtype)(x, train)
        pad = self.dilation
        out = nn.Conv(bottle, (3, 3), strides=(self.stride, self.stride),
                      padding=[(pad, pad), (pad, pad)],
                      kernel_dilation=(self.dilation, self.dilation),
                      use_bias=False,
                      feature_group_count=self.cardinality,
                      dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train,
                           momentum=BN_MOMENTUM, dtype=self.dtype)(out)
        out = leaky_relu(out)
        out = ConvBNAct(self.planes, 1, act=False, dtype=self.dtype)(out, train)
        return leaky_relu(out + residual)


class Root(nn.Module):
    """Aggregation node: concat children -> 1x1 conv (+opt. residual)
    (ref:model/pose_dla_dcn.py:251-269)."""
    features: int
    residual: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, children, train: bool = True):
        x = jnp.concatenate(children, axis=-1)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=BN_MOMENTUM, dtype=self.dtype)(x)
        if self.residual:
            x = x + children[0]
        return leaky_relu(x)


class Tree(nn.Module):
    """Recursive hierarchical aggregation (ref:model/pose_dla_dcn.py:272-327)."""
    levels: int
    block: Callable
    in_channels: int
    out_channels: int
    stride: int = 1
    level_root: bool = False
    root_dim: int = 0
    root_residual: bool = False
    dilation: int = 1
    dtype: Any = jnp.float32

    def setup(self):
        root_dim = self.root_dim
        if root_dim == 0:
            root_dim = 2 * self.out_channels
        if self.level_root:
            root_dim += self.in_channels
        self._root_dim = root_dim

        if self.levels == 1:
            self.tree1 = self.block(self.out_channels, stride=self.stride,
                                    dilation=self.dilation, dtype=self.dtype)
            self.tree2 = self.block(self.out_channels, stride=1,
                                    dilation=self.dilation, dtype=self.dtype)
            self.root = Root(self.out_channels, self.root_residual,
                             dtype=self.dtype)
        else:
            self.tree1 = Tree(self.levels - 1, self.block, self.in_channels,
                              self.out_channels, stride=self.stride,
                              root_dim=0, root_residual=self.root_residual,
                              dilation=self.dilation, dtype=self.dtype)
            self.tree2 = Tree(self.levels - 1, self.block, self.out_channels,
                              self.out_channels,
                              root_dim=root_dim + self.out_channels,
                              root_residual=self.root_residual,
                              dilation=self.dilation, dtype=self.dtype)
        if self.in_channels != self.out_channels:
            self.project = ConvBNAct(self.out_channels, 1, act=False,
                                     dtype=self.dtype)
        else:
            self.project = None

    def __call__(self, x, residual=None, children=None, train: bool = True):
        children = [] if children is None else list(children)
        bottom = max_pool(x, self.stride, self.stride) if self.stride > 1 else x
        residual = self.project(bottom, train) if self.project is not None else bottom
        if self.level_root:
            children.append(bottom)
        x1 = self.tree1(x, residual=residual, train=train)
        if self.levels == 1:
            x2 = self.tree2(x1, train=train)
            out = self.root([x2, x1] + children, train=train)
        else:
            children.append(x1)
            out = self.tree2(x1, children=children, train=train)
        return out


# ---------------------------------------------------------------------------
# Space-to-depth stem
#
# The DLA stem (7x7 base conv + one 3x3 stride-1 level-0 conv) runs at FULL
# input resolution with 16 channels. On TPU a 16-channel map pads to 128
# vector lanes, so these layers are layout-bound, not FLOP-bound (~5 ms of a
# 21 ms flagship forward at 512x1760 — PERF.md). The classic TPU fix
# (ResNet space-to-depth) applies EXACTLY here: pack 2x2 input pixels into
# channels ([H,W,C] -> [H/2,W/2,4C]) and rewrite each stride-1 conv as a
# phase-aware conv on the packed map with a statically re-indexed kernel.
# The math is identical — each packed-kernel entry is a relabeled entry of
# the canonical kernel — so the PARAMETER TREE IS UNCHANGED (canonical
# shapes/names; torch checkpoint import untouched) and outputs match to
# accumulation order. Phase packing convention: packed channel
# (2a+b)*C + c == full-res pixel (2i+a, 2j+b, c).
# ---------------------------------------------------------------------------


def space_to_depth_np(x):
    """Host-side `space_to_depth` (numpy): pack input images BEFORE upload.

    The device-side pack costs ~1 ms/img at 512x1760 (the layout copy XLA
    inserts between the raw-image layout and the stem conv's operand
    layout); packing in the input pipeline makes it free. Exact relayout —
    same values, same downstream math.

    Per-phase slice assignment: ~2x faster than the 6D reshape/transpose
    copy in numpy (83 vs 153 ms for an 86 MB batch on this host)."""
    import numpy as np_
    B, H, W, C = x.shape
    out = np_.empty((B, H // 2, W // 2, 4 * C), x.dtype)
    for a in (0, 1):
        for b in (0, 1):
            out[..., (2 * a + b) * C:(2 * a + b + 1) * C] = x[:, a::2, b::2]
    return out


def space_to_depth(x):
    """[B, H, W, C] -> [B, H/2, W/2, 4C] with phase-major channel packing.

    All measured in-model at 512x1760 (the cost is dominated by the layout
    copy XLA inserts to satisfy the consumer conv's operand layout):
    6D reshape/transpose ~2.5 ms < strided-slice concat ~3.7 ms <
    4 phase-strided stride-2 convs (PhaseStemConv) ~5.3 ms. Standalone the
    transpose is 0.02 ms — the residual cost is the raw-image input
    contract, not this op."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def depth_to_space(x, C: int):
    """Inverse of `space_to_depth` (canonical channel count C)."""
    B, H2, W2, _ = x.shape
    x = x.reshape(B, H2, W2, 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H2, 2 * W2, C)


def _phase_kernel_map(K: int, Ci: int, Co: int, stride: int):
    """Static index maps turning a canonical [K,K,Ci,Co] kernel into its
    phase-packed equivalent.

    stride=1: packed conv [Kp,Kp,4Ci,4Co] (packed in, packed out), pad Kp//2.
    stride=2: packed conv [Kp,Kp,4Ci,Co] (packed in, canonical out),
              pad (Kp-1, 0) per spatial axis.

    Returns (src, tgt, kp_shape, pad) where kp_flat = zeros.at[tgt].add(
    k_flat[src]); every (tap, phase) pair of the canonical conv maps to a
    unique packed entry, derived from: full-res row 2i + a + u - K//2 lives
    at packed row i + di, slot ay, with 2*di + ay = a + u - K//2.
    """
    half = K // 2
    out_phases = (0, 1) if stride == 1 else (0,)

    def split(r):  # r = a + u - half -> (di, ay)
        return r >> 1, r & 1

    lo = min(split(a + 0 - half)[0] for a in out_phases)
    hi = max(split(a + K - 1 - half)[0] for a in out_phases)
    Kp = hi - lo + 1

    Cin_p, Cout_p = 4 * Ci, (4 * Co if stride == 1 else Co)
    src, tgt = [], []
    for a in out_phases:
        for b in out_phases:
            for u in range(K):
                di, ay = split(a + u - half)
                for v in range(K):
                    dj, ax = split(b + v - half)
                    for c in range(Ci):
                        ci_p = (2 * ay + ax) * Ci + c
                        for o in range(Co):
                            co_p = (2 * a + b) * Co + o if stride == 1 else o
                            src.append(((u * K + v) * Ci + c) * Co + o)
                            tgt.append((((di - lo) * Kp + (dj - lo)) * Cin_p
                                        + ci_p) * Cout_p + co_p)
    pad = ((-lo, hi), (-lo, hi)) if stride == 1 else ((-lo, hi), (-lo, hi))
    return (np.asarray(src, np.int32), np.asarray(tgt, np.int32),
            (Kp, Kp, Cin_p, Cout_p), pad)


class PhaseConv(nn.Module):
    """Conv over a phase-packed map, parameterized by the CANONICAL kernel.

    Declares the same {kernel[, bias]} params as the nn.Conv it replaces;
    the packed kernel is built per call by a static re-indexing scatter
    (a few KB — negligible).
    """
    features: int     # canonical Cout
    kernel: int       # canonical K
    cin: int          # canonical Cin
    stride: int = 1   # canonical stride (1 -> packed output, 2 -> canonical)
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp):
        K, Ci, Co = self.kernel, self.cin, self.features
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (K, K, Ci, Co))
        src, tgt, kp_shape, pad = _phase_kernel_map(K, Ci, Co, self.stride)
        n = int(np.prod(kp_shape))
        kp = jnp.zeros((n,), kern.dtype).at[tgt].add(kern.reshape(-1)[src])
        kp = kp.reshape(kp_shape).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            xp.astype(self.dtype), kp, window_strides=(1, 1), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (Co,))
            reps = 4 if self.stride == 1 else 1
            y = y + jnp.tile(bias, reps).astype(self.dtype)
        return y


class PhaseStemConv(nn.Module):
    """Canonical stride-1 KxK conv over the RAW input producing a
    phase-packed output — as 4 phase-shifted stride-2 convs (one per output
    phase), concatenated along channels in phase-major order.

    Physically building the packed input (space_to_depth reshape+transpose)
    measured ~2.5 ms/img at 512x1760: the (2,2,3) inner-dim relayout is
    vector-lane hostile. Strided convs read the raw image in its natural
    layout instead. Param tree identical to the nn.Conv it replaces."""
    features: int
    cin: int
    kernel: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        K, Ci, Co = self.kernel, self.cin, self.features
        half = K // 2
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (K, K, Ci, Co)).astype(self.dtype)
        outs = []
        for a in (0, 1):
            for b in (0, 1):
                # out[i] = sum_u k[u] x[2i - pt + u] with pt = half - a
                pads = ((half - a, K - 2 - half + a),
                        (half - b, K - 2 - half + b))
                outs.append(jax.lax.conv_general_dilated(
                    x.astype(self.dtype), kern, (2, 2), pads,
                    dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return jnp.concatenate(outs, axis=-1)


class ConvBNActS2D(nn.Module):
    """ConvBNAct twin operating on a phase-packed map (same param tree:
    Conv_0 + BatchNorm_0). BatchNorm pools statistics across the 4 phase
    slots — exactly the canonical full-resolution statistics."""
    features: int
    cin: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp, train: bool = True):
        y = PhaseConv(self.features, self.kernel, self.cin, self.stride,
                      dtype=self.dtype, name="Conv_0")(xp)
        B, Hp, Wp, _ = y.shape
        packed_out = self.stride == 1
        if packed_out:
            y = y.reshape(B, Hp, Wp, 4, self.features)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         dtype=self.dtype, name="BatchNorm_0")(y)
        if self.act:
            y = leaky_relu(y)
        if packed_out:
            y = y.reshape(B, Hp, Wp, 4 * self.features)
        return y


class DLA(nn.Module):
    """The DLA trunk producing 6 feature levels at strides 1,2,4,8,16,32
    (ref:model/pose_dla_dcn.py:330-397)."""
    levels: Sequence[int]
    channels: Sequence[int]
    block: Callable = BasicBlock
    residual_root: bool = False
    s2d: bool = True   # space-to-depth stem (exact; see block comment above)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, packed: bool = False):
        """packed=True: `x` is already space-to-depth packed host-side
        ([B, H/2, W/2, 4*Cin], see `space_to_depth_np`); requires s2d."""
        ch = self.channels
        if packed:
            B, H2, W2, C4 = x.shape
            H, W, cin = 2 * H2, 2 * W2, C4 // 4
            assert self.s2d and self.levels[0] == 1 and self.levels[1] == 1
        else:
            B, H, W, cin = x.shape
        use_s2d = (packed or (self.s2d and H % 2 == 0 and W % 2 == 0
                              and self.levels[0] == 1 and self.levels[1] == 1))
        outputs = []
        if use_s2d:
            xp = x if packed else space_to_depth(x)
            xp = PhaseConv(ch[0], 7, cin, dtype=self.dtype,
                           name="base_conv")(xp)
            H2, W2 = H // 2, W // 2
            xp = xp.reshape(B, H2, W2, 4, ch[0])
            xp = nn.BatchNorm(use_running_average=not train,
                              momentum=BN_MOMENTUM, dtype=self.dtype,
                              name="base_bn")(xp)
            xp = leaky_relu(xp).reshape(B, H2, W2, 4 * ch[0])
            xp = ConvBNActS2D(ch[0], ch[0], 3, 1, dtype=self.dtype,
                              name="ConvBNAct_0")(xp, train)
            # full-res level-0 view; a pure relayout, DCE'd when unused
            # (DLASeg consumes levels[first_level:] only)
            outputs.append(depth_to_space(xp, ch[0]))
            x = ConvBNActS2D(ch[1], ch[0], 3, 2, dtype=self.dtype,
                             name="ConvBNAct_1")(xp, train)
            outputs.append(x)
        else:
            # base layer: 7x7 conv
            x = nn.Conv(ch[0], (7, 7), padding=[(3, 3), (3, 3)],
                        use_bias=False, dtype=self.dtype, name="base_conv")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, dtype=self.dtype,
                             name="base_bn")(x)
            x = leaky_relu(x)

            # level0/level1: plain conv stacks
            for i in range(self.levels[0]):
                x = ConvBNAct(ch[0], 3, 1, dtype=self.dtype)(x, train)
            outputs.append(x)
            for i in range(self.levels[1]):
                x = ConvBNAct(ch[1], 3, 2 if i == 0 else 1,
                              dtype=self.dtype)(x, train)
            outputs.append(x)
        # level2..level5: trees
        x = Tree(self.levels[2], self.block, ch[1], ch[2], stride=2,
                 level_root=False, root_residual=self.residual_root,
                 dtype=self.dtype)(x, train=train)
        outputs.append(x)
        for lvl in range(3, 6):
            x = Tree(self.levels[lvl], self.block, ch[lvl - 1], ch[lvl],
                     stride=2, level_root=True,
                     root_residual=self.residual_root,
                     dtype=self.dtype)(x, train=train)
            outputs.append(x)
        return outputs


# ---------------------------------------------------------------------------
# Variants (ref:model/pose_dla_dcn.py:419-441)
# ---------------------------------------------------------------------------

import functools

DLA_VARIANTS = {
    "dla34": dict(levels=[1, 1, 1, 2, 2, 1],
                  channels=[16, 32, 64, 128, 256, 512],
                  block=BasicBlock, residual_root=False),
    "dla34_depth": dict(levels=[1, 1, 1, 2, 2, 1],
                        channels=[16, 32, 64, 128, 256, 512],
                        block=DepthBlock, residual_root=False),
    "dla60": dict(levels=[1, 1, 1, 2, 3, 1],
                  channels=[16, 32, 128, 256, 512, 1024],
                  block=Bottleneck, residual_root=False),
    "dla102": dict(levels=[1, 1, 1, 3, 4, 1],
                   channels=[16, 32, 128, 256, 512, 1024],
                   block=Bottleneck, residual_root=True),
    "dla102x": dict(levels=[1, 1, 1, 3, 4, 1],
                    channels=[16, 32, 128, 256, 512, 1024],
                    block=functools.partial(Bottleneck, cardinality=32),
                    residual_root=True),
}


def make_dla(name: str, dtype=jnp.float32, s2d: bool = True
             ) -> Tuple[DLA, List[int]]:
    if name not in DLA_VARIANTS:
        raise KeyError(f"unknown DLA variant '{name}'; have {sorted(DLA_VARIANTS)}")
    spec = DLA_VARIANTS[name]
    return (DLA(levels=spec["levels"], channels=spec["channels"],
                block=spec["block"], residual_root=spec["residual_root"],
                s2d=s2d, dtype=dtype),
            list(spec["channels"]))
