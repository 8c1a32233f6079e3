"""Deep Layer Aggregation backbones (Flax linen, NHWC).

Re-derivation of ref:model/pose_dla_dcn.py:93-441 — BasicBlock / Bottleneck /
BottleneckX blocks, recursive Tree/Root aggregation, and the dla34 / dla60 /
dla102 variants plus the depth-aware dla34_depth (row-banded LocalConv2d).
"""

from __future__ import annotations

from typing import Any, Callable, List, Sequence, Tuple

import jax.numpy as jnp
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


class DLA(nn.Module):
    """The DLA trunk producing 6 feature levels at strides 1,2,4,8,16,32
    (ref:model/pose_dla_dcn.py:330-397)."""
    levels: Sequence[int]
    channels: Sequence[int]
    block: Callable = BasicBlock
    residual_root: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        ch = self.channels
        # base layer: 7x7 conv
        x = nn.Conv(ch[0], (7, 7), padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, name="base_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         dtype=self.dtype, name="base_bn")(x)
        x = leaky_relu(x)

        outputs = []
        # level0/level1: plain conv stacks
        for i in range(self.levels[0]):
            x = ConvBNAct(ch[0], 3, 1, dtype=self.dtype)(x, train)
        outputs.append(x)
        for i in range(self.levels[1]):
            x = ConvBNAct(ch[1], 3, 2 if i == 0 else 1, dtype=self.dtype)(x, train)
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


def make_dla(name: str, dtype=jnp.float32) -> Tuple[DLA, List[int]]:
    if name not in DLA_VARIANTS:
        raise KeyError(f"unknown DLA variant '{name}'; have {sorted(DLA_VARIANTS)}")
    spec = DLA_VARIANTS[name]
    return (DLA(levels=spec["levels"], channels=spec["channels"],
                block=spec["block"], residual_root=spec["residual_root"],
                dtype=dtype),
            list(spec["channels"]))
