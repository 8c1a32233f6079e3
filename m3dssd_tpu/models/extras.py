"""Capability-parity module grab-bag (M6).

TPU-native equivalents of the reference's vendored module collection
(ref:model/module/module.py, ref:model/module/utils.py,
ref:model/module/weight_init.py) — RetinaNet-style heads and anchor
utilities, weight-standardized convolution, a configurable Conv-Norm-Act
block, EfficientNet-style same-padding conv + Swish, and init helpers.
None of these are used by the trained reference configuration (verified by
grep upstream); they are provided, tested, for API-surface parity so a
reference user migrating custom experiments finds the same toolbox.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import BN_MOMENTUM


# ---------------------------------------------------------------------------
# RetinaNet-style box utilities (ref:model/module/module.py:9-67)
# ---------------------------------------------------------------------------

def bbox_transform_retina(boxes, deltas,
                          mean=(0.0, 0.0, 0.0, 0.0),
                          std=(0.1, 0.1, 0.2, 0.2)):
    """Decode center/size deltas against anchor boxes [N, 4] xyxy
    (ref:model/module/module.py:9-49 BBoxTransform)."""
    boxes = jnp.asarray(boxes)
    deltas = jnp.asarray(deltas)
    mean = jnp.asarray(mean, boxes.dtype)
    std = jnp.asarray(std, boxes.dtype)
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    dx = deltas[..., 0] * std[0] + mean[0]
    dy = deltas[..., 1] * std[1] + mean[1]
    dw = deltas[..., 2] * std[2] + mean[2]
    dh = deltas[..., 3] * std[3] + mean[3]

    pred_ctr_x = ctr_x + dx * widths
    pred_ctr_y = ctr_y + dy * heights
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights
    return jnp.stack([pred_ctr_x - 0.5 * pred_w, pred_ctr_y - 0.5 * pred_h,
                      pred_ctr_x + 0.5 * pred_w, pred_ctr_y + 0.5 * pred_h],
                     axis=-1)


def clip_boxes(boxes, im_h: int, im_w: int):
    """Clamp xyxy boxes to the image (ref:model/module/module.py:52-67)."""
    return jnp.stack([jnp.clip(boxes[..., 0], 0, im_w),
                      jnp.clip(boxes[..., 1], 0, im_h),
                      jnp.clip(boxes[..., 2], 0, im_w),
                      jnp.clip(boxes[..., 3], 0, im_h)], axis=-1)


class RetinaRegressionHead(nn.Module):
    """4-conv tower -> num_anchors*4 regression map, flattened [B, N, 4]
    (ref:model/module/module.py:70-101)."""
    num_anchors: int = 9
    feature_size: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(4):
            x = nn.relu(nn.Conv(self.feature_size, (3, 3), padding=[(1, 1)] * 2,
                                dtype=self.dtype)(x))
        x = nn.Conv(self.num_anchors * 4, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype)(x)
        B, H, W, _ = x.shape
        return x.reshape(B, H * W * self.num_anchors, 4)


class RetinaClassificationHead(nn.Module):
    """4-conv tower -> per-anchor class sigmoids, flattened [B, N, C]; final
    bias set so initial P(fg) == prior (ref:model/module/module.py:104-142,
    bias_init_with_prob :556)."""
    num_anchors: int = 9
    num_classes: int = 80
    prior: float = 0.01
    feature_size: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(4):
            x = nn.relu(nn.Conv(self.feature_size, (3, 3), padding=[(1, 1)] * 2,
                                dtype=self.dtype)(x))
        bias = bias_init_with_prob(self.prior)
        x = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                    padding=[(1, 1)] * 2,
                    bias_init=nn.initializers.constant(bias),
                    dtype=self.dtype)(x)
        x = nn.sigmoid(x)
        B, H, W, _ = x.shape
        return x.reshape(B, H * W * self.num_anchors, self.num_classes)


# ------------------------------------------------------- pyramid anchors
# (ref:model/module/module.py:145-273)

def retina_generate_anchors(base_size=16, ratios=None, scales=None):
    """Base anchor templates [A, 4] centered at the origin
    (ref:model/module/module.py:183-214)."""
    if ratios is None:
        ratios = np.array([0.5, 1.0, 2.0])
    if scales is None:
        scales = np.array([2 ** 0, 2 ** (1.0 / 3.0), 2 ** (2.0 / 3.0)])
    num = len(ratios) * len(scales)
    anchors = np.zeros((num, 4))
    anchors[:, 2:] = base_size * np.tile(scales, (2, len(ratios))).T
    areas = anchors[:, 2] * anchors[:, 3]
    anchors[:, 2] = np.sqrt(areas / np.repeat(ratios, len(scales)))
    anchors[:, 3] = anchors[:, 2] * np.repeat(ratios, len(scales))
    anchors[:, 0::2] -= np.tile(anchors[:, 2] * 0.5, (2, 1)).T
    anchors[:, 1::2] -= np.tile(anchors[:, 3] * 0.5, (2, 1)).T
    return anchors


def shift_anchors(shape: Tuple[int, int], stride: int, anchors: np.ndarray):
    """Tile base anchors over a feature grid (ref:module.py:252-273)."""
    shift_x = (np.arange(0, shape[1]) + 0.5) * stride
    shift_y = (np.arange(0, shape[0]) + 0.5) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
    A = anchors.shape[0]
    K = shifts.shape[0]
    out = anchors.reshape(1, A, 4) + shifts.reshape(1, K, 4).transpose(1, 0, 2)
    return out.reshape(K * A, 4)


def anchors_for_shape(image_shape, pyramid_levels=(3, 4, 5, 6, 7),
                      ratios=None, scales=None):
    """All anchors for an image across FPN levels (ref:module.py:217-250)."""
    image_shape = np.array(image_shape[:2])
    all_anchors = []
    for lvl in pyramid_levels:
        stride = 2 ** lvl
        shape = (image_shape + stride - 1) // stride
        a = retina_generate_anchors(base_size=2 ** (lvl + 2), ratios=ratios,
                                    scales=scales)
        all_anchors.append(shift_anchors(tuple(shape), stride, a))
    return np.concatenate(all_anchors, axis=0)


# ---------------------------------------------------------------------------
# Weight-standardized conv + ConvModule (ref:model/module/module.py:276-516)
# ---------------------------------------------------------------------------

class ConvWS(nn.Module):
    """Conv with weight standardization: kernel whitened over (kh, kw, cin)
    per output channel before the convolution (ref:module.py:276-323)."""
    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, x.shape[-1], self.features))
        mean = w.mean(axis=(0, 1, 2), keepdims=True)
        std = w.std(axis=(0, 1, 2), keepdims=True) + self.eps
        w = (w - mean) / std
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=[(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class ConvModule(nn.Module):
    """Configurable conv-norm-activation block (ref:module.py:405-516):
    conv type ('conv'|'conv_ws'), norm ('bn'|'gn'|None), activation
    ('relu'|'leaky'|None), in any order via `order`."""
    features: int
    kernel: int = 3
    stride: int = 1
    conv_type: str = "conv"
    norm: Optional[str] = "bn"
    act: Optional[str] = "relu"
    gn_groups: int = 32
    order: Sequence[str] = ("conv", "norm", "act")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        def do_conv(v):
            if self.conv_type == "conv_ws":
                return ConvWS(self.features, self.kernel, self.stride,
                              use_bias=self.norm is None, dtype=self.dtype)(v)
            return nn.Conv(self.features, (self.kernel, self.kernel),
                           strides=(self.stride, self.stride),
                           padding=[(self.kernel // 2,) * 2] * 2,
                           use_bias=self.norm is None, dtype=self.dtype)(v)

        def do_norm(v):
            if self.norm == "bn":
                return nn.BatchNorm(use_running_average=not train,
                                    momentum=BN_MOMENTUM, dtype=self.dtype)(v)
            if self.norm == "gn":
                return nn.GroupNorm(num_groups=self.gn_groups,
                                    dtype=self.dtype)(v)
            return v

        def do_act(v):
            if self.act == "relu":
                return nn.relu(v)
            if self.act == "leaky":
                return nn.leaky_relu(v, negative_slope=0.01)
            return v

        ops = {"conv": do_conv, "norm": do_norm, "act": do_act}
        for name in self.order:
            x = ops[name](x)
        return x


# ---------------------------------------------------------------------------
# EfficientNet helpers (ref:model/module/utils.py:32-158)
# ---------------------------------------------------------------------------

def swish(x):
    """x * sigmoid(x) (ref:utils.py:32-53; the 'memory-efficient' autograd
    trick is unnecessary under XLA — the VJP is fused for free)."""
    return x * nn.sigmoid(x)


class Conv2dSamePadding(nn.Module):
    """TensorFlow-style SAME-padding conv (ref:utils.py:103-157): output is
    ceil(in / stride) with asymmetric padding when needed."""
    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride), padding="SAME",
                       use_bias=self.use_bias, dtype=self.dtype)(x)


def drop_connect(x, rng, rate: float, deterministic: bool):
    """Per-sample stochastic depth (ref:utils.py:80-91)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask.astype(x.dtype) / keep


def round_filters(filters: int, width_coefficient: Optional[float],
                  depth_divisor: int = 8, min_depth: Optional[int] = None):
    """EfficientNet channel scaling (ref:utils.py:56-69)."""
    if not width_coefficient:
        return filters
    filters *= width_coefficient
    min_depth = min_depth or depth_divisor
    new_filters = max(min_depth,
                      int(filters + depth_divisor / 2)
                      // depth_divisor * depth_divisor)
    if new_filters < 0.9 * filters:
        new_filters += depth_divisor
    return int(new_filters)


# ---------------------------------------------------------------------------
# Init helpers (ref:model/module/weight_init.py, module.py:518-557)
# ---------------------------------------------------------------------------

def bias_init_with_prob(prior_prob: float) -> float:
    """Bias so that sigmoid(bias) == prior_prob (ref:module.py:556-557)."""
    return float(-math.log((1 - prior_prob) / prior_prob))


def xavier_init(rng, shape, gain: float = 1.0, distribution: str = "normal"):
    """Xavier/Glorot init over HWIO conv or [in, out] dense shapes."""
    fan_in = int(np.prod(shape[:-1]))
    fan_out = int(shape[-1]) * (int(np.prod(shape[:-2])) if len(shape) > 2
                                else 1)
    if distribution == "uniform":
        a = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(rng, shape, minval=-a, maxval=a)
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return jax.random.normal(rng, shape) * std


def kaiming_init(rng, shape, a: float = 0.0, mode: str = "fan_out",
                 distribution: str = "normal"):
    """He init (ref:module.py:540-553)."""
    fan_in = int(np.prod(shape[:-1]))
    fan_out = int(shape[-1]) * (int(np.prod(shape[:-2])) if len(shape) > 2
                                else 1)
    fan = fan_out if mode == "fan_out" else fan_in
    gain = math.sqrt(2.0 / (1 + a ** 2))
    if distribution == "uniform":
        bound = gain * math.sqrt(3.0 / fan)
        return jax.random.uniform(rng, shape, minval=-bound, maxval=bound)
    return jax.random.normal(rng, shape) * (gain / math.sqrt(fan))
