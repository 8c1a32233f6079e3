"""Modulated deformable convolution v2 (DCNv2) for TPU.

TPU-native redesign of the reference CUDA op
(ref:model/DCNv2/src/cuda/dcn_v2_im2col_cuda.cu — bilinear im2col + GEMM;
ref:model/DCNv2/src/dcn_v2_cuda.c — driver). Instead of translating the
CUDA thread loops, the computation is expressed as:

    1. one fused bilinear gather producing the deformed im2col tensor
       [B, Ho*Wo, K*K*Cin]  (4 `take_along_axis` gathers on the VPU), then
    2. a single large matmul with the [K*K*Cin, Cout] weight on the MXU.

XLA differentiates the gathers (scatter-add backward), which reproduces the
reference's hand-written col2im/coordinate gradients
(ref:dcn_v2_im2col_cuda.cu:50-150) for free and serves as the numerical
oracle for the Pallas kernel in `dcn_pallas.py`.

Layouts (TPU-idiomatic NHWC):
    x       [B, H, W, Cin]
    offset  [B, Ho, Wo, K*K, 2]   per-tap (dy, dx) in *pixels*
    mask    [B, Ho, Wo, K*K]      modulation in [0, 1]
    weight  [Kh, Kw, Cin, Cout]
    bias    [Cout]
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _bilinear_weights_and_indices(py, px, H, W):
    """Corner indices, validity-masked bilinear weights for sample points.

    Follows the reference's per-corner bounds handling
    (ref:dcn_v2_im2col_cuda.cu:18-48): each of the 4 corners contributes only
    if it lies inside the feature map; the sample point itself may be
    fractional/outside.
    """
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    ly = py - y0
    lx = px - x0
    hy = 1.0 - ly
    hx = 1.0 - lx

    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    corners = []
    for (dy, wy) in ((0, hy), (1, ly)):
        yy = y0i + dy
        vy = (yy >= 0) & (yy <= H - 1)
        for (dx, wx) in ((0, hx), (1, lx)):
            xx = x0i + dx
            vx = (xx >= 0) & (xx <= W - 1)
            w = wy * wx * (vy & vx)
            idx = jnp.clip(yy, 0, H - 1) * W + jnp.clip(xx, 0, W - 1)
            corners.append((idx, w))
    return corners


def bilinear_sample(x, py, px):
    """Bilinearly sample feature map x [B,H,W,C] at points (py, px) [B,*S].

    Returns [B, *S, C]. Out-of-bounds corners contribute zero.
    """
    B, H, W, C = x.shape
    sshape = py.shape[1:]
    n = 1
    for s in sshape:
        n *= s
    py = py.reshape(B, n)
    px = px.reshape(B, n)
    xf = x.reshape(B, H * W, C)

    out = jnp.zeros((B, n, C), dtype=x.dtype)
    for idx, w in _bilinear_weights_and_indices(py, px, H, W):
        v = jnp.take_along_axis(xf, idx[..., None], axis=1)
        out = out + v * w[..., None].astype(x.dtype)
    return out.reshape((B,) + sshape + (C,))


@functools.partial(jax.jit, static_argnames=("stride", "padding", "dilation"))
def dcn_v2(x, offset, mask, weight, bias=None, *, stride: int = 1,
           padding: int = 1, dilation: int = 1):
    """Modulated deformable conv v2 forward (see module docstring for layouts).

    Equivalent to the reference `DCNv2(input, offset, mask)` module call
    (ref:model/DCNv2/dcn_v2.py:14-42) with explicit offsets/mask.
    """
    B, H, W, Cin = x.shape
    Kh, Kw, Cin_w, Cout = weight.shape
    assert Cin == Cin_w, (Cin, Cin_w)
    KK = Kh * Kw
    _, Ho, Wo, KK_o, two = offset.shape
    assert KK_o == KK and two == 2, (offset.shape, KK)

    # base sampling grid: output position * stride - padding + tap * dilation
    ys = (jnp.arange(Ho, dtype=x.dtype) * stride - padding)
    xs = (jnp.arange(Wo, dtype=x.dtype) * stride - padding)
    ky = jnp.arange(Kh, dtype=x.dtype) * dilation
    kx = jnp.arange(Kw, dtype=x.dtype) * dilation
    tap_y = (ky[:, None] + jnp.zeros((Kh, Kw), x.dtype)).reshape(KK)
    tap_x = (kx[None, :] + jnp.zeros((Kh, Kw), x.dtype)).reshape(KK)

    py = ys[None, :, None, None] + tap_y[None, None, None, :] + offset[..., 0]
    px = xs[None, None, :, None] + tap_x[None, None, None, :] + offset[..., 1]
    # shapes [B, Ho, Wo, KK]

    sampled = bilinear_sample(x, py, px)              # [B, Ho, Wo, KK, Cin]
    sampled = sampled * mask[..., None].astype(x.dtype)

    cols = sampled.reshape(B, Ho * Wo, KK * Cin)
    w2 = weight.reshape(KK * Cin, Cout)
    # accumulate in >= fp32 on the MXU (fp64 when running a gradcheck)
    acc_t = jnp.promote_types(x.dtype, jnp.float32)
    out = jax.lax.dot_general(cols, w2, (((2,), (0,)), ((), ())),
                              preferred_element_type=acc_t)
    out = out.reshape(B, Ho, Wo, Cout).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def dcn_v2_output_size(H, W, K, stride, padding, dilation) -> Tuple[int, int]:
    eff = dilation * (K - 1) + 1
    return ((H + 2 * padding - eff) // stride + 1,
            (W + 2 * padding - eff) // stride + 1)


def dcn_v2_reference(x, offset, mask, weight, bias=None, *, stride=1,
                     padding=1, dilation=1):
    """Slow pure-numpy oracle (loop form of the CUDA kernel semantics).

    Used only in tests to validate `dcn_v2` (mirrors the role of the
    double-precision CUDA kernels in ref:model/DCNv2/test.py).
    """
    import numpy as np
    x = np.asarray(x, dtype=np.float64)
    offset = np.asarray(offset, dtype=np.float64)
    mask = np.asarray(mask, dtype=np.float64)
    weight = np.asarray(weight, dtype=np.float64)
    B, H, W, Cin = x.shape
    Kh, Kw, _, Cout = weight.shape
    _, Ho, Wo, KK, _ = offset.shape

    def sample(b, py, px):
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        ly, lx = py - y0, px - x0
        val = np.zeros(Cin)
        for dy, wy in ((0, 1 - ly), (1, ly)):
            for dx, wx in ((0, 1 - lx), (1, lx)):
                yy, xx = y0 + dy, x0 + dx
                if 0 <= yy < H and 0 <= xx < W:
                    val += wy * wx * x[b, yy, xx]
        return val

    out = np.zeros((B, Ho, Wo, Cout))
    for b in range(B):
        for ho in range(Ho):
            for wo in range(Wo):
                acc = np.zeros(Cout)
                for i in range(Kh):
                    for j in range(Kw):
                        k = i * Kw + j
                        py = ho * stride - padding + i * dilation + offset[b, ho, wo, k, 0]
                        px = wo * stride - padding + j * dilation + offset[b, ho, wo, k, 1]
                        v = sample(b, py, px) * mask[b, ho, wo, k]
                        acc += v @ weight[i, j]
                out[b, ho, wo] = acc
    if bias is not None:
        out += np.asarray(bias)
    return out
