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

    Coordinates and interpolation weights are computed in float32 regardless
    of the feature dtype (bf16 has only 8 mantissa bits — integer pixel
    coordinates above 256 are not even representable); the HBM-heavy gather
    itself moves data in the feature dtype.
    """
    B, H, W, C = x.shape
    sshape = py.shape[1:]
    n = 1
    for s in sshape:
        n *= s
    coord_t = jnp.promote_types(py.dtype, jnp.float32)
    py = py.reshape(B, n).astype(coord_t)
    px = px.reshape(B, n).astype(coord_t)
    # fold the batch into the row index: one flat (non-batched) gather.
    # XLA's batched-gather lowering is ~2.7x slower per row on TPU (measured
    # at bs=8, 512x1760); the flat form keeps the bs=1 fast path at any batch
    xf = x.reshape(B * H * W, C)
    base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None]

    out = jnp.zeros((B, n, C), dtype=x.dtype)
    for idx, w in _bilinear_weights_and_indices(py, px, H, W):
        v = jnp.take(xf, (idx + base).reshape(-1), axis=0,
                     indices_are_sorted=False, unique_indices=False)
        out = out + v.reshape(B, n, C) * w[..., None].astype(x.dtype)
    return out.reshape((B,) + sshape + (C,))


def bilinear_sample_rows(x, b_idx, py, px):
    """Bilinearly sample x [B,H,W,C] at M *scattered* points that each carry
    their own batch index: b_idx [M] int, py/px [M, S] pixel coords.
    Returns [M, S, C]. Same per-corner out-of-bounds semantics as
    `bilinear_sample`; same flat-row-gather formulation (the batch offset is
    folded into the row index).

    This is the sparse-correction workhorse: the top-M confident-position
    alignment path (models/align.py) gathers M*S*4 rows instead of
    B*H*W*KK*4 — the full-map gather is the detect hot spot (PERF.md).
    """
    B, H, W, C = x.shape
    M, S = py.shape
    coord_t = jnp.promote_types(py.dtype, jnp.float32)
    py = py.astype(coord_t)
    px = px.astype(coord_t)
    xf = x.reshape(B * H * W, C)
    base = (jnp.clip(b_idx.astype(jnp.int32), 0, B - 1) * (H * W))[:, None]

    out = jnp.zeros((M, S, C), dtype=x.dtype)
    for idx, w in _bilinear_weights_and_indices(py, px, H, W):
        v = jnp.take(xf, (idx + base).reshape(-1), axis=0, mode="clip")
        out = out + v.reshape(M, S, C) * w[..., None].astype(x.dtype)
    return out


def bilinear_sample_packed(x, py, px):
    """`bilinear_sample` computed with ONE row gather instead of four.

    The 2x2 corner neighborhood of every source position is pre-packed into
    the channel axis (a zero-padded copy + 4 static shifts — pure streaming
    writes), so each sample point needs a single `take_along_axis` row of
    4*C channels instead of 4 rows of C. On TPU the gather is DMA-granularity
    bound (PERF.md): 4x wider rows move the same bytes in 1/4 the transfers.

    Numerically identical to `bilinear_sample` (same per-corner out-of-bounds
    handling: invalid corners get zero weight, and the padded border makes
    the clamped fetches read zeros anyway).

    MEASURED SLOWER than plain `bilinear_sample` at align-module shapes
    (512x1760 flagship): the wide-row gather runs ~30% slower per byte and
    the packing concatenate costs another ~1.7 ms/img in layout copies.
    Kept (and parity-tested) as a documented probe for future XLA versions.
    """
    B, H, W, C = x.shape
    sshape = py.shape[1:]
    n = 1
    for s in sshape:
        n *= s
    coord_t = jnp.promote_types(py.dtype, jnp.float32)
    py = py.reshape(B, n).astype(coord_t)
    px = px.reshape(B, n).astype(coord_t)

    # packed[y', x'] = the 2x2 patch at padded coords (y', x'), y' = y + 1
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    Hp, Wp = H + 1, W + 1
    packed = jnp.concatenate([
        jax.lax.slice(xp, (0, dy, dx, 0), (B, dy + Hp, dx + Wp, C))
        for dy in (0, 1) for dx in (0, 1)], axis=-1)
    packed = packed.reshape(B, Hp * Wp, 4 * C)

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    ly = py - y0
    lx = px - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    idx = (jnp.clip(y0i + 1, 0, H) * Wp + jnp.clip(x0i + 1, 0, W))
    rows = jnp.take_along_axis(packed, idx[..., None], axis=1)  # [B,n,4C]
    rows = rows.reshape(B, n, 4, C)

    wy = [1.0 - ly, ly]
    wx = [1.0 - lx, lx]
    vy = [(y0i >= 0) & (y0i <= H - 1), (y0i + 1 >= 0) & (y0i + 1 <= H - 1)]
    vx = [(x0i >= 0) & (x0i <= W - 1), (x0i + 1 >= 0) & (x0i + 1 <= W - 1)]
    w = jnp.stack([wy[cy] * wx[cx] * (vy[cy] & vx[cx])
                   for cy in (0, 1) for cx in (0, 1)], axis=-1)   # [B,n,4]
    out = jnp.sum(rows * w[..., None].astype(x.dtype), axis=2)
    return out.reshape((B,) + sshape + (C,))


def bilinear_sample_paired(x, py, px):
    """`bilinear_sample` with half the gather ops: the two x-adjacent corners
    of each sample point are fetched as ONE contiguous 2-column block
    (lax.gather slice_sizes=(2, C)), doubling the contiguous read size.

    Numerically identical to `bilinear_sample` (same per-corner OOB
    handling); preferred on TPU where gather throughput is limited by the
    per-row transfer size.
    """
    B, H, W, C = x.shape
    sshape = py.shape[1:]
    n = 1
    for s in sshape:
        n *= s
    coord_t = jnp.promote_types(py.dtype, jnp.float32)
    py = py.reshape(B, n).astype(coord_t)
    px = px.reshape(B, n).astype(coord_t)
    xf = x.reshape(B, H * W, C)

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    ly = py - y0
    lx = px - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    # block start column: clamp so [sx, sx+1] stays in-row
    sx = jnp.clip(x0i, 0, W - 2)
    i_left = jnp.clip(x0i - sx, 0, 1)         # corner x0 within the block
    i_right = jnp.clip(x0i + 1 - sx, 0, 1)    # corner x0+1 within the block
    vx0 = (x0i >= 0) & (x0i <= W - 1)
    vx1 = (x0i + 1 >= 0) & (x0i + 1 <= W - 1)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def gather_blocks(starts):
        # starts [B, n] flat row-start indices -> [B, n, 2, C]
        idx = jnp.stack([starts, jnp.zeros_like(starts)], axis=-1)  # [B,n,2]
        return jax.vmap(lambda xb, ib: jax.lax.gather(
            xb, ib, dnums, slice_sizes=(2, C),
            mode=jax.lax.GatherScatterMode.CLIP))(xf, idx)

    out = jnp.zeros((B, n, C), dtype=x.dtype)
    for dy, wy in ((0, 1.0 - ly), (1, ly)):
        yy = y0i + dy
        vy = (yy >= 0) & (yy <= H - 1)
        ryc = jnp.clip(yy, 0, H - 1)
        starts = ryc * W + sx                       # [B, n]
        blocks = gather_blocks(starts)              # [B, n, 2, C]
        v_left = jnp.take_along_axis(
            blocks, i_left[..., None, None], axis=2)[:, :, 0]
        v_right = jnp.take_along_axis(
            blocks, i_right[..., None, None], axis=2)[:, :, 0]
        w_left = (wy * (1.0 - lx) * (vy & vx0)).astype(x.dtype)
        w_right = (wy * lx * (vy & vx1)).astype(x.dtype)
        out = out + v_left * w_left[..., None] + v_right * w_right[..., None]
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
    # in >= float32 (see bilinear_sample dtype note); float64 under gradcheck
    f32 = jnp.promote_types(offset.dtype, jnp.float32)
    ys = (jnp.arange(Ho, dtype=f32) * stride - padding)
    xs = (jnp.arange(Wo, dtype=f32) * stride - padding)
    ky = jnp.arange(Kh, dtype=f32) * dilation
    kx = jnp.arange(Kw, dtype=f32) * dilation
    tap_y = (ky[:, None] + jnp.zeros((Kh, Kw), f32)).reshape(KK)
    tap_x = (kx[None, :] + jnp.zeros((Kh, Kw), f32)).reshape(KK)

    off = offset.astype(f32)
    py = ys[None, :, None, None] + tap_y[None, None, None, :] + off[..., 0]
    px = xs[None, None, :, None] + tap_x[None, None, None, :] + off[..., 1]
    # shapes [B, Ho, Wo, KK]

    # Gather strategy (all measured, PERF.md): 4 plain row gathers win.
    # Corner-packed single gather (2KB rows): gather 30% slower per byte
    # + 1.7 ms/img packing cost. Paired-corner lax.gather slice blocks:
    # 3x slower (XLA lowers multi-row slice gathers poorly).
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


def _shift_geometry(clamp: float, Kh: int):
    """(pad, window radius R, slab padding P, knot offsets D) for the
    shifted-MAC decomposition. Triangle basis on knots [-R..R] exactly
    reproduces linear interpolation for |off| <= clamp <= R: knot R+1 would
    get weight max(0, 1-|off-(R+1)|), nonzero only if off > R >= clamp —
    impossible. (2R+1)^2 shifted slices per tap, not (2R+2)^2."""
    import math as _math
    pad = Kh // 2
    R = int(_math.ceil(clamp))
    return pad, R, pad + R + 1, list(range(-R, R + 1))


def _shift_out(x, off, mask, weight, clamp: float):
    """Shifted-MAC forward (no bias): off is the CLIPPED f32 offset.

    Shared by the autodiff path and the custom-VJP primal so both compute
    the identical graph.
    """
    B, H, W, C = x.shape
    Kh, Kw, _, Cout = weight.shape
    KK = Kh * Kw
    pad, R, P, D = _shift_geometry(clamp, Kh)
    xp = jnp.pad(x, [(0, 0), (P, P), (P, P), (0, 0)])
    acc_t = jnp.promote_types(x.dtype, jnp.float32)
    w2 = weight.reshape(KK, C, Cout)
    # per-tap matmul accumulation: materializing the [B, H*W, KK*C] im2col
    # tensor (jnp.stack) measured ~2.6 ms/img of dynamic-update-slice +
    # layout copies at 512x1760; KK smaller matmuls fuse the shifted-MAC
    # input directly into the MXU feed and never touch HBM with the columns
    out = jnp.zeros((B, H * W, Cout), acc_t)
    for k in range(KK):
        ky, kx = k // Kw, k % Kw
        oy = off[..., k, 0]
        ox = off[..., k, 1]
        mk = mask[..., k].astype(jnp.float32)
        # fold the modulation mask into the triangle weights: acc*m ==
        # sum((wy*wx*m) * slice) exactly — the per-term weight product is a
        # [B,H,W] op, while the separate mask multiply was a full [B,H,W,C]
        # pass per tap (and another in backward)
        wy = [jnp.maximum(0.0, 1.0 - jnp.abs(oy - d)) * mk for d in D]
        wx = [jnp.maximum(0.0, 1.0 - jnp.abs(ox - d)) for d in D]
        acc = jnp.zeros((B, H, W, C), x.dtype)
        for iy, dy in enumerate(D):
            ys = P - pad + ky + dy
            for ix, dx in enumerate(D):
                xs = P - pad + kx + dx
                w = (wy[iy] * wx[ix]).astype(x.dtype)
                acc = acc + w[..., None] * jax.lax.slice(
                    xp, (0, ys, xs, 0), (B, ys + H, xs + W, C))
        colk = acc.reshape(B, H * W, C)
        out = out + jax.lax.dot_general(colk, w2[k], (((2,), (0,)), ((), ())),
                                        preferred_element_type=acc_t)
    return out.reshape(B, H, W, Cout).astype(x.dtype)


# ---- subgradient conventions, matched to JAX autodiff (probed on this
# jax version): d|u|/du at 0 is +1 (select(u >= 0, g, -g)); max/min ties
# split 0.5; clip at an exact boundary therefore passes 0.5.
def _dabs(u):
    return jnp.where(u >= 0, 1.0, -1.0)


def _dmax0(t):
    """d max(t, 0)/dt evaluated from t (0.5 exactly at the kink)."""
    t32 = t.astype(jnp.float32)
    return (t32 > 0).astype(jnp.float32) + 0.5 * (t32 == 0)


def _dtri(o, d):
    """d/do of the triangle weight max(0, 1 - |o - d|)."""
    u = o - d
    return -_dmax0(1.0 - jnp.abs(u)) * _dabs(u)


def _dclip(o, clamp):
    """d clip(o, -clamp, clamp)/do (1 inside, 0 outside, 0.5 at the edge)."""
    a = jnp.abs(o.astype(jnp.float32))
    return (a < clamp).astype(jnp.float32) + 0.5 * (a == clamp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _dcn_shift_core(clamp, x, offset, mask, weight):
    off = jnp.clip(offset.astype(jnp.float32), -clamp, clamp)
    return _shift_out(x, off, mask, weight, clamp)


def _dcn_shift_core_fwd(clamp, x, offset, mask, weight):
    out = _dcn_shift_core(clamp, x, offset, mask, weight)
    # residuals are the INPUTS only — the backward recomputes the per-tap
    # columns instead of storing the 9x-wide [B,H,W,KK*C] im2col activations
    # XLA's autodiff keeps live for dW (the bs=12 HBM cliff, PERF.md)
    return out, (x, offset, mask, weight)


def _dcn_shift_core_bwd(clamp, res, g):
    """Hand-written transpose of the shifted-MAC forward.

    Replaces XLA's generic per-term transpose chain (the TPU analogue of the
    reference's hand-written col2im/coordinate backward,
    ref:model/DCNv2/src/cuda/dcn_v2_im2col_cuda.cu:50-150):

      dL/dx       — the REVERSE static shifts of the triangle-weighted
                    cotangent: streaming lax.pad adds, no scatter.
      dL/doffset  — reuses one per-(iy,ix) C-dot table t = <gk, slice>
                    per tap (9 reductions) instead of autodiff's separate
                    per-term weight cotangents, then combines with the
                    triangle derivative in [B,H,W] space.
      dL/dmask    — same t table, triangle weights without the mask fold.
      dL/dweight  — per-tap recomputed columns against g on the MXU.
    """
    x, offset, mask, weight = res
    B, H, W, C = x.shape
    Kh, Kw, _, Cout = weight.shape
    KK = Kh * Kw
    pad, R, P, D = _shift_geometry(clamp, Kh)
    f32 = jnp.float32
    off_raw = offset.astype(f32)
    off = jnp.clip(off_raw, -clamp, clamp)
    xp = jnp.pad(x, [(0, 0), (P, P), (P, P), (0, 0)])
    gf = g.reshape(B, H * W, Cout)
    w2 = weight.reshape(KK, C, Cout)
    zero = jnp.zeros((), x.dtype)

    dx = jnp.zeros((B, H, W, C), x.dtype)
    dW, doff, dmk_l = [], [], []
    for k in range(KK):
        ky, kx = k // Kw, k % Kw
        oy = off[..., k, 0]
        ox = off[..., k, 1]
        mk = mask[..., k].astype(f32)
        wy = [jnp.maximum(0.0, 1.0 - jnp.abs(oy - d)) for d in D]
        wx = [jnp.maximum(0.0, 1.0 - jnp.abs(ox - d)) for d in D]
        # cotangent of this tap's column block: [B, HW, C]
        gk = jax.lax.dot_general(gf, w2[k], (((2,), (1,)), ((), ())),
                                 preferred_element_type=f32)
        gk = gk.reshape(B, H, W, C).astype(x.dtype)

        # one pass over the (2R+1)^2 shifted slices: the C-dot table t for
        # the offset/mask grads AND the recomputed columns for dW share the
        # slice reads (XLA CSEs the slice; both consumers fuse onto it)
        t = [[None] * len(D) for _ in D]
        acc = jnp.zeros((B, H, W, C), x.dtype)
        for iy, dy in enumerate(D):
            ys = P - pad + ky + dy
            for ix, dxs in enumerate(D):
                xs = P - pad + kx + dxs
                sl = jax.lax.slice(xp, (0, ys, xs, 0), (B, ys + H, xs + W, C))
                t[iy][ix] = jnp.einsum("bhwc,bhwc->bhw", gk, sl,
                                       preferred_element_type=f32)
                w = (mk * wy[iy] * wx[ix]).astype(x.dtype)
                acc = acc + w[..., None] * sl
        dWk = jax.lax.dot_general(acc.reshape(B, H * W, C), gf,
                                  (((0, 1), (0, 1)), ((), ())),
                                  preferred_element_type=f32)
        dW.append(dWk)

        dmk = sum(wy[iy] * wx[ix] * t[iy][ix]
                  for iy in range(len(D)) for ix in range(len(D)))
        doy = mk * sum(_dtri(oy, d) * wx[ix] * t[iy][ix]
                       for iy, d in enumerate(D) for ix in range(len(D)))
        dox = mk * sum(wy[iy] * _dtri(ox, d) * t[iy][ix]
                       for iy in range(len(D)) for ix, d in enumerate(D))
        dmk_l.append(dmk)
        doff.append(jnp.stack([doy, dox], axis=-1))

        # dL/dx: out reads x[h + sy], so dx[m] accumulates z[m - sy] with
        # z = w * gk — a shift expressed as ONE lax.pad (negative high side
        # trims), streaming adds, no scatter
        for iy, dy in enumerate(D):
            ay = ((mk * wy[iy]).astype(x.dtype))[..., None] * gk
            sy = ky + dy - pad
            for ix, dxs in enumerate(D):
                z = (wx[ix].astype(x.dtype))[..., None] * ay
                sx = kx + dxs - pad
                dx = dx + jax.lax.pad(
                    z, zero, [(0, 0, 0), (sy, -sy, 0), (sx, -sx, 0),
                              (0, 0, 0)])

    doffset = (jnp.stack(doff, axis=3) * _dclip(off_raw, clamp)) \
        .astype(offset.dtype)
    dmask = jnp.stack(dmk_l, axis=-1).astype(mask.dtype)
    dweight = jnp.stack(dW, 0).reshape(Kh, Kw, C, Cout).astype(weight.dtype)
    return dx, doffset, dmask, dweight


_dcn_shift_core.defvjp(_dcn_shift_core_fwd, _dcn_shift_core_bwd)


@functools.partial(jax.jit, static_argnames=("clamp", "custom_vjp"))
def dcn_v2_shift(x, offset, mask, weight, bias=None, *, clamp: float = 1.0,
                 custom_vjp: bool = False):
    """Deformable conv v2 with offsets clamped to [-clamp, clamp], computed
    as static shifted MACs — NO gather.

    For bounded offsets, each tap's bilinear sample lies in a fixed
    (2*ceil(clamp)+2)^2 window, so the gather decomposes into statically
    shifted slices weighted by triangle functions of the offset: fully
    XLA-fusible streaming reads instead of 512-byte random DMA (the gather
    path runs at ~5% of HBM peak — PERF.md). Measured 1.7x faster at neck
    shapes for clamp=1, and the backward is shifts (no scatter-add).

    Exact (to rounding) vs `dcn_v2` whenever |offset| <= clamp. The clamp is
    an architectural choice for LEARNED-offset layers (zero-init, small in
    practice — the DCN accelerator literature clamps for the same locality
    reason); derived-offset alignment layers keep the gather path.

    custom_vjp=True: the backward runs the hand-written transpose in
    `_dcn_shift_core_bwd` — input-only residuals (no stored im2col columns)
    and a shared C-dot table for the offset/mask grads. Grad-equality vs the
    autodiff path (including at the subgradient ties) is tested in
    tests/test_dcn.py. Default False by measurement (2026-08-19 controlled
    A/B at flagship 384x1280 bs=8: autodiff 195.3 ms/step vs 209.6 — the dW
    column recompute costs real FLOPs while the stored-column transpose
    fits HBM); True is the HBM-headroom knob (won 6.4% at bs=12, PERF.md).
    A/B: conf.dcn_custom_vjp / train_ab variants `cvjp_light`/`ad_vjp`.

    stride=1, dilation=1, padding=K//2 only (the neck DCN configuration).
    """
    if custom_vjp:
        out = _dcn_shift_core(float(clamp), x, offset, mask, weight)
    else:
        off = jnp.clip(offset.astype(jnp.float32), -clamp, clamp)
        out = _shift_out(x, off, mask, weight, float(clamp))
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
