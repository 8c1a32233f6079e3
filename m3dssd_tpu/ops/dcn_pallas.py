"""Fused shift-decomposed deformable conv as a Pallas TPU kernel.

`dcn_v2_shift` (ops/dcn.py) decomposes a clamped-offset DCNv2 into
triangle-weighted static shifts + per-tap matmuls. Under XLA the shifted-MAC
producer streams from HBM and the MXU idles (~14% utilization measured at
the neck shapes). This kernel fuses the whole tap loop into VMEM:

    per output row y (grid = (B, H)):
      * double-buffered DMA of the (2P+1)-row padded-x slab into VMEM,
      * for each of the K*K taps: 2D triangle-weighted accumulation of the
        (2R+1)^2 statically shifted slab slices (VPU, in VMEM),
      * assemble the taps into one [W, K*K*C] matrix and hit the MXU with a
        single big-K dot against the [K*K*C, Cout] weight.

Measured on TPU v5e vs the XLA `dcn_v2_shift` (bf16, clamp=1):
    [8, 64, 220, 256] -> 256:  5.86 ms vs 8.87 ms   (1.51x)
    [8, 32, 110, 512] -> 512:  4.31 ms vs 5.67 ms   (1.32x)
    row-chunk variants TH=2 (slower: more VMEM pressure) and TH=4
    (VMEM OOM) were measured and rejected; TH=1 is the sweet spot.

Forward only — the backward stays on the XLA path (autodiff of
`dcn_v2_shift`, whose per-tap matmul grad measured 2x faster than the
im2col form).

STATUS: NOT wired into the model. In-model the pallas_call boundary breaks
XLA's fusion/layout choices around it (backbone conv time tripled;
end-to-end detect regressed 13.9 -> 18.9 ms bs=1 despite the per-kernel
win — both operand-transpose and native-layout operand variants measured).
Kept + parity-tested as the strongest candidate to re-evaluate on future
XLA/Mosaic versions; `models/necks.py:DCN` documents the decision.

Numerics: identical math to `dcn_v2_shift`, accumulating the shifted MACs
in the feature dtype exactly like the XLA op; bf16 outputs differ only by
rounding (max |diff| ~0.03 on unit-scale inputs; parity-tested in
interpret mode on CPU).

Equivalent of ref:model/DCNv2/src/cuda/dcn_v2_im2col_cuda.cu (bilinear
im2col + GEMM) for the bounded-offset configuration.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supported(x_shape, kernel: int, stride: int, dilation: int) -> bool:
    """Whether the fused kernel applies to this configuration."""
    return (jax.default_backend() == "tpu" and stride == 1 and dilation == 1
            and kernel % 2 == 1)


@functools.partial(jax.jit, static_argnames=("clamp", "interpret"))
def dcn_v2_shift_pallas(x, offset, mask, weight, bias=None, *,
                        clamp: float = 1.0, interpret: bool = False):
    """Fused `dcn_v2_shift` forward (stride=1, dilation=1, padding=K//2).

    x [B,H,W,C]; offset [B,H,W,K*K,2] (dy,dx); mask [B,H,W,K*K];
    weight [K,K,C,Cout]; bias [Cout] or None. Returns [B,H,W,Cout] in
    x.dtype. NOT differentiable — eval-mode forwards only.
    """
    B, H, W, C = x.shape
    Kh, Kw, _, Cout = weight.shape
    KK = Kh * Kw
    pad = Kh // 2
    R = int(math.ceil(clamp))
    P = pad + R
    S = 2 * P + 1                        # slab rows per output row
    Wp = W + 2 * P
    Wa = ((Wp + 7) // 8) * 8             # DMA slices need 8-aligned extents
    xp = jnp.pad(x, [(0, 0), (P, P), (P, P + (Wa - Wp)), (0, 0)])
    D = list(range(-R, R + 1))
    # operands stay in their NATIVE [B,H,W,KK] layout (a host-side
    # transpose to channel-major measured as graph-wide layout churn at the
    # pallas_call boundary); per-tap vectors are read as lane slices
    o_y = offset[..., 0]                                 # [B,H,W,KK]
    o_x = offset[..., 1]
    w2 = weight.reshape(KK * C, Cout)

    def kernel(xp_hbm, oy_ref, ox_ref, mask_ref, w_ref, b_ref, out_ref,
               xs, sem):
        b = pl.program_id(0)
        y = pl.program_id(1)
        ny = pl.num_programs(1)
        slot = jax.lax.rem(y, 2)

        @pl.when(y == 0)
        def _():
            pltpu.make_async_copy(xp_hbm.at[b, pl.ds(0, S)], xs.at[0],
                                  sem.at[0]).start()

        @pl.when(y + 1 < ny)
        def _():
            pltpu.make_async_copy(xp_hbm.at[b, pl.ds(y + 1, S)],
                                  xs.at[(slot + 1) % 2],
                                  sem.at[(slot + 1) % 2]).start()

        pltpu.make_async_copy(xp_hbm.at[b, pl.ds(y, S)], xs.at[slot],
                              sem.at[slot]).wait()

        cols = []
        for k in range(KK):
            ky, kx = k // Kw, k % Kw
            # lane slice -> [W, 1]: already sublane-major for the broadcast
            oy = jnp.clip(oy_ref[0, 0, :, k:k + 1], -clamp, clamp)
            ox = jnp.clip(ox_ref[0, 0, :, k:k + 1], -clamp, clamp)
            acc = jnp.zeros((W, C), x.dtype)
            for dy in D:
                wy = jnp.maximum(0., 1. - jnp.abs(oy - dy))
                for dx in D:
                    wx = jnp.maximum(0., 1. - jnp.abs(ox - dx))
                    xsl = xs[slot, P - pad + ky + dy,
                             P - pad + kx + dx:P - pad + kx + dx + W, :]
                    # weight product in f32 [W,1] (bf16 minor-dim insertion
                    # is unsupported by Mosaic), cast for the FMA
                    w = (wy * wx).astype(x.dtype)
                    acc = acc + w * xsl
            mk = mask_ref[0, 0, :, k:k + 1].astype(x.dtype)
            cols.append(acc * mk)
        cols = jnp.concatenate(cols, axis=1)             # [W, KK*C]
        out = jax.lax.dot_general(cols, w_ref[:, :], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        out = out + b_ref[:].astype(jnp.float32)
        out_ref[0, 0] = out.astype(out_ref.dtype)

    bias_in = (jnp.zeros((Cout,), jnp.float32) if bias is None
               else bias.astype(jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, W, KK), lambda b, y: (b, y, 0, 0)),
            pl.BlockSpec((1, 1, W, KK), lambda b, y: (b, y, 0, 0)),
            pl.BlockSpec((1, 1, W, KK), lambda b, y: (b, y, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, W, Cout), lambda b, y: (b, y, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, S, Wa, C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, o_y.astype(jnp.float32), o_x.astype(jnp.float32),
      mask.astype(jnp.float32), w2.astype(x.dtype), bias_in)
