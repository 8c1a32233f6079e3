#!/usr/bin/env python
"""Feasibility microbench: int8 conv/matmul on the MXU vs bf16.

TPU v5e quotes 394 int8 TOPS vs 197 bf16 TFLOP/s. This probe measures
whether XLA actually lowers int8 `lax.conv_general_dilated` / `dot_general`
(with `preferred_element_type=int32`) at the ~2x rate at the shapes this
framework runs, INCLUDING the quantize/dequantize overhead a real
quantized eval path would pay. Decides whether an int8 backbone mode is
worth building (results recorded in PERF.md).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, iters=50):
    import jax
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    gen = np.random.default_rng(0)
    dn = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))

    # representative shapes: neck level (64x220), backbone mid (128x440)
    for (B, H, W, C, K, Cout) in [(8, 64, 220, 256, 3, 256),
                                  (8, 128, 440, 128, 3, 128),
                                  (1, 64, 220, 256, 3, 256)]:
        x = gen.normal(size=(B, H, W, C)).astype(np.float32)
        w = (gen.normal(size=(K, K, C, Cout)) / np.sqrt(K * K * C)
             ).astype(np.float32)
        xb = jnp.asarray(x, jnp.bfloat16)
        wb = jnp.asarray(w, jnp.bfloat16)
        xi = jnp.asarray(np.clip(np.round(x * 16), -127, 127), jnp.int8)
        wi = jnp.asarray(np.clip(np.round(w * 256), -127, 127), jnp.int8)

        conv_bf = jax.jit(lambda a, b: lax.conv_general_dilated(
            a, b, (1, 1), "SAME", dimension_numbers=dn))
        conv_i8 = jax.jit(lambda a, b: lax.conv_general_dilated(
            a, b, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32))

        # end-to-end quantized layer: bf16 activations -> dynamic per-tensor
        # quantize -> int8 conv -> dequantize to bf16 (the overhead a real
        # int8 eval path pays per layer)
        def q_layer(a, b):
            s = jnp.max(jnp.abs(a)) / 127.0
            ai = jnp.clip(jnp.round(a.astype(jnp.float32) / s),
                          -127, 127).astype(jnp.int8)
            o = lax.conv_general_dilated(
                ai, b, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return (o.astype(jnp.float32) * (s / 256.0)).astype(jnp.bfloat16)
        q_layer = jax.jit(q_layer)

        t_bf = timeit(lambda: conv_bf(xb, wb))
        t_i8 = timeit(lambda: conv_i8(xi, wi))
        t_q = timeit(lambda: q_layer(xb, wi))
        fl = 2 * B * H * W * C * K * K * Cout
        print(f"[{B},{H},{W},{C}]x{K}x{K}->{Cout}: "
              f"bf16 {1e3*t_bf:.3f} ms ({fl/t_bf/1e12:.1f} T/s)  "
              f"int8 {1e3*t_i8:.3f} ms ({fl/t_i8/1e12:.1f} T/s)  "
              f"quant-layer {1e3*t_q:.3f} ms  "
              f"i8 speedup {t_bf/t_i8:.2f}x  e2e {t_bf/t_q:.2f}x")

    # matmul check (towers / 1x1 convs)
    M, Kd, N = 8 * 64 * 220, 256, 256
    a = gen.normal(size=(M, Kd)).astype(np.float32)
    b = gen.normal(size=(Kd, N)).astype(np.float32)
    ab, bb = jnp.asarray(a, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16)
    ai = jnp.asarray(np.clip(np.round(a * 16), -127, 127), jnp.int8)
    bi = jnp.asarray(np.clip(np.round(b * 16), -127, 127), jnp.int8)
    mm_bf = jax.jit(lambda u, v: u @ v)
    mm_i8 = jax.jit(lambda u, v: lax.dot_general(
        u, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    t_bf = timeit(lambda: mm_bf(ab, bb))
    t_i8 = timeit(lambda: mm_i8(ai, bi))
    fl = 2 * M * Kd * N
    print(f"matmul [{M},{Kd}]x[{Kd},{N}]: bf16 {1e3*t_bf:.3f} ms "
          f"({fl/t_bf/1e12:.1f} T/s)  int8 {1e3*t_i8:.3f} ms "
          f"({fl/t_i8/1e12:.1f} T/s)  speedup {t_bf/t_i8:.2f}x")


if __name__ == "__main__":
    main()
