#!/usr/bin/env python
"""Microbench: fused detection-head tower groups vs separate towers.

The RPN head (models/rpn.py) runs 12 regression towers of
conv1x1(256->256) -> BN -> LReLU -> conv1x1(256->256) -> BN -> LReLU ->
conv1x1(256->A), grouped by input feature map (4 on `feats`, 2 on
`feats2d`, 4 on `feats3d`). Separate towers re-read the shared input G
times and emit G narrow (A=36 -> 128-lane padded) final matmuls. The
fused formulation concatenates the first convs into ONE [256 -> G*256]
matmul, runs the hidden layer as a grouped einsum ([*,G,256] x
[G,256,256] batched matmul — block-diagonal, same FLOPs), and the final
layer as [G,256,A]. Mathematically identical modulo BN batch-stat
grouping (per-channel stats are unchanged by concatenation).

This probe measures both formulations standalone (throwaway params, not
the model tree) at the real eval/train shapes to decide whether the
plumbing (param-tree-preserving fused execution) is worth it.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    C, A = 256, 36
    rs = np.random.default_rng(0)

    def mk(shape, dtype=jnp.bfloat16):
        return jnp.asarray(rs.normal(size=shape, scale=0.05), dtype)

    def lrelu(x):
        return jnp.where(x > 0, x, 0.01 * x)

    def make_params(G):
        sep = []
        for _ in range(G):
            sep.append(dict(
                w1=mk((C, C)), b1=mk((C,)),
                s1=mk((C,), jnp.float32), t1=mk((C,), jnp.float32),
                w2=mk((C, C)), b2=mk((C,)),
                s2=mk((C,), jnp.float32), t2=mk((C,), jnp.float32),
                w3=mk((C, A)), b3=mk((A,))))
        fused = dict(
            w1=jnp.concatenate([t["w1"] for t in sep], axis=1),   # [C, G*C]
            b1=jnp.concatenate([t["b1"] for t in sep]),
            s1=jnp.concatenate([t["s1"] for t in sep]),
            t1=jnp.concatenate([t["t1"] for t in sep]),
            w2=jnp.stack([t["w2"] for t in sep]),                 # [G, C, C]
            b2=jnp.stack([t["b2"] for t in sep]),
            s2=jnp.stack([t["s2"] for t in sep]),
            t2=jnp.stack([t["t2"] for t in sep]),
            w3=jnp.stack([t["w3"] for t in sep]),                 # [G, C, A]
            b3=jnp.stack([t["b3"] for t in sep]))
        return sep, fused

    def bn_eval(x, s, t):
        return (x.astype(jnp.float32) * s + t).astype(x.dtype)

    def bn_train(x, s, t, axes):
        xf = x.astype(jnp.float32)
        m = jnp.mean(xf, axis=axes)
        v = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(m)
        return (((xf - m) * jax.lax.rsqrt(v + 1e-5)) * s + t).astype(x.dtype)

    def tower_sep(x, t, train):
        bn = (lambda h, s, tt: bn_train(h, s, tt, (0, 1, 2))) if train \
            else bn_eval
        h = jnp.einsum("bhwc,cd->bhwd", x, t["w1"],
                       preferred_element_type=jnp.bfloat16) + t["b1"]
        h = lrelu(bn(h, t["s1"], t["t1"]))
        h = jnp.einsum("bhwc,cd->bhwd", h, t["w2"],
                       preferred_element_type=jnp.bfloat16) + t["b2"]
        h = lrelu(bn(h, t["s2"], t["t2"]))
        return jnp.einsum("bhwc,ca->bhwa", h, t["w3"],
                          preferred_element_type=jnp.bfloat16) + t["b3"]

    def run_sep(x, sep, train):
        return sum(jnp.sum(tower_sep(x, t, train).astype(jnp.float32))
                   for t in sep)

    def run_fused(x, f, train):
        G = f["w2"].shape[0]
        B, H, W, _ = x.shape
        h = jnp.einsum("bhwc,cd->bhwd", x, f["w1"],
                       preferred_element_type=jnp.bfloat16) + f["b1"]
        h = lrelu(bn_train(h, f["s1"], f["t1"], (0, 1, 2)) if train
                  else bn_eval(h, f["s1"], f["t1"]))
        h = h.reshape(B, H, W, G, C)
        h = jnp.einsum("bhwgc,gcd->bhwgd", h, f["w2"],
                       preferred_element_type=jnp.bfloat16) + f["b2"]
        h = lrelu(bn_train(h, f["s2"], f["t2"], (0, 1, 2)) if train
                  else bn_eval(h, f["s2"], f["t2"]))
        out = jnp.einsum("bhwgc,gca->bhwga", h, f["w3"],
                         preferred_element_type=jnp.bfloat16) + f["b3"]
        return jnp.sum(out.astype(jnp.float32))

    def bench(fn, *a):
        fn(*a).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = fn(*a)
        r.block_until_ready()
        return (time.perf_counter() - t0) / args.iters * 1e3

    # group sizes as in the model: 4 towers on feats, 4 on feats3d, 2 on
    # feats2d — probe the dominant G=4 case
    for G in (4, 2):
        sep, fused = make_params(G)
        for tag, shape in (("eval 512x1760", (8, 64, 220, C)),
                           ("train 384x1280", (8, 48, 160, C))):
            x = mk(shape)
            train = tag.startswith("train")
            if train:
                f_sep = jax.jit(jax.grad(
                    lambda xx: run_sep(xx, sep, True).astype(jnp.float32)))
                f_fus = jax.jit(jax.grad(
                    lambda xx: run_fused(xx, fused, True).astype(jnp.float32)))
            else:
                f_sep = jax.jit(lambda xx: run_sep(xx, sep, False))
                f_fus = jax.jit(lambda xx: run_fused(xx, fused, False))
            ms_sep = bench(f_sep, x)
            ms_fus = bench(f_fus, x)
            print(f"G={G} {tag:15s} separate {ms_sep:7.3f} ms   "
                  f"fused {ms_fus:7.3f} ms   ({ms_sep / ms_fus:.2f}x)",
                  flush=True)


if __name__ == "__main__":
    main()
