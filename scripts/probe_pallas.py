#!/usr/bin/env python
"""Re-probe the fused Pallas shift-DCN (ops/dcn_pallas.py) on the current
XLA/Mosaic toolchain — both in isolation at the neck shapes and wired
in-model (monkeypatched into necks.DCN) for the end-to-end detect path.

PERF.md records the round-1/2 verdict: 1.3-1.5x faster in isolation, but
in-model the pallas_call boundary broke XLA fusion/layout around it
(detect 13.9 -> 18.9 ms). Run this after toolchain updates to re-decide.

Usage: python scripts/probe_pallas.py [--in_model]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, iters=20):
    import jax
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1000:8.2f} ms")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--in_model", action="store_true",
                   help="also time the full detect path with the Pallas "
                        "kernel monkeypatched into necks.DCN (fresh compile)")
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from m3dssd_tpu.ops.dcn import dcn_v2_shift
    from m3dssd_tpu.ops.dcn_pallas import dcn_v2_shift_pallas

    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    # ---------------------------------------------------------- isolation
    for (B, H, W, C, Cout) in [(8, 64, 220, 256, 256),
                               (8, 32, 110, 512, 512)]:
        x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
        off = jnp.asarray(rng.normal(size=(B, H, W, 9, 2)) * 0.5,
                          jnp.bfloat16)
        m = jnp.asarray(rng.uniform(0, 1, size=(B, H, W, 9)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, C, Cout)) * 0.05,
                        jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(Cout,)), jnp.bfloat16)
        shape = f"[{B},{H},{W},{C}]->{Cout}"
        # reduce to a scalar inside the jit: through the remote tunnel,
        # block_until_ready on a large device array returned early in
        # measurement (0.03 ms readings); a scalar sync is unambiguous
        import jax as _jax
        f_xla = _jax.jit(lambda *a: jnp.sum(
            dcn_v2_shift(*a, clamp=1.0).astype(jnp.float32)))
        f_pl = _jax.jit(lambda *a: jnp.sum(
            dcn_v2_shift_pallas(*a, clamp=1.0).astype(jnp.float32)))
        t_xla = timeit(f"xla dcn_v2_shift   {shape}",
                       lambda: f_xla(x, off, m, w, b), args.iters)
        t_pl = timeit(f"pallas fused       {shape}",
                      lambda: f_pl(x, off, m, w, b), args.iters)
        print(f"  -> pallas/xla speedup: {t_xla / t_pl:.2f}x")

    if not args.in_model:
        return

    # ------------------------------------------------------------ in-model
    from __graft_entry__ import _flagship_conf
    from m3dssd_tpu.anchors import locate_anchors
    from m3dssd_tpu.inference.detect import make_detector
    from m3dssd_tpu.models import build
    import m3dssd_tpu.models.necks as necks

    conf = _flagship_conf((512, 1760))
    rois = locate_anchors(conf.anchors, conf.feat_size, conf.feat_stride)

    def run_detect(label):
        model = build(conf)
        v = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 64, 128, 3), jnp.float32), train=False)
        det = make_detector(conf, rois, model, packed_input=True)
        from m3dssd_tpu.models.dla import space_to_depth_np
        x = jnp.asarray(space_to_depth_np(
            rng.normal(size=(1, 512, 1760, 3)).astype(np.float32)))
        return timeit(label, lambda: det(v["params"],
                                         v.get("batch_stats", {}), x,
                                         np.float32(1.0)), args.iters)

    orig = necks.dcn_v2_shift
    t_base = run_detect("detect bs=1 (XLA shift-DCN)")
    necks.dcn_v2_shift = (
        lambda x, off, m, w, b=None, clamp=1.0:
        dcn_v2_shift_pallas(x, off, m, w, b, clamp=clamp))
    try:
        t_pl = run_detect("detect bs=1 (Pallas shift-DCN)")
    finally:
        necks.dcn_v2_shift = orig
    print(f"in-model pallas/xla: {t_base / t_pl:.2f}x "
          f"({'pallas wins' if t_pl < t_base else 'XLA wins — keep XLA'})")


if __name__ == "__main__":
    main()
