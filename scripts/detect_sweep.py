#!/usr/bin/env python
"""One-process detect batch-size sweep at the bench shape (512x1760).

Same methodology as bench.py (packed input, bias_background, steady-state
timing) but sweeps batch sizes in a single process so the persistent
compile cache and model init are shared.

    python scripts/detect_sweep.py --batches 8,10,12
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="8,10,12")
    p.add_argument("--shape", type=int, nargs=2, default=[512, 1760])
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_conf
    from m3dssd_tpu.anchors import locate_anchors
    from m3dssd_tpu.inference.detect import make_batch_detector
    from m3dssd_tpu.models import build
    from m3dssd_tpu.models.dla import space_to_depth_np
    from m3dssd_tpu.models.rpn import bias_background

    conf = _flagship_conf(tuple(args.shape))
    model = build(conf)
    rois = locate_anchors(conf.anchors, conf.feat_size, conf.feat_stride)
    rng = jax.random.PRNGKey(0)
    gen = np.random.default_rng(0)
    variables = model.init(rng, jnp.zeros((1, 64, 128, 3), jnp.float32),
                           train=False)
    params = bias_background(variables["params"], conf.num_classes)
    bstats = variables.get("batch_stats", {})

    detect = make_batch_detector(conf, rois, model, packed_input=True)
    for bs in [int(b) for b in args.batches.split(",")]:
        x = jnp.asarray(space_to_depth_np(gen.normal(
            size=(bs, args.shape[0], args.shape[1], 3)).astype(np.float32)))
        sf = jnp.ones((bs,), jnp.float32)
        out = detect(params, bstats, x, sf)
        jax.block_until_ready(out)
        iters = max(64 // bs, 8)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = detect(params, bstats, x, sf)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"bs={bs}: {1e3 * dt:.1f} ms/step = {bs / dt:.1f} im/s/chip",
              flush=True)


if __name__ == "__main__":
    main()
