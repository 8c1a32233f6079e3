#!/usr/bin/env python
"""One-process detect sweep at the bench shape (512x1760): batch sizes x
NMS-variant knobs.

Same methodology as bench.py (packed input, bias_background, steady-state
timing) but sweeps in a single process so the persistent compile cache and
model init are shared.

    python scripts/detect_sweep.py --batches 8,10,12
    python scripts/detect_sweep.py --batches 8 --variants stop,nostop,bitmask
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# NMS-variant knobs (config.py; ops/nms.py). `stop` is the config default
# since round 4 (sequential selection ends once the best remaining score
# drops below score_thres — exact, the driver filters those rows anyway).
# CAVEAT: `bitmask` only changes the graph when nms_sparse_topm > 0 (the
# Jacobi fixpoint needs a compacted candidate set for its [C, C] matrix);
# at the default nms_sparse_topm=0 it compiles IDENTICALLY to `stop` —
# the 2026-08-19 sweep's 74.6-vs-75.2 delta was noise (PERF.md).
VARIANTS = {
    "stop": {"nms_score_stop": True, "nms_bitmask": False},
    "nostop": {"nms_score_stop": False, "nms_bitmask": False},
    "bitmask": {"nms_score_stop": True, "nms_bitmask": True},
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="8,10,12")
    p.add_argument("--variants", default=None,
                   help="comma list of NMS variants (default: conf as-is)")
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

    base_conf = _flagship_conf(tuple(args.shape))
    model = build(base_conf)
    rois = locate_anchors(base_conf.anchors, base_conf.feat_size,
                          base_conf.feat_stride)
    rng = jax.random.PRNGKey(0)
    gen = np.random.default_rng(0)
    variables = model.init(rng, jnp.zeros((1, 64, 128, 3), jnp.float32),
                           train=False)
    params = bias_background(variables["params"], base_conf.num_classes)
    bstats = variables.get("batch_stats", {})

    variants = (args.variants.split(",") if args.variants else [None])
    for name in variants:
        conf = base_conf.replace(**VARIANTS[name]) if name else base_conf
        # decode/NMS knobs don't touch the param tree: model/params shared
        detect = make_batch_detector(conf, rois, model, packed_input=True)
        tag = f"[{name}] " if name else ""
        for bs in [int(b) for b in args.batches.split(",")]:
            x = jnp.asarray(space_to_depth_np(gen.normal(
                size=(bs, args.shape[0], args.shape[1], 3))
                .astype(np.float32)))
            sf = jnp.ones((bs,), jnp.float32)
            out = detect(params, bstats, x, sf)
            jax.block_until_ready(out)
            iters = max(64 // bs, 8)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = detect(params, bstats, x, sf)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters
            print(f"{tag}bs={bs}: {1e3 * dt:.1f} ms/step = "
                  f"{bs / dt:.1f} im/s/chip", flush=True)


if __name__ == "__main__":
    main()
