#!/usr/bin/env python
"""Serving smoke check: export the detector, reload it, run it on the
CURRENT backend, and compare against the live (non-exported) detector.

Validates on real hardware what tests/test_export.py proves on CPU: the
StableHLO artifact produced by `inference.export` deserializes and executes
on the TPU, bit-comparable to the in-process jitted detector, and reports
its steady-state latency. Run with --cpu to exercise the CPU lowering of
the same dual-platform blob.

    python scripts/serve_check.py                # small dla34 model, TPU
    python scripts/serve_check.py --flagship     # dla102 flagship shape
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--flagship", action="store_true",
                   help="dla102 @ 512x1760 (minutes of compile) instead of "
                        "the small dla34 @ 192x640 smoke model")
    p.add_argument("--batch_size", type=int, default=0)
    p.add_argument("--iters", type=int, default=20)
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
    from m3dssd_tpu.inference.detect import make_batch_detector, make_detector
    from m3dssd_tpu.inference.export import (export_detector, load_detector,
                                             save_exported)
    from m3dssd_tpu.models import build

    if args.flagship:
        conf = _flagship_conf((512, 1760))
    else:
        conf = _flagship_conf((192, 640), num_scales=6, backbone="dla34")
    model = build(conf)
    h, w = conf.test_scale
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    rois = locate_anchors(conf)

    bs = args.batch_size
    print(f"[serve_check] backend={jax.default_backend()} "
          f"model={conf.back_bone} {h}x{w} bs={bs or 1}", file=sys.stderr)

    exp = export_detector(conf, rois, model, params, batch_stats,
                          batch_size=bs, platforms=("tpu", "cpu"))
    path = os.path.join(tempfile.mkdtemp(), "det.shlo")
    save_exported(exp, path, conf=conf, batch_size=bs)
    size_mb = os.path.getsize(path) / 1e6
    served = load_detector(path)

    gen = np.random.default_rng(0)
    img = jnp.asarray(gen.normal(size=(bs or 1, h, w, 3)).astype(np.float32))
    sf = (jnp.ones((bs,), jnp.float32) if bs
          else jnp.float32(1.0))

    out_srv = np.asarray(served(img, sf))
    live = (make_batch_detector(conf, rois, model) if bs
            else make_detector(conf, rois, model))
    out_live = np.asarray(live(params, batch_stats, img, sf))
    diff = float(np.max(np.abs(out_srv - out_live)))
    print(f"[serve_check] artifact {size_mb:.1f} MB; "
          f"max |served - live| = {diff:.3e}", file=sys.stderr)

    served(img, sf)  # warm
    jax.block_until_ready(served(img, sf))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = served(img, sf)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / args.iters * 1e3
    n = bs or 1
    print(f"[serve_check] served latency {ms:.2f} ms/call "
          f"({n / ms * 1e3:.1f} im/s)", file=sys.stderr)

    ok = diff < 1e-3
    print(f'{{"serve_check": "{"ok" if ok else "MISMATCH"}", '
          f'"latency_ms": {ms:.3f}, "max_abs_diff": {diff:.3e}}}')
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
