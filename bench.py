#!/usr/bin/env python
"""Throughput benchmark: end-to-end detection (forward + decode + NMS) on
the flagship model at the BASELINE.json throughput shape (512x1760).

Prints ONE JSON line:
    {"metric": "images_per_sec_per_chip", "value": N, "unit": "im/s",
     "vs_baseline": N}

The reference publishes no speed numbers; BASELINE.md's speed gate targets
>=5x a reference-GPU single-image pipeline. We anchor vs_baseline to an
assumed 10 im/s for the reference's bs=1 GPU test loop at this resolution
(M3D-RPN-class detectors on a 1080Ti-era GPU), i.e. vs_baseline =
value / 10.0.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ASSUMED_REF_IMAGES_PER_SEC = 10.0
SHAPE = (512, 1760)


def main():
    import jax

    # persistent compilation cache: the DLA-102 graph is large (deep
    # recursive trees) and costs minutes to compile; cache across runs
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_conf
    from m3dssd_tpu.anchors import locate_anchors
    from m3dssd_tpu.inference.detect import make_detector
    from m3dssd_tpu.models import build

    conf = _flagship_conf(SHAPE)
    model = build(conf)
    rois = locate_anchors(conf.anchors, conf.feat_size, conf.feat_stride)

    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, SHAPE[0], SHAPE[1], 3)).astype(np.float32))
    # params are input-size independent: init at a tiny shape to avoid
    # compiling the full-resolution forward twice
    variables = model.init(rng, jnp.zeros((1, 64, 128, 3), jnp.float32),
                           train=False)
    detect = make_detector(conf, rois, model)

    params, bs = variables["params"], variables.get("batch_stats", {})
    sf = np.float32(1.0)

    # warmup / compile
    dets = detect(params, bs, x, sf)
    jax.block_until_ready(dets)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        dets = detect(params, bs, x, sf)
    jax.block_until_ready(dets)
    dt = time.perf_counter() - t0

    ips = iters / dt
    print(json.dumps({
        "metric": "images_per_sec_per_chip",
        "value": round(ips, 3),
        "unit": "im/s",
        "vs_baseline": round(ips / ASSUMED_REF_IMAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
