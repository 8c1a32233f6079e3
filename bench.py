#!/usr/bin/env python
"""Throughput benchmark: end-to-end detection (forward + decode + NMS) on
the flagship model at the BASELINE.json throughput shape (512x1760).

Prints ONE JSON line (stdout):
    {"metric": "images_per_sec_per_chip", "value": N, "unit": "im/s",
     "vs_baseline": N}
plus a detail block on stderr: bs=1 latency, batched throughput, FLOPs from
XLA cost analysis, and MFU vs the chip's bf16 peak.

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
BATCH = int(os.environ.get("BENCH_BATCH", "8"))
# bf16 peak of one TPU v5e chip (the benchmark device)
PEAK_BF16_FLOPS = 197e12


def _time_loop(fn, iters):
    import jax
    out = fn()                       # warmup / compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


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
    from m3dssd_tpu.inference.detect import make_batch_detector, make_detector
    from m3dssd_tpu.models import build

    conf = _flagship_conf(SHAPE)
    # isolation knob: BENCH_SPARSE_NMS=<M> sets the pre-NMS compaction
    # budget (default off per config.py; measured slower — PERF.md)
    snms = int(os.environ.get("BENCH_SPARSE_NMS", "-1"))
    if snms >= 0:
        conf = conf.replace(nms_sparse_topm=snms)
    model = build(conf)
    rois = locate_anchors(conf.anchors, conf.feat_size, conf.feat_stride)

    rng = jax.random.PRNGKey(0)
    gen = np.random.default_rng(0)
    # params are input-size independent: init at a tiny shape to avoid
    # compiling the full-resolution forward twice
    variables = model.init(rng, jnp.zeros((1, 64, 128, 3), jnp.float32),
                           train=False)
    params, bs = variables["params"], variables.get("batch_stats", {})

    # Deployment-realistic confidence sparsity: a freshly initialized
    # softmax puts P(bg) ~= 1/num_classes at EVERY position, which no
    # trained detector ever does (P(bg) -> ~1 almost everywhere; only a few
    # dozen positions per image clear the 0.5 alignment threshold). Raise
    # the background logit bias so the benchmark exercises the same
    # sparse-alignment regime as a trained checkpoint; positions over the
    # threshold still take the exact dense-corrected path (models/align.py).
    from m3dssd_tpu.models.rpn import bias_background
    params = bias_background(params, conf.num_classes)

    from m3dssd_tpu.models.dla import space_to_depth_np

    # host-side space-to-depth input (free exact relayout; the production
    # eval path — trainer/test driver — feeds packed images the same way)
    # ---------------------------------------------------------- bs=1 latency
    detect1 = make_detector(conf, rois, model, packed_input=True)
    x1 = jnp.asarray(space_to_depth_np(gen.normal(
        size=(1, SHAPE[0], SHAPE[1], 3)).astype(np.float32)))
    sf = np.float32(1.0)
    lat = _time_loop(lambda: detect1(params, bs, x1, sf), 30)
    ips1 = 1.0 / lat

    # ------------------------------------------------------ batch throughput
    detectB = make_batch_detector(conf, rois, model, packed_input=True)
    xB = jnp.asarray(space_to_depth_np(gen.normal(
        size=(BATCH, SHAPE[0], SHAPE[1], 3)).astype(np.float32)))
    sfB = jnp.ones((BATCH,), jnp.float32)
    iters = max(30 // BATCH, 8)
    step = _time_loop(lambda: detectB(params, bs, xB, sfB), iters)
    ipsB = BATCH / step

    # ------------------------------------------------- FLOPs / MFU estimate
    mfu_line = ""
    try:
        # make_batch_detector returns a jitted fn: lower() reuses the cache
        cost = detectB.lower(params, bs, xB, sfB).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        flops_per_im = flops / BATCH
        mfu = flops_per_im * ipsB / PEAK_BF16_FLOPS
        mfu_line = (f" flops/im={flops_per_im / 1e9:.1f}G"
                    f" mfu={100 * mfu:.1f}%")
    except Exception as e:  # cost analysis is best-effort
        mfu_line = f" (cost analysis unavailable: {e})"

    print(f"bench: bs=1 latency {1e3 * lat:.2f} ms ({ips1:.1f} im/s); "
          f"bs={BATCH} throughput {ipsB:.1f} im/s/chip "
          f"({1e3 * step:.1f} ms/step){mfu_line}",
          file=sys.stderr)

    # Honest headline: the absolute im/s + MFU are the primary figures. The
    # reference publishes no speed numbers (BASELINE.md), so any ratio has an
    # ASSUMED denominator — it is named `vs_assumed_baseline` to say so.
    # `vs_baseline` is kept only because the driver's schema requires the
    # field; it carries the same assumed ratio.
    out = {
        "metric": "images_per_sec_per_chip",
        "value": round(ipsB, 3),
        "unit": "im/s",
        "bs1_latency_ms": round(1e3 * lat, 2),
        "vs_assumed_baseline": round(ipsB / ASSUMED_REF_IMAGES_PER_SEC, 3),
        "assumed_baseline_im_per_s": ASSUMED_REF_IMAGES_PER_SEC,
        "vs_baseline": round(ipsB / ASSUMED_REF_IMAGES_PER_SEC, 3),
        "baseline_assumed": True,
    }
    try:
        out["mfu_pct"] = round(100 * mfu, 2)
    except NameError:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
