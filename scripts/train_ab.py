#!/usr/bin/env python
"""Batched A/B measurement of train-step perf knobs — ONE process, many
variants (TPU compiles are expensive per process; CLAUDE.md).

Screens knob combinations on a configurable backbone/shape, then (with
--flagship_final) measures the flagship parity config (dla102 + ANAB + full
align @ 384x1280 bs=4) with the chosen combo and writes TRAINBENCH.json —
the train-side companion artifact to bench.py's detect metric.

Usage:
    python scripts/train_ab.py --backbone dla34 --variants base,remat_dcn,...
    python scripts/train_ab.py --flagship_final remat_dcn  # writes TRAINBENCH.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def _key_batch(key: str, default: int) -> int:
    """Batch size encoded in a sweep result key ('name@bsN'), else default."""
    _, _, tag = key.partition("@bs")
    return int(tag) if tag else default


VARIANTS = {
    # zero-override row: measures the SHIPPED Config defaults (since round 5
    # these are the measured-best knobs — sparse_align_train, light_stats,
    # channel-major loss, bisect mining — so this row must reproduce the
    # pinned TRAINBENCH headline; VERDICT r4 #4)
    "default": {},
    "base": {},
    "dense": {"sparse_align_topm": 0, "sparse_align_train": False},
    "remat_dcn": {"remat_dcn": True},
    "remat_towers": {"remat_towers": True},
    "remat_both": {"remat_dcn": True, "remat_towers": True},
    "light_stats": {"loss_light_stats": True},
    "remat_dcn_light": {"remat_dcn": True, "loss_light_stats": True},
    # A/B pair for the shift-DCN backward (ops/dcn.py): XLA autodiff
    # transpose (the measured winner at bs<=8, config default) vs the
    # hand-written input-only-residual VJP (HBM-headroom knob)
    "ad_vjp": {"dcn_custom_vjp": False, "loss_light_stats": True},
    "cvjp_light": {"dcn_custom_vjp": True, "loss_light_stats": True},
    "ad_vjp_remat": {"dcn_custom_vjp": False, "remat_dcn": True,
                     "loss_light_stats": True},
    # A/B pair for the channel-major class-map loss path (losses/rpn_loss):
    # lane-sliced cls_t/prob_t/lse vs the legacy [B,N,C] softmax/CE layout
    "cm_light": {"loss_channel_major": True, "loss_light_stats": True},
    "nocm_light": {"loss_channel_major": False, "loss_light_stats": True},
    # A/B pair for the hard-mining pool selection (losses/rpn_loss.py):
    # 32-step bit-bisection threshold search vs the stable [B,N] lax.sort
    "bisect_light": {"loss_mining_bisect": True, "loss_light_stats": True},
    "sort_light": {"loss_mining_bisect": False, "loss_light_stats": True},
}


def measure(conf, shape, batch, iters, donate, bg_bias, tag, memstats=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from m3dssd_tpu.anchors import locate_anchors
    from m3dssd_tpu.models import build
    from m3dssd_tpu.train.state import create_train_state, make_train_step

    model = build(conf)
    rois = locate_anchors(conf.anchors, conf.feat_size, conf.feat_stride)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(conf, model, rng, max_iter=1000)
    if bg_bias:
        from m3dssd_tpu.models.rpn import bias_background
        state = state.replace(params=bias_background(
            state.params, conf.num_classes, bg_bias))
    packed = conf.stem_s2d and all(s % 2 == 0 for s in shape)
    step = make_train_step(conf, rois, packed_input=packed, donate=donate)

    N = rois.shape[0]
    B = batch
    rs = np.random.default_rng(0)
    b = {
        "images": rs.normal(size=(B, *shape, 3)).astype(np.float32),
        "labels": np.zeros((B, N), np.int32),
        "labels_fg": np.zeros((B, N), np.int8),
        "labels_bg": np.ones((B, N), np.int8),
        "labels_ign": np.zeros((B, N), np.int8),
        "bbox_2d": np.zeros((B, 4, N), np.float32),
        "bbox_3d": np.zeros((B, 7, N), np.float32),
        "any_val": np.ones((B,), np.int32),
    }
    b["labels"][:, :50] = 1
    b["labels_fg"][:, :50] = 1
    b["labels_bg"][:, :50] = 0
    if packed:
        from m3dssd_tpu.models.dla import space_to_depth_np
        b["images"] = space_to_depth_np(b["images"])
    b = {k: jnp.asarray(v) for k, v in b.items()}

    if memstats:
        # compile-only HBM breakdown — where the bs cliff comes from
        # (donated args alias outputs, so argument/output sizes overlap)
        try:
            mem = step.lower(state, b, rng).compile().memory_analysis()
            gb = 1 / (1024 ** 3)
            print(f"[{tag}] HBM: args {mem.argument_size_in_bytes * gb:.2f} "
                  f"out {mem.output_size_in_bytes * gb:.2f} "
                  f"temp {mem.temp_size_in_bytes * gb:.2f} "
                  f"alias {mem.alias_size_in_bytes * gb:.2f} GiB",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[{tag}] memory_analysis unavailable: {e}", flush=True)

    t0 = time.perf_counter()
    state, stats = step(state, b, rng)      # compile + warmup
    jax.block_until_ready((state, stats))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        state, stats = step(state, b, rng)
    # block on the WHOLE state: the runtime can signal the loss buffer
    # before the optimizer update finishes (observed: a bs=16 remat variant
    # "measured" 8.6 ms/step when only the loss was awaited)
    jax.block_until_ready((state, stats))
    dt = (time.perf_counter() - t0) / iters
    print(f"[{tag}] {dt * 1e3:8.2f} ms/step  ({B / dt:6.2f} im/s)  "
          f"loss={float(stats['loss']):.4f}  compile {compile_s:.0f}s",
          flush=True)
    # free the state before the next variant compiles
    del state, step, b
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", default="dla34")
    p.add_argument("--shape", type=int, nargs=2, default=[384, 1280])
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--batch_sweep", default=None,
                   help="comma list of batch sizes: measure every variant "
                        "at each (one process, shared compile cache)")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--bg_bias", type=float, default=4.0)
    p.add_argument("--donate", action="store_true", default=True)
    p.add_argument("--variants", default="base,remat_dcn,remat_towers,remat_both")
    p.add_argument("--flagship_final", default=None,
                   help="variant name; measures the flagship parity config "
                        "with it and writes TRAINBENCH.json")
    p.add_argument("--memstats", action="store_true",
                   help="print the compiled step's HBM breakdown "
                        "(args/output/temp) per variant before timing")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_conf

    batches = ([int(b) for b in args.batch_sweep.split(",")]
               if args.batch_sweep else [args.batch])
    results = {}
    if args.variants:
        for name in args.variants.split(","):
            for b in batches:
                conf = _flagship_conf(tuple(args.shape),
                                      backbone=args.backbone).replace(
                    batch_size=b,
                    sparse_align_train=True, **VARIANTS[name])
                # always tag sweep keys so --flagship_final auto re-measures
                # at the swept batch, not the --batch default
                key = f"{name}@bs{b}" if args.batch_sweep else name
                try:
                    results[key] = measure(conf, tuple(args.shape), b,
                                           args.iters, args.donate,
                                           args.bg_bias,
                                           f"{args.backbone} {key}",
                                           memstats=args.memstats)
                except Exception as e:  # OOM at a big batch: keep sweeping
                    print(f"[{key}] FAILED: {type(e).__name__}: "
                          f"{str(e)[:300]}", flush=True)

    if args.flagship_final == "auto":
        assert results, "--flagship_final auto needs --variants"
        # highest throughput (im/s), not lowest latency: a bigger batch may
        # cost more ms/step but win per-chip throughput
        best = max(results, key=lambda k: _key_batch(k, args.batch)
                   / results[k])
        print(f"auto-selected best-throughput variant: {best}", flush=True)
        args.flagship_final = best

    if args.flagship_final:
        name, _, bs_tag = args.flagship_final.partition("@bs")
        fbatch = int(bs_tag) if bs_tag else args.batch
        conf = _flagship_conf(tuple(args.shape)).replace(
            batch_size=fbatch, sparse_align_train=True,
            **VARIANTS[name])
        dt = measure(conf, tuple(args.shape), fbatch, args.iters,
                     args.donate, args.bg_bias,
                     f"flagship {args.flagship_final}")
        out = {
            "metric": "train_step_ms",
            "value": round(dt * 1e3, 2),
            "unit": "ms",
            "images_per_sec_per_chip": round(fbatch / dt, 2),
            "config": (f"dla102+ANAB+align @ {args.shape[0]}x{args.shape[1]} "
                       f"bs={fbatch} bf16, sparse_align_train, "
                       f"variant={name}, donate={args.donate}"),
        }
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "TRAINBENCH.json")
        with open(path, "w") as f:
            json.dump(out, f)
            f.write("\n")
        print("TRAINBENCH " + json.dumps(out), flush=True)

    if results:
        base = results.get("base")
        for k, v in results.items():
            rel = f"  ({base / v:.2f}x vs base)" if base else ""
            print(f"summary {k:14s} {v * 1e3:8.2f} ms{rel}", flush=True)


if __name__ == "__main__":
    main()
