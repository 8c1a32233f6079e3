#!/usr/bin/env python
"""TPU profiling driver: forward / detect / train-step timing breakdown.

Usage:
    python scripts/profile_tpu.py [--shape 512 1760] [--train] [--trace DIR]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shape", type=int, nargs=2, default=[512, 1760])
    p.add_argument("--train", action="store_true",
                   help="profile the training step instead of inference")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--trace", default=None, help="jax.profiler trace dir")
    p.add_argument("--bg_bias", type=float, default=0.0,
                   help="raise the background logit bias (emulates a trained "
                        "detector's confidence sparsity; models/rpn.py:"
                        "bias_background)")
    p.add_argument("--sparse_train", action="store_true",
                   help="enable the sparse alignment path in the train step "
                        "(conf.sparse_align_train)")
    p.add_argument("--dense_align", action="store_true",
                   help="disable sparse alignment (conf.sparse_align_topm=0)")
    p.add_argument("--sparse_nms", type=int, default=None,
                   help="set conf.nms_sparse_topm (eval profiling)")
    p.add_argument("--remat_dcn", action="store_true",
                   help="jax.checkpoint around the neck shift-DCNs")
    p.add_argument("--remat_towers", action="store_true",
                   help="flax remat around the head towers")
    p.add_argument("--donate", action="store_true",
                   help="donate the train state (threads state through the "
                        "timing loop like the trainer does)")
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   help="generic conf override (python literal values), "
                        "e.g. --set loss_light_stats=True")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_conf
    from m3dssd_tpu.anchors import locate_anchors
    from m3dssd_tpu.inference.detect import make_detector
    from m3dssd_tpu.models import build
    from m3dssd_tpu.train.state import create_train_state, make_train_step

    conf = _flagship_conf(tuple(args.shape))
    if args.sparse_train:
        conf = conf.replace(sparse_align_train=True)
    if args.dense_align:
        conf = conf.replace(sparse_align_topm=0)
    if args.remat_dcn:
        conf = conf.replace(remat_dcn=True)
    if args.remat_towers:
        conf = conf.replace(remat_towers=True)
    if args.sparse_nms is not None:
        conf = conf.replace(nms_sparse_topm=args.sparse_nms)
    if args.set:
        import ast
        for kv in args.set:
            k, _, v = kv.partition("=")
            try:
                val = ast.literal_eval(v)
            except (SyntaxError, ValueError):
                val = v
            conf = conf.replace(**{k: val})
    model = build(conf)
    rois = locate_anchors(conf.anchors, conf.feat_size, conf.feat_stride)
    rng = jax.random.PRNGKey(0)

    def timeit(name, fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:30s} {dt * 1000:8.2f} ms  ({1 / dt:7.1f}/s)")
        return out

    if args.train:
        conf = conf.replace(batch_size=args.batch)
        state = create_train_state(conf, model, rng, max_iter=1000)
        if args.bg_bias:
            from m3dssd_tpu.models.rpn import bias_background
            state = state.replace(params=bias_background(
                state.params, conf.num_classes, args.bg_bias))
        # pack images host-side exactly like the trainer (loader pack_s2d)
        packed = conf.stem_s2d and all(s % 2 == 0 for s in args.shape)
        step = make_train_step(conf, rois, packed_input=packed,
                               donate=args.donate)
        N = rois.shape[0]
        B = args.batch
        rs = np.random.default_rng(0)
        batch = {
            "images": rs.normal(size=(B, *args.shape, 3)).astype(np.float32),
            "labels": np.zeros((B, N), np.int32),
            "labels_fg": np.zeros((B, N), np.int8),
            "labels_bg": np.ones((B, N), np.int8),
            "labels_ign": np.zeros((B, N), np.int8),
            "bbox_2d": np.zeros((B, 4, N), np.float32),
            "bbox_3d": np.zeros((B, 7, N), np.float32),
            "any_val": np.ones((B,), np.int32),
        }
        batch["labels"][:, :50] = 1
        batch["labels_fg"][:, :50] = 1
        batch["labels_bg"][:, :50] = 0
        if packed:
            from m3dssd_tpu.models.dla import space_to_depth_np
            batch["images"] = space_to_depth_np(batch["images"])
        batch = {k: jnp.asarray(v) for k, v in batch.items()}

        if args.donate:
            # donation invalidates the input state buffers: thread the state
            # through the loop exactly like the trainer does
            holder = {"state": state}

            def run(_):
                s, stats = step(holder["state"], batch, rng)
                holder["state"] = s
                return stats["loss"]
        else:
            def run(state):
                s, stats = step(state, batch, rng)
                return s.params, stats["loss"]

        if args.trace:
            run(state)
            with jax.profiler.trace(args.trace):
                timeit(f"train_step bs={B}", run, state)
        else:
            timeit(f"train_step bs={B}", run, state)
        ips = args.batch
        print(f"(throughput = batch {B} / step-time images/s)")
    else:
        v = model.init(rng, jnp.zeros((1, 64, 128, 3), jnp.float32),
                       train=False)
        if args.bg_bias:
            from m3dssd_tpu.models.rpn import bias_background
            v = dict(v)
            v["params"] = bias_background(v["params"], conf.num_classes,
                                          args.bg_bias)
        p, bs = v["params"], v.get("batch_stats", {})
        B = args.batch
        packed = conf.stem_s2d and all(s % 2 == 0 for s in args.shape)
        x = np.zeros((B, *args.shape, 3), np.float32)
        if packed:
            from m3dssd_tpu.models.dla import space_to_depth_np
            x = space_to_depth_np(x)
        x = jnp.asarray(x)
        if B > 1:
            # bench.py's batched configuration (host-packed input)
            from m3dssd_tpu.inference.detect import make_batch_detector
            detect = make_batch_detector(conf, rois, model,
                                         packed_input=packed)
            sf = jnp.ones((B,), jnp.float32)
        else:
            detect = make_detector(conf, rois, model, packed_input=packed)
            sf = np.float32(1.0)
        if args.trace:
            detect(p, bs, x, sf)
            with jax.profiler.trace(args.trace):
                timeit(f"detect bs={B}", detect, p, bs, x, sf)
        else:
            timeit(f"detect bs={B}", detect, p, bs, x, sf)


if __name__ == "__main__":
    main()
