#!/usr/bin/env python
"""Learnability bisection probe.

The convergence run (scripts/convergence_check.py) showed classification
collapsing to all-background with every loss plateaued from epoch 2. This
probe isolates which ingredient breaks (or slows) learning: it overfits a
few fixed batches at the SAME resolution/model as the convergence run,
toggling one fast-path knob per variant, and reports the acc_fg / loss
trajectory for each. Batches are prebuilt on the host and cycled on-device,
so 1500 steps take minutes, not hours (this host has one core).

Variants:
  run2    — exact convergence-run semantics (bf16 + s2d stem + shift-DCN)
  run2aug — same, but over a pool of pre-augmented batches (aug diversity)
  f32     — compute_dtype float32
  noshift — learned-offset gather DCN (dcn_shift_clamp=None)
  nos2d   — conventional stem (stem_s2d=False)
  plain   — f32 + no s2d + no shift (round-1-style control)

Usage:
    python scripts/learn_probe.py --root /tmp/conv --steps 1500 \
        --variants run2,plain
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "run2": {},
    "run2aug": {},
    "f32": {"compute_dtype": "float32"},
    "noshift": {"dcn_shift_clamp": None},
    "nos2d": {"stem_s2d": False},
    "plain": {"compute_dtype": "float32", "stem_s2d": False,
              "dcn_shift_clamp": None},
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/conv")
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--images", type=int, default=16)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--backbone", default="dla34")
    p.add_argument("--crop", type=int, nargs=2, default=[384, 1280])
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--aug_pool", type=int, default=48,
                   help="pre-augmented batch pool size for run2aug")
    p.add_argument("--variants", default="run2,plain")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke tests)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from m3dssd_tpu.config import load_config
    from m3dssd_tpu.data.kitti import Kitti3DDataset
    from m3dssd_tpu.data.loader import TrainLoader, collate
    from m3dssd_tpu.models import build
    from m3dssd_tpu.models.dla import space_to_depth_np
    from m3dssd_tpu.train.state import create_train_state, make_train_step

    data_root = os.path.join(args.root, "data")
    base = load_config("kitti_3d_base").replace(
        back_bone=args.backbone, batch_size=args.batch_size,
        crop_size=list(args.crop), test_scale=list(args.crop),
        pre_train=False, num_workers=2)
    if args.lr is not None:
        base = base.replace(lr=args.lr, lr_target=args.lr * 1e-5)

    cache = os.path.join(args.root, "cache")
    # deterministic identity batches (aug off) over the first --images images
    conf_noaug = base.replace(mirror_prob=0.0, trans_prob=0.0)
    ds = Kitti3DDataset(conf_noaug, data_root, phase="train",
                        cache_folder=cache)
    base = base.replace(anchors=conf_noaug.anchors,
                        bbox_means=conf_noaug.bbox_means,
                        bbox_stds=conf_noaug.bbox_stds)
    ds.imdb = ds.imdb[:args.images]
    rois = ds.rois

    nb = max(args.images // args.batch_size, 1)
    fixed = []
    for k in range(nb):
        idx = range(k * args.batch_size, (k + 1) * args.batch_size)
        fixed.append(collate([ds.sample(i % len(ds.imdb)) for i in idx]))
    print(f"built {nb} fixed batches", flush=True)

    want = args.variants.split(",")
    aug_pool = None
    if "run2aug" in want:
        ds_aug = Kitti3DDataset(base, data_root, phase="train",
                                cache_folder=cache, imdb=ds.imdb)
        loader = TrainLoader(ds_aug, args.batch_size, num_workers=2, seed=0)
        t0 = time.time()
        aug_pool = list(loader.batches(args.aug_pool))
        print(f"built {len(aug_pool)} augmented batches "
              f"in {time.time() - t0:.0f}s", flush=True)

    for name in want:
        conf = base.replace(mirror_prob=0.0, trans_prob=0.0,
                            **VARIANTS[name])
        batches = aug_pool if name == "run2aug" else fixed
        packed = bool(conf.stem_s2d)
        dev = [dict(b, images=space_to_depth_np(b["images"]))
               if packed else dict(b) for b in batches]
        dev = [jax.device_put(b) for b in dev]

        model = build(conf, "train")
        rng = jax.random.PRNGKey(0)
        state = create_train_state(conf, model, rng, args.steps)
        step_fn = make_train_step(conf, rois, packed_input=packed)

        print(f"=== variant {name}: "
              + ", ".join(f"{k}={v}" for k, v in VARIANTS[name].items())
              or "(defaults)", flush=True)
        t0 = time.time()
        stats = None
        for s in range(args.steps):
            rng, k1 = jax.random.split(rng)
            state, stats = step_fn(state, dev[s % len(dev)], k1)
            if (s + 1) % args.log_every == 0 or s == 0:
                st = {k: float(v) for k, v in stats.items()}
                print(f"[{name}] step {s + 1} "
                      f"loss={st['loss']:.4f} cls={st['loss_cls']:.4f} "
                      f"acc_fg={st['acc_fg']:.3f} acc_bg={st['acc_bg']:.3f} "
                      f"iou={st['iou']:.3f} err_z={st['err_z']:.3f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
        st = {k: float(v) for k, v in stats.items()}
        verdict = "LEARNS" if st["acc_fg"] > 0.5 else "COLLAPSED"
        print(f"RESULT {name}: {verdict} acc_fg={st['acc_fg']:.3f} "
              f"loss={st['loss']:.4f} iou={st['iou']:.3f} "
              f"steps/s={args.steps / (time.time() - t0):.2f}", flush=True)


if __name__ == "__main__":
    main()
