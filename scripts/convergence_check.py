#!/usr/bin/env python
"""End-to-end convergence check at realistic scale (quality-gate proxy).

Trains a kitti_3d_base-shaped config (dla34 @ 384x1280, bf16 + s2d stem +
shift-DCN necks all ON — the production fast paths) on a few-hundred-image
synthetic KITTI set, evaluating every few epochs, and prints the full AP
trajectory on BOTH splits at the end. Mirrors the reference's
eval-every-epoch loop (ref:scripts/train_rpn_3d.py:266-297) at a scale that
runs in ~30 min on one chip. Results are recorded in PERF.md.

Usage:
    python scripts/convergence_check.py [--root /tmp/conv] [--epochs 40]
        [--num_train 240] [--num_val 40] [--eval_epoch 5]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/conv")
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--num_train", type=int, default=240)
    p.add_argument("--num_val", type=int, default=40)
    p.add_argument("--eval_epoch", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--lr", type=float, default=None,
                   help="override conf.lr (lr_target scales with it) — the "
                        "bs=8 linear-LR-scaling convergence A/B arm")
    p.add_argument("--config", default="kitti_3d_base",
                   help="config name (kitti_3d_base | kitti_3d_anab | "
                        "kitti_3d_anab_fullalign)")
    p.add_argument("--backbone", default="dla34")
    p.add_argument("--crop", type=int, nargs=2, default=[384, 1280])
    p.add_argument("--host_targets", action="store_true",
                   help="precompute targets on the host (the parity-default "
                        "path; ~135 ms/image of host work + a dense [B,N] "
                        "target upload per step — the device-target path is "
                        "exact-equality tested and much faster on a "
                        "slow-host setup)")
    p.add_argument("--grad_clip", type=float, default=5.0,
                   help="global-norm gradient clip (0 = off)")
    p.add_argument("--pool", type=int, default=0,
                   help="device-cached batch pool: pre-draw this many "
                        "augmented batches through the normal loader, keep "
                        "them resident on the device, and cycle them — the "
                        "training math is the loader's own batches, but "
                        "steps run device-bound instead of paying this "
                        "host's ~5 MB/s tunnel upload every step (0 = "
                        "stream normally)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke tests)")
    p.add_argument("--stop_epoch", type=int, default=None,
                   help="stop after this epoch while keeping --epochs as "
                        "the LR-schedule horizon (conf.max_epoch). Segmented "
                        "runs must pass the SAME --epochs to every segment "
                        "and advance only --stop_epoch, or the cosine "
                        "schedule re-derives per segment.")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint under <root>/out and "
                        "continue (epoch numbering/cadence resume from the "
                        "restored step). Long STREAMING runs on the tunnel "
                        "host must be segmented this way: the axon plugin "
                        "leaks every host->device transfer's staging buffer "
                        "(~24 MB/step at bs=8 — measured, PERF.md round 5), "
                        "so a multi-hour streaming process eventually OOMs "
                        "the host; a fresh process resets the leak.")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from m3dssd_tpu.config import load_config
    from m3dssd_tpu.data.synthetic import generate
    from m3dssd_tpu.train.trainer import Trainer

    data_root = os.path.join(args.root, "data")
    if not os.path.isdir(os.path.join(data_root, "kitti_split1")):
        generate(data_root, num_train=args.num_train, num_val=args.num_val,
                 seed=11, classes=("Car", "Pedestrian", "Cyclist"),
                 max_objs=6)
        print(f"generated synthetic KITTI: {args.num_train} train / "
              f"{args.num_val} val", flush=True)

    conf = load_config(args.config).replace(
        back_bone=args.backbone, batch_size=args.batch_size,
        crop_size=list(args.crop), test_scale=list(args.crop),
        pre_train=False, max_epoch=args.epochs, eval_epoch=args.eval_epoch,
        snapshot_epoch=max(args.epochs // 4, 1), display_iter=20,
        num_workers=4, score_thres=0.3,
        pre_compute_target=args.host_targets,
        sparse_align_train=True,   # exact in both regimes (PERF.md); the
                                   # dense branch rides lax.cond early on
        grad_clip_norm=args.grad_clip or None)
    if args.lr is not None:
        conf = conf.replace(lr=args.lr, lr_target=args.lr * 1e-5)
    assert conf.compute_dtype == "bfloat16" and conf.stem_s2d \
        and conf.dcn_shift_clamp is not None, "fast paths must be ON"

    out = os.path.join(args.root, "out")
    trainer = Trainer(conf, data_root, out, cache_folder=os.path.join(
        args.root, "cache"))

    if args.resume:
        from m3dssd_tpu.utils.checkpoint import (latest_step,
                                                 restore_checkpoint)
        step = latest_step(os.path.join(out, "weights"))
        if step:
            trainer.state = restore_checkpoint(
                os.path.join(out, "weights"), trainer.state, step)
            print(f"resumed from step {step}", flush=True)

    if args.pool:
        # Pre-draw `pool` batches through the trainer's own loader (same
        # augmentation stream, same collate/pack/bf16-upload path; the
        # loader's to_device=True uploads each batch as it is drawn) and
        # cycle them on-device. One epoch still consumes steps_per_epoch
        # batches; the pool is sampled uniformly with a seeded rng.
        import time as _time
        import numpy as _np
        t0 = _time.time()
        pool = list(trainer.loader.batches(args.pool))
        print(f"device pool: {len(pool)} batches uploaded in "
              f"{_time.time() - t0:.0f}s", flush=True)

        class DevicePool:
            def __init__(self, batches, seed=0):
                self.pool = batches
                self.rs = _np.random.default_rng(seed)

            def batches(self, n):
                for _ in range(n):
                    yield self.pool[int(self.rs.integers(len(self.pool)))]

        trainer.loader = DevicePool(pool, seed=conf.rng_seed)

    # record the val AP trajectory as evals fire
    trajectory = []
    orig_eval = trainer._eval

    def eval_and_record(epoch):
        sel = orig_eval(epoch)
        trajectory.append({"epoch": epoch, "val_car_3d_r40": sel})
        print(f"[trajectory] epoch {epoch}: val Car 3D R40 = {sel:.2f}",
              flush=True)
        return sel

    trainer._eval = eval_and_record
    trainer.run(args.stop_epoch)   # None -> conf.max_epoch

    # final AP on the TRAINING split (overfit sanity: must be >> val of a
    # random model; NaN-free bf16 training is the actual gate)
    from m3dssd_tpu.data.kitti import Kitti3DDataset
    from m3dssd_tpu.inference.detect import (make_batch_detector,
                                             packed_input_eligible)
    from m3dssd_tpu.inference.test_driver import test_kitti_3d
    # val_train = train imdb + DETERMINISTIC eval preprocessing (phase
    # "train" would run the random augmentations, putting detections in an
    # augmented frame that no longer matches the gt labels)
    train_ds = Kitti3DDataset(conf, data_root, phase="val_train")
    packed = packed_input_eligible(conf)
    # the single-image driver path needs a single-image detector
    eval_bs = max(int(getattr(conf, "eval_batch_size", 1)), 1)
    if eval_bs > 1:
        det = make_batch_detector(conf, trainer.dataset.rois, trainer.model,
                                  packed_input=packed)
    else:
        from m3dssd_tpu.inference.detect import make_detector
        det = make_detector(conf, trainer.dataset.rois, trainer.model,
                            packed_input=packed)
    res_train, sel_train = test_kitti_3d(
        train_ds, det, trainer.state.params, trainer.state.batch_stats, conf,
        os.path.join(out, "results", "train_split", "data"),
        gt_path=os.path.join(data_root, "kitti_split1", "training",
                             "label_2"),
        batch_size=eval_bs, packed_input=packed)

    report = {
        "val_trajectory": trajectory,
        "train_car_3d_r40": sel_train,
        "train_car_bbox_r40": (res_train or {}).get("Car_bbox_R40"),
        "val_best": trainer.best_metric,
    }
    print("CONVERGENCE_REPORT " + json.dumps(report, default=float))


if __name__ == "__main__":
    main()
