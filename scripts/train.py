#!/usr/bin/env python
"""Training CLI (re-derivation of ref:scripts/train_rpn_3d.py).

Example:
    python scripts/train.py --config kitti_3d_base --data_root ./data \
        --output ./output/base --epochs 70
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--data_root", required=True)
    p.add_argument("--output", default="output/run")
    p.add_argument("--cache", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--restore", type=int, default=None,
                   help="restore from checkpoint step")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--backbone", default=None)
    p.add_argument("--crop", type=int, nargs=2, default=None)
    p.add_argument("--no_pretrain", action="store_true")
    p.add_argument("--timestamp", action="store_true",
                   help="create a timestamped run dir under --output "
                        "(reference convention: output/<exp>/<ts>/) and "
                        "rename it with the best metric at the end")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host training: call jax.distributed.initialize"
                        " before backend init (same SPMD code then spans "
                        "hosts over DCN; coordinator/process env vars per "
                        "the JAX multi-process docs)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (JAX_PLATFORMS is ignored "
                        "when a TPU plugin is registered; this sets "
                        "jax.config before backend init)")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.distributed:
        # must run before any JAX backend use; single-host behavior is
        # unchanged when the flag is absent (SURVEY §2.9: the DataParallel
        # replacement scales over ICI, multi-host rides DCN)
        import jax
        jax.distributed.initialize()

    from m3dssd_tpu.config import load_config
    from m3dssd_tpu.train.trainer import Trainer
    from m3dssd_tpu.utils.checkpoint import restore_checkpoint

    conf = load_config(args.config)
    over = {}
    if args.batch_size:
        over["batch_size"] = args.batch_size
    if args.backbone:
        over["back_bone"] = args.backbone
    if args.crop:
        over["crop_size"] = list(args.crop)
        over["test_scale"] = list(args.crop)
    if args.no_pretrain:
        over["pre_train"] = False
    if over:
        conf = conf.replace(**over)

    trainer = Trainer(conf, args.data_root, args.output,
                      cache_folder=args.cache, timestamped=args.timestamp)
    if args.restore is not None:
        trainer.state = restore_checkpoint(
            os.path.join(args.output, "weights"), trainer.state, args.restore)
    trainer.run(args.epochs)
    if args.timestamp:
        trainer.finalize_run_dir()


if __name__ == "__main__":
    main()
