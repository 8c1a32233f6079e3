#!/usr/bin/env python
"""Async eval watcher (re-derivation of ref:scripts/test_m3d.py).

Polls a training run's checkpoint directory and evaluates each new checkpoint
as it appears, decoupling eval from the train process.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True)
    p.add_argument("--data_root", required=True)
    p.add_argument("--poll_sec", type=float, default=60.0)
    p.add_argument("--max_polls", type=int, default=0, help="0 = forever")
    p.add_argument("--mesh_devices", type=int, default=0,
                   help="shard batched eval over this many devices "
                        "(see scripts/test.py)")
    args = p.parse_args()

    import jax
    from m3dssd_tpu.anchors import locate_anchors
    from m3dssd_tpu.config import Config
    from m3dssd_tpu.data.kitti import Kitti3DDataset
    from m3dssd_tpu.inference.detect import make_detector
    from m3dssd_tpu.inference.test_driver import test_kitti_3d
    from m3dssd_tpu.models import build
    from m3dssd_tpu.train.state import create_train_state
    from m3dssd_tpu.utils.checkpoint import restore_checkpoint

    conf = Config.load(os.path.join(args.run_dir, "conf.pkl"))
    model = build(conf, "test")
    state = create_train_state(conf, model, jax.random.PRNGKey(0), max_iter=1)
    dataset = Kitti3DDataset(conf, args.data_root, phase="validation")
    rois = locate_anchors(conf.anchors, conf.feat_size, conf.feat_stride)
    eval_bs = max(int(getattr(conf, "eval_batch_size", 1)), 1)
    from m3dssd_tpu.inference.detect import packed_input_eligible
    packed = packed_input_eligible(conf)
    if args.mesh_devices > 1:
        from m3dssd_tpu.inference.detect import make_batch_detector
        from m3dssd_tpu.parallel import make_mesh
        if eval_bs % args.mesh_devices:
            eval_bs = args.mesh_devices * max(
                1, round(eval_bs / args.mesh_devices))
        detect = make_batch_detector(conf, rois, model, packed_input=packed,
                                     mesh=make_mesh(args.mesh_devices))
    elif eval_bs > 1:
        from m3dssd_tpu.inference.detect import make_batch_detector
        detect = make_batch_detector(conf, rois, model, packed_input=packed)
    else:
        detect = make_detector(conf, rois, model, packed_input=packed)
    gt_path = os.path.join(args.data_root,
                           conf.datasets_validation[0]["name"],
                           "validation", "label_2")

    seen = set()
    polls = 0
    ckpt_dir = os.path.join(args.run_dir, "weights")
    while args.max_polls == 0 or polls < args.max_polls:
        if os.path.isdir(ckpt_dir):
            steps = sorted(int(n.split("_")[1]) for n in os.listdir(ckpt_dir)
                           if n.startswith("step_"))
            for step in steps:
                if step in seen:
                    continue
                seen.add(step)
                st = restore_checkpoint(ckpt_dir, state, step)
                results = os.path.join(args.run_dir, "results",
                                       f"results_watch_{step}", "data")
                res, sel = test_kitti_3d(dataset, detect, st.params,
                                         st.batch_stats, conf, results,
                                         gt_path=gt_path,
                                         batch_size=eval_bs,
                                         packed_input=packed)
                print(f"step {step}: mean Car 3D R40 = {sel:.4f}")
        polls += 1
        time.sleep(args.poll_sec)


if __name__ == "__main__":
    main()
