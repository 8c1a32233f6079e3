#!/usr/bin/env python
"""Standalone evaluation CLI (re-derivation of ref:scripts/test_rpn_3d.py).

Loads the run's pickled config + a checkpoint and runs the KITTI test driver.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True, help="training output dir")
    p.add_argument("--data_root", required=True)
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--phase", default="validation",
                   help="validation | val_train (train split with "
                        "deterministic eval preprocessing) | test")
    p.add_argument("--torch_weights", default=None,
                   help="reference-format .pth/.pkl checkpoint to evaluate "
                        "(parity mode: forces the exact gather-path DCN)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (JAX_PLATFORMS is ignored "
                        "when a TPU plugin is registered)")
    p.add_argument("--no_src_snapshot", action="store_true",
                   help="ignore the run's model_src/ code snapshot and "
                        "evaluate with the installed package instead")
    p.add_argument("--mesh_devices", type=int, default=0,
                   help="shard batched eval over this many devices "
                        "(data-parallel inference; needs eval_batch_size "
                        "divisible by it)")
    p.add_argument("--mesh_spatial", type=int, default=1,
                   help="with --mesh_devices: also shard image height over "
                        "this many devices (2-D data x spatial mesh)")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="with --mesh_devices: tensor-parallel — shard wide "
                        "parameters' output channels over this many devices "
                        "(params follow their 'model'-axis placement)")
    args = p.parse_args()

    # prefer the run's source snapshot: rebuild the model from the code that
    # trained the checkpoint (ref:scripts/test_rpn_3d.py:48 imports the
    # run-dir copy; utils/source_snapshot.py). Must happen before the
    # package import below.
    snap = os.path.join(args.run_dir, "model_src")
    if not args.no_src_snapshot and os.path.isdir(
            os.path.join(snap, "m3dssd_tpu")):
        sys.path.insert(0, snap)
        # the snapshot carries only the Python package; keep the native C++
        # eval kernels (repo-level native/) reachable for the fast path
        live_native = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "native")
        if os.path.isdir(live_native):
            os.environ.setdefault("M3DSSD_NATIVE_DIR", live_native)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import m3dssd_tpu
    print(f"m3dssd_tpu source: {os.path.dirname(m3dssd_tpu.__file__)}")
    from m3dssd_tpu.config import Config
    from m3dssd_tpu.data.kitti import Kitti3DDataset
    from m3dssd_tpu.anchors import locate_anchors
    from m3dssd_tpu.inference.detect import make_detector
    from m3dssd_tpu.inference.test_driver import test_kitti_3d
    from m3dssd_tpu.models import build
    from m3dssd_tpu.train.state import create_train_state
    from m3dssd_tpu.utils.checkpoint import restore_checkpoint, latest_step

    conf = Config.load(os.path.join(args.run_dir, "conf.pkl"))
    if args.torch_weights:
        from m3dssd_tpu.utils.torch_import import (
            load_reference_checkpoint, load_torch_file, pin_parity_conf)
        sd = load_torch_file(args.torch_weights)
        conf = pin_parity_conf(conf, sd)
        model = build(conf, "test")
        state = create_train_state(conf, model, jax.random.PRNGKey(0),
                                   max_iter=1)
        block = "basic" if conf.back_bone in ("dla34", "dla34_depth") \
            else "bottleneck"
        params, batch_stats, _ = load_reference_checkpoint(
            {"params": state.params, "batch_stats": state.batch_stats},
            sd, num_anchors=conf.anchors.shape[0],
            num_classes=conf.num_classes, block=block)
        state = state.replace(params=params, batch_stats=batch_stats)
    else:
        model = build(conf, "test")
        state = create_train_state(conf, model, jax.random.PRNGKey(0),
                                   max_iter=1)
        state = restore_checkpoint(os.path.join(args.run_dir, "weights"),
                                   state, args.step)

    dataset = Kitti3DDataset(conf, args.data_root, phase=args.phase)
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
        mesh = make_mesh(args.mesh_devices, spatial=args.mesh_spatial,
                         model=args.mesh_model)
        tp = args.mesh_model > 1
        if tp:
            # tensor-parallel eval: pre-place params channel-sharded over
            # 'model' and let the detector follow that placement
            from m3dssd_tpu.parallel import replicate_state
            state = state.replace(
                params=replicate_state(mesh, state.params),
                batch_stats=replicate_state(mesh, state.batch_stats))
        detect = make_batch_detector(conf, rois, model, packed_input=packed,
                                     mesh=mesh, follow_params_sharding=tp)
    elif eval_bs > 1:
        from m3dssd_tpu.inference.detect import make_batch_detector
        detect = make_batch_detector(conf, rois, model, packed_input=packed)
    else:
        detect = make_detector(conf, rois, model, packed_input=packed)
    if args.torch_weights:
        tag = os.path.splitext(os.path.basename(args.torch_weights))[0]
        results = os.path.join(args.run_dir, "results",
                               f"results_parity_{tag}", "data")
    else:
        step = args.step or latest_step(os.path.join(args.run_dir, "weights"))
        results = os.path.join(args.run_dir, "results",
                               f"results_test_{step}", "data")
    from m3dssd_tpu.data.kitti import _PHASE_DIR
    # gt must come from the same dataset list the imdb was built from
    db = (conf.datasets_train if args.phase in ("train", "val_train")
          else conf.datasets_validation)[0]
    gt_path = os.path.join(args.data_root, db["name"],
                           _PHASE_DIR.get(args.phase, args.phase), "label_2")
    res, sel = test_kitti_3d(dataset, detect, state.params, state.batch_stats,
                             conf, results,
                             gt_path=gt_path if os.path.isdir(gt_path) else None,
                             batch_size=eval_bs, packed_input=packed)
    if res:
        print(res["_text"])
        print("selection metric (mean Car 3D R40):", sel)


if __name__ == "__main__":
    main()
