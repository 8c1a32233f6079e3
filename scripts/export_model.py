#!/usr/bin/env python
"""Export a trained run's detector as a self-contained StableHLO artifact.

Serving-oriented extra beyond the reference: the blob embeds forward +
decode + NMS + weights, lowered for an explicit platform list, and is
loaded with `m3dssd_tpu.inference.export.load_detector` (no config,
checkpoint, or model code needed at serving time).

    python scripts/export_model.py --run_dir output/exp --out model.shlo \
        --platforms tpu,cpu --batch_size 8
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True, help="training output dir")
    p.add_argument("--out", required=True, help="artifact path (.shlo)")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=0,
                   help="0 = single-image signature; B = batched")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering platforms")
    p.add_argument("--packed", action="store_true",
                   help="expect host space-to-depth packed input "
                        "[B, H/2, W/2, 12] (needs conf.stem_s2d)")
    p.add_argument("--fold_bn", action="store_true",
                   help="constant-fold frozen BatchNorm into the preceding "
                        "convs before lowering (utils/fold_bn.py; exact — "
                        "runtime-neutral on TPU since XLA folds constant BN "
                        "affines anyway, but shrinks the artifact's op "
                        "count; PERF.md round 5)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend for the export process")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from m3dssd_tpu.anchors import locate_anchors
    from m3dssd_tpu.config import Config
    from m3dssd_tpu.inference.detect import packed_input_eligible
    from m3dssd_tpu.inference.export import export_detector, save_exported
    from m3dssd_tpu.models import build
    from m3dssd_tpu.train.state import create_train_state
    from m3dssd_tpu.utils.checkpoint import restore_checkpoint

    conf = Config.load(os.path.join(args.run_dir, "conf.pkl"))
    model = build(conf, "test")
    state = create_train_state(conf, model, jax.random.PRNGKey(0), max_iter=1)
    state = restore_checkpoint(os.path.join(args.run_dir, "weights"),
                               state, args.step)

    packed = args.packed and packed_input_eligible(conf)
    if args.packed and not packed:
        print("warning: --packed ignored (conf.stem_s2d off or odd dims)")
    rois = locate_anchors(conf.anchors, conf.feat_size, conf.feat_stride)
    exp = export_detector(conf, rois, model, state.params, state.batch_stats,
                          batch_size=args.batch_size, packed_input=packed,
                          platforms=args.platforms.split(","),
                          fold_bn=args.fold_bn)
    save_exported(exp, args.out, conf=conf, batch_size=args.batch_size,
                  packed_input=packed)
    print(f"wrote {args.out} ({os.path.getsize(args.out)/1e6:.1f} MB) "
          f"platforms={list(exp.platforms)}")


if __name__ == "__main__":
    main()
