#!/usr/bin/env python
"""Convert a locally-provided ImageNet-pretrained DLA torch checkpoint into
an orbax SEED checkpoint usable as `conf.pretrained` / `--pretrained`.

The reference auto-downloads these trunk weights at model build time from
http://dl.yf.io/dla/models/imagenet/ (ref:model/pose_dla_dcn.py:27-28,
399-415 — files like `dla34-ba72cf86.pth`, `dla102-d94d9790.pth`) and
fine-tunes from them; PERF.md's convergence analysis shows the from-scratch
bg-collapse transient this bootstrap avoids. This environment has no network
egress, so fetch the file on a connected machine and pass it here:

    python scripts/fetch_pretrained.py --dla_file dla34-ba72cf86.pth \
        --backbone dla34 --out output/imagenet_dla34

    python scripts/train.py ... --pretrained output/imagenet_dla34

The ImageNet file is a bare DLA-classifier state_dict (`base_layer.*`,
`level0..5.*`, `fc.*`); the full-model namespace the importer understands
prefixes the trunk with `base.base.` (utils/torch_import.flax_to_torch_key),
and the classifier head `fc.*` has no counterpart here, exactly as the
reference drops it (`pose_dla_dcn.py:412-415` load_state_dict(strict=False)).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert(dla_file: str, out_dir: str, backbone: str = "dla34",
            config: str = "kitti_3d_base", crop=(64, 128)):
    """Returns the importer stats dict; writes `<out_dir>/seed`."""
    import jax
    import jax.numpy as jnp

    from m3dssd_tpu.config import load_config
    from m3dssd_tpu.models import build
    from m3dssd_tpu.utils.checkpoint import save_seed
    from m3dssd_tpu.utils.synthetic_conf import finalize_conf_synthetic
    from m3dssd_tpu.utils.torch_import import (load_reference_checkpoint,
                                               load_torch_file)

    sd = load_torch_file(dla_file)
    # trunk-only namespace -> full-model namespace; drop the ImageNet
    # classifier head (fc.*), mirroring the reference's strict=False load
    sd = {f"base.base.{k}": v for k, v in sd.items()
          if not k.startswith("fc.")}

    # params are input-size independent: a tiny synthetic conf suffices to
    # materialize the tree (anchors/whitening are irrelevant to the trunk)
    conf = finalize_conf_synthetic(load_config(config).replace(
        back_bone=backbone, crop_size=list(crop), test_scale=list(crop),
        num_anchor_scales=2, pre_train=False))
    model = build(conf)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, *crop, 3), jnp.float32), train=False)

    block = "basic" if backbone in ("dla34", "dla34_depth") else "bottleneck"
    params, batch_stats, stats = load_reference_checkpoint(
        v, sd, num_anchors=conf.anchors.shape[0],
        num_classes=conf.num_classes, block=block)
    if stats["loaded"] == 0:
        raise SystemExit(f"no tensors imported from {dla_file} — is it an "
                         f"ImageNet DLA checkpoint for {backbone}?")
    if stats["shape_mismatch"]:
        raise SystemExit(f"shape mismatches (wrong --backbone?): "
                         f"{stats['shape_mismatch'][:5]}")
    save_seed(out_dir, params, batch_stats)
    print(f"seed checkpoint written to {out_dir}/seed: "
          f"{stats['loaded']} tensors imported, "
          f"{len(stats['missing'])} left at init (necks/heads — expected)")
    return stats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dla_file", required=True,
                   help="local ImageNet DLA .pth (see module docstring URL)")
    p.add_argument("--backbone", default="dla34",
                   help="dla34 | dla34_depth | dla60 | dla102 | dla102x")
    p.add_argument("--out", required=True, help="seed checkpoint directory")
    p.add_argument("--config", default="kitti_3d_base")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend")
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    convert(args.dla_file, args.out, args.backbone, args.config)


if __name__ == "__main__":
    main()
