#!/usr/bin/env python
"""Materialize the KITTI split1 train/validation layout.

Re-derivation of ref:kitti_split1/setup_split.py:25-135 — symlinks raw KITTI
`training/` files into `<out>/kitti_split1/{training,validation}` according to
train.txt / val.txt id lists, renumbering ids sequentially per split.

Usage:
    python scripts/setup_split.py --kitti /path/to/kitti --out ./data \
        --train_ids train.txt --val_ids val.txt
"""

import argparse
import os


def _link_split(kitti_root, out_base, ids, subdirs=("calib", "image_2", "label_2"),
                exts=(".txt", ".png", ".txt")):
    for sub in subdirs:
        os.makedirs(os.path.join(out_base, sub), exist_ok=True)
    for new_idx, src_id in enumerate(ids):
        for sub, ext in zip(subdirs, exts):
            src = os.path.join(kitti_root, "training", sub, src_id + ext)
            dst = os.path.join(out_base, sub, f"{new_idx:06d}{ext}")
            if os.path.islink(dst) or os.path.exists(dst):
                os.remove(dst)
            os.symlink(os.path.abspath(src), dst)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kitti", required=True, help="raw KITTI object root "
                   "(contains training/ and testing/)")
    p.add_argument("--out", required=True)
    p.add_argument("--train_ids", required=True, help="txt file of train ids")
    p.add_argument("--val_ids", required=True, help="txt file of val ids")
    args = p.parse_args()

    with open(args.train_ids) as f:
        train_ids = [l.strip() for l in f if l.strip()]
    with open(args.val_ids) as f:
        val_ids = [l.strip() for l in f if l.strip()]

    base = os.path.join(args.out, "kitti_split1")
    _link_split(args.kitti, os.path.join(base, "training"), train_ids)
    _link_split(args.kitti, os.path.join(base, "validation"), val_ids)
    print(f"linked {len(train_ids)} training / {len(val_ids)} validation ids "
          f"under {base}")


if __name__ == "__main__":
    main()
