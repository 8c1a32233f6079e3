#!/usr/bin/env python
"""Post-hoc AP-table trajectory over a run's per-epoch result dirs.

The trainer saves KITTI result txts under <run>/results/results_<epoch>/data
at every eval epoch (trainer.py:_eval). This recomputes the FULL AP table
(2D bbox / BEV / 3D, AP11 + AP-R40, all classes) for each of them, so a
convergence run only has to track one scalar online and the rest of the
table can be reconstructed offline (ref:scripts/train_rpn_3d.py:266-297
prints the same table per eval epoch).

Usage:
    python scripts/eval_trajectory.py --run /tmp/conv3/out \
        --gt /tmp/conv3/data/kitti_split1/validation/label_2 [--metrics ...]
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True, help="trainer output dir")
    p.add_argument("--gt", required=True, help="gt label_2 dir")
    p.add_argument("--metrics", nargs="*",
                   default=["Car_image_R40", "Car_bev_R40", "Car_3d_R40"],
                   help="grouped metric keys to tabulate ([easy, mod, hard])")
    args = p.parse_args()

    from m3dssd_tpu.eval.kitti_eval import evaluate_kitti

    rdir = os.path.join(args.run, "results")
    epochs = sorted(
        (int(m.group(1)), os.path.join(rdir, d, "data"))
        for d in os.listdir(rdir)
        if (m := re.fullmatch(r"results_(\d+)", d))
        and os.path.isdir(os.path.join(rdir, d, "data")))
    rows = []
    for epoch, path in epochs:
        res = evaluate_kitti(args.gt, path)
        row = {"epoch": epoch}
        for k in args.metrics:
            if k in res:
                row[k] = [round(v, 2) for v in res[k]]
        rows.append(row)
        print(json.dumps(row), flush=True)
    print("TRAJECTORY " + json.dumps(rows))


if __name__ == "__main__":
    main()
