#!/usr/bin/env python
"""Timing of the pure-Python KITTI matching fallback: batched (fused, all 41
thresholds per image at once) vs the per-threshold transcription loop it
replaced (round-4 verdict item: a no-toolchain host must stay usable —
ref:lib/eval/eval.py:290-336 batches the same way with numba upstream).

Pure numpy/host — no JAX, no TPU. Prints both timings and the speedup.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_annos(n_images, seed=0):
    """Detections are jittered copies of the gts plus false positives, so
    the matcher sees realistic tp rates and the threshold grid fills to 41
    (independent random boxes almost never reach IoU 0.7 — both code paths
    would then skip all real work)."""
    rng = np.random.default_rng(seed)
    gt, dt = [], []
    names = np.array(["Car", "Pedestrian", "Cyclist"])

    def boxes(n):
        x = rng.uniform(0, 1100, n)
        y = rng.uniform(0, 300, n)
        w = rng.uniform(30, 120, n)
        h = rng.uniform(40, 130, n)
        return np.stack([x, y, x + w, y + h], axis=1)

    def annos(bbox, name):
        n = len(bbox)
        return {
            "name": name,
            "truncated": rng.uniform(0, 0.3, n),
            "occluded": rng.integers(0, 2, n).astype(np.int64),
            "alpha": rng.uniform(-np.pi, np.pi, n),
            "bbox": bbox,
            "dimensions": rng.uniform(1, 4, (n, 3)),
            "location": rng.uniform(-20, 60, (n, 3)),
            "rotation_y": rng.uniform(-np.pi, np.pi, n),
        }

    for _ in range(n_images):
        ng = int(rng.integers(3, 12))
        gb = boxes(ng)
        gname = rng.choice(names, ng)
        # ~85% of gts detected (small jitter keeps IoU > 0.7) + extra fps
        det_mask = rng.uniform(size=ng) < 0.85
        db_tp = gb[det_mask] + rng.normal(0, 1.5, (int(det_mask.sum()), 4))
        nfp = int(rng.integers(5, 25))
        db = np.concatenate([db_tp, boxes(nfp)], axis=0)
        dname = np.concatenate([gname[det_mask], rng.choice(names, nfp)])
        g = annos(gb, gname)
        d = annos(db, dname)
        d["score"] = rng.uniform(0, 1, len(db))
        gt.append(g)
        dt.append(d)
    return gt, dt


def main():
    os.environ["M3DSSD_NO_NATIVE"] = "1"       # force the python engine
    import m3dssd_tpu.eval.kitti_eval as ke
    from m3dssd_tpu.eval import native
    assert not native.available(), "bench is about the NO-native fallback"

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    gt, dt = synth_annos(n)
    args = (gt, dt, [0, 1, 2], [0, 1, 2], 0)

    t0 = time.perf_counter()
    ke.eval_class(*args, min_overlaps=ke.OVERLAP_0_7[None],
                  compute_aos=True)
    fused = time.perf_counter() - t0

    # the pre-round-4 shape: one full matching per threshold per image
    def per_threshold(overlaps, gtd, dtd, ig, idt, dc, metric, min_overlap,
                      thresholds, compute_aos, pr):
        for t, thresh in enumerate(thresholds):
            tp, fp, fn, sim, _ = ke.compute_statistics(
                overlaps, gtd, dtd, ig, idt, dc, metric,
                min_overlap=min_overlap, thresh=thresh,
                compute_fp=True, compute_aos=compute_aos)
            pr[t, 0] += tp
            pr[t, 1] += fp
            pr[t, 2] += fn
            if sim != -1:
                pr[t, 3] += sim

    orig = ke.fused_statistics_py
    ke.fused_statistics_py = per_threshold
    try:
        t0 = time.perf_counter()
        ke.eval_class(*args, min_overlaps=ke.OVERLAP_0_7[None],
                      compute_aos=True)
        loop = time.perf_counter() - t0
    finally:
        ke.fused_statistics_py = orig

    print(f"python fallback over {n} images x 3 classes x AOS: "
          f"fused {fused:.2f}s vs per-threshold loop {loop:.2f}s "
          f"({loop / fused:.1f}x)")


if __name__ == "__main__":
    main()
