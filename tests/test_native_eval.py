"""Native (C++) eval kernels vs the pure-Python implementation."""

import numpy as np
import pytest

from m3dssd_tpu.eval import native
from m3dssd_tpu.eval.kitti_eval import compute_statistics, image_box_overlap
from m3dssd_tpu.eval.rotate_iou import d3_box_overlap, rotate_iou

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native eval library not built")


def _rand_rboxes(rng, n):
    return np.stack([rng.uniform(-20, 20, n), rng.uniform(0, 60, n),
                     rng.uniform(1, 5, n), rng.uniform(1, 5, n),
                     rng.uniform(-np.pi, np.pi, n)], axis=1)


def test_native_rotated_iou_matches_python():
    rng = np.random.default_rng(0)
    a = _rand_rboxes(rng, 40)
    b = _rand_rboxes(rng, 30)
    # nudge some boxes to coincide / touch exactly (boundary cases)
    b[:10] = a[:10]
    for crit in [-1, 0, 1, 2]:
        got = native.rotated_iou(a, b, crit)
        want = rotate_iou(a, b, crit)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_native_d3_overlap_matches_python():
    rng = np.random.default_rng(1)
    def boxes(n):
        return np.stack([rng.uniform(-20, 20, n), rng.uniform(0, 3, n),
                         rng.uniform(5, 60, n), rng.uniform(2, 5, n),
                         rng.uniform(1, 2, n), rng.uniform(1, 2, n),
                         rng.uniform(-np.pi, np.pi, n)], axis=1)
    a, b = boxes(25), boxes(20)
    b[:5] = a[:5]
    got = native.d3_box_overlap(a, b)
    want = d3_box_overlap(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_native_image_overlap_matches_python():
    rng = np.random.default_rng(2)
    def boxes(n):
        x1 = rng.uniform(0, 100, n); y1 = rng.uniform(0, 100, n)
        return np.stack([x1, y1, x1 + rng.uniform(5, 80, n),
                         y1 + rng.uniform(5, 80, n)], axis=1)
    a, b = boxes(30), boxes(25)
    for crit in [-1, 0, 1]:
        np.testing.assert_allclose(native.image_box_overlap(a, b, crit),
                                   image_box_overlap(a, b, crit),
                                   rtol=1e-12, atol=1e-12)


def _rand_matching_case(rng, ngt=12, ndt=15):
    gt = np.concatenate([np.sort(rng.uniform(0, 300, [ngt, 4]), axis=1),
                         rng.uniform(-np.pi, np.pi, [ngt, 1])], axis=1)
    dt = np.concatenate([np.sort(rng.uniform(0, 300, [ndt, 4]), axis=1),
                         rng.uniform(-np.pi, np.pi, [ndt, 1]),
                         rng.uniform(0, 1, [ndt, 1])], axis=1)
    overlaps = rng.uniform(0, 1, [ndt, ngt])
    ig = rng.choice([-1, 0, 1], ngt, p=[0.2, 0.6, 0.2]).astype(np.int64)
    idt = rng.choice([-1, 0, 1], ndt, p=[0.2, 0.6, 0.2]).astype(np.int64)
    dc = np.sort(rng.uniform(0, 300, [2, 4]), axis=1)
    return overlaps, gt, dt, ig, idt, dc


@pytest.mark.parametrize("metric", [0, 1])
@pytest.mark.parametrize("compute_fp", [False, True])
def test_native_compute_statistics_matches_python(metric, compute_fp):
    rng = np.random.default_rng(3)
    for case in range(20):
        overlaps, gt, dt, ig, idt, dc = _rand_matching_case(rng)
        for thresh in ([0.0] if not compute_fp else [0.0, 0.4, 0.8]):
            want = compute_statistics(overlaps, gt, dt, ig, idt, dc, metric,
                                      min_overlap=0.5, thresh=thresh,
                                      compute_fp=compute_fp, compute_aos=True)
            got = native.compute_statistics(overlaps, gt, dt, ig, idt, dc,
                                            metric, min_overlap=0.5,
                                            thresh=thresh,
                                            compute_fp=compute_fp,
                                            compute_aos=True)
            assert got[0:3] == want[0:3], (case, thresh)
            assert got[3] == pytest.approx(want[3], abs=1e-9)
            np.testing.assert_allclose(got[4], want[4])


def test_native_fused_statistics_matches_loop():
    rng = np.random.default_rng(4)
    overlaps, gt, dt, ig, idt, dc = _rand_matching_case(rng, 20, 25)
    thresholds = np.array([0.1, 0.3, 0.5, 0.7, 0.9])
    pr_native = np.zeros([5, 4])
    native.fused_statistics(overlaps, gt, dt, ig, idt, dc, 0, 0.5,
                            thresholds, True, pr_native)
    pr_py = np.zeros([5, 4])
    for t, th in enumerate(thresholds):
        tp, fp, fn, sim, _ = compute_statistics(
            overlaps, gt, dt, ig, idt, dc, 0, min_overlap=0.5, thresh=th,
            compute_fp=True, compute_aos=True)
        pr_py[t, 0] += tp; pr_py[t, 1] += fp; pr_py[t, 2] += fn
        if sim != -1:
            pr_py[t, 3] += sim
    np.testing.assert_allclose(pr_native, pr_py, atol=1e-9)


def test_full_eval_native_equals_python(tmp_path):
    """End-to-end: evaluate_kitti with and without the native path."""
    import os
    from m3dssd_tpu.eval.kitti_eval import evaluate_kitti

    rng = np.random.default_rng(5)
    gt_dir = tmp_path / "gt"; gt_dir.mkdir()
    dt_dir = tmp_path / "dt"; dt_dir.mkdir()
    for i in range(3):
        rows_gt, rows_dt = [], []
        for k in range(8):
            x1, y1 = 20 + (k % 4) * 250, 20 + (k // 4) * 150
            w, h = rng.uniform(60, 110), rng.uniform(50, 90)
            x3, z3 = rng.uniform(-10, 10), rng.uniform(10, 40)
            ry = rng.uniform(-np.pi, np.pi)
            row = ["Car", 0.0, 0, 0.5, x1, y1, x1 + w, y1 + h,
                   1.5, 1.6, 3.9, x3, 1.65, z3, ry]
            rows_gt.append(row)
            noisy = list(row)
            noisy[4] += rng.uniform(-15, 15)   # jitter x1
            noisy[13] += rng.uniform(-3, 3)    # jitter z
            rows_dt.append(noisy + [round(float(rng.uniform(0.3, 1)), 3)])
        for d, rows in [(gt_dir, rows_gt), (dt_dir, rows_dt)]:
            with open(d / f"{i:06d}.txt", "w") as f:
                for r in rows:
                    f.write(" ".join(str(v) for v in r) + "\n")

    res_native = evaluate_kitti(str(gt_dir), str(dt_dir), classes=["Car"])
    os.environ["M3DSSD_NO_NATIVE"] = "1"
    try:
        # force a fresh decision
        native._TRIED = False
        native._LIB = None
        res_py = evaluate_kitti(str(gt_dir), str(dt_dir), classes=["Car"])
    finally:
        del os.environ["M3DSSD_NO_NATIVE"]
        native._TRIED = False
        native._LIB = None
    for k in res_native:
        if k.startswith("_"):
            continue
        np.testing.assert_allclose(res_native[k], res_py[k], atol=1e-9,
                                   err_msg=k)
