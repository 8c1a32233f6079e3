"""NMS, rotated IoU and KITTI AP evaluation tests."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from m3dssd_tpu.eval.kitti_eval import (evaluate_kitti, eval_class,
                                        get_official_eval_result,
                                        get_thresholds, image_box_overlap)
from m3dssd_tpu.eval.kitti_common import get_label_annos
from m3dssd_tpu.eval.rotate_iou import (d3_box_overlap, rbbox_corners,
                                        rotate_iou)
from m3dssd_tpu.ops.nms import nms, py_cpu_nms


# ---------------------------------------------------------------- NMS

def test_nms_matches_python_oracle():
    rng = np.random.default_rng(0)
    N = 200
    x1 = rng.uniform(0, 100, N)
    y1 = rng.uniform(0, 100, N)
    dets = np.stack([x1, y1, x1 + rng.uniform(5, 50, N),
                     y1 + rng.uniform(5, 50, N),
                     rng.uniform(0, 1, N)], axis=1).astype(np.float32)
    for thresh in [0.3, 0.5, 0.7]:
        keep_ref = sorted(py_cpu_nms(dets, thresh))
        keep_jax = np.flatnonzero(
            np.asarray(nms(jnp.array(dets[:, :4]), jnp.array(dets[:, 4]),
                           thresh))).tolist()
        assert keep_jax == keep_ref, thresh


def test_nms_keeps_highest_of_duplicates():
    dets = np.array([[0, 0, 10, 10, 0.9],
                     [0, 0, 10, 10, 0.8],
                     [50, 50, 60, 60, 0.7]], np.float32)
    keep = np.asarray(nms(jnp.array(dets[:, :4]), jnp.array(dets[:, 4]), 0.5))
    assert keep.tolist() == [True, False, True]


# ---------------------------------------------------------- rotated IoU

def _poly_area_oracle(c):
    """Shoelace area of a polygon given ordered corners [M,2]."""
    x, y = c[:, 0], c[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def test_rbbox_corners_area():
    rng = np.random.default_rng(1)
    boxes = np.stack([rng.uniform(-5, 5, 10), rng.uniform(-5, 5, 10),
                      rng.uniform(1, 4, 10), rng.uniform(1, 4, 10),
                      rng.uniform(-np.pi, np.pi, 10)], axis=1)
    corners = rbbox_corners(boxes)
    for b, c in zip(boxes, corners):
        assert _poly_area_oracle(c) == pytest.approx(b[2] * b[3], rel=1e-9)


def test_rotate_iou_axis_aligned_matches_plain():
    a = np.array([[5.0, 5.0, 10.0, 10.0, 0.0]])      # box [0,10]x[0,10]
    b = np.array([[10.0, 10.0, 10.0, 10.0, 0.0]])    # box [5,15]x[5,15]
    got = rotate_iou(a, b)[0, 0]
    assert got == pytest.approx(25.0 / 175.0, rel=1e-6)


def test_rotate_iou_identical_and_disjoint():
    a = np.array([[0.0, 0.0, 4.0, 2.0, 0.7]])
    assert rotate_iou(a, a)[0, 0] == pytest.approx(1.0, rel=1e-6)
    b = np.array([[100.0, 100.0, 4.0, 2.0, -0.3]])
    assert rotate_iou(a, b)[0, 0] == pytest.approx(0.0, abs=1e-9)


def test_rotate_iou_45_degrees():
    """Unit square vs itself rotated 45°: intersection is a regular octagon
    with area 2*(sqrt(2)-1), IoU = area/(2-area)."""
    a = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b = np.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
    inter = 2 * (np.sqrt(2) - 1)
    want = inter / (2 - inter)
    assert rotate_iou(a, b)[0, 0] == pytest.approx(want, rel=1e-6)


def test_rotate_iou_rotation_invariance():
    """IoU depends only on relative pose: rotating both boxes together about
    the origin-centered pair preserves IoU."""
    rng = np.random.default_rng(2)
    for _ in range(10):
        w1, h1, w2, h2 = rng.uniform(1, 4, 4)
        dx, dy = rng.uniform(-2, 2, 2)
        r1, r2 = rng.uniform(-np.pi, np.pi, 2)
        a = np.array([[0.0, 0.0, w1, h1, r1]])
        b = np.array([[dx, dy, w2, h2, r2]])
        base = rotate_iou(a, b)[0, 0]
        th = rng.uniform(0, 2 * np.pi)
        # rotate b's center by -th in this (clockwise-positive) convention
        c, s = np.cos(th), np.sin(th)
        b2 = np.array([[c * dx + s * dy, -s * dx + c * dy, w2, h2, r2 + th]])
        a2 = np.array([[0.0, 0.0, w1, h1, r1 + th]])
        got = rotate_iou(a2, b2)[0, 0]
        assert got == pytest.approx(base, abs=1e-6)


def test_d3_box_overlap_full_and_height():
    # identical boxes -> 1
    box = np.array([[1.0, 1.65, 10.0, 3.9, 1.5, 1.6, 0.3]])  # x,y,z,l,h,w,ry
    assert d3_box_overlap(box, box)[0, 0] == pytest.approx(1.0, rel=1e-6)
    # same footprint, stacked vertically with half overlap in height
    b2 = box.copy()
    b2[0, 1] += 0.75  # bottom moves down by half the height
    got = d3_box_overlap(box, b2)[0, 0]
    assert got == pytest.approx(0.75 / (1.5 + 1.5 - 0.75), rel=1e-5)


# ----------------------------------------------------------- AP evaluation

def test_get_thresholds_simple():
    scores = np.array([0.9, 0.8, 0.7, 0.6, 0.5])
    th = get_thresholds(scores.copy(), num_gt=5)
    assert th[0] == pytest.approx(0.9)
    assert len(th) >= 1


def _write_label(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(" ".join(str(v) for v in r) + "\n")


def test_eval_perfect_detections(tmp_path):
    """Detections identical to gts (+score) must give AP == 100 for all
    metrics, and AP ~ 0 when detections are shifted far away."""
    gt_dir = tmp_path / "gt"; gt_dir.mkdir()
    dt_dir = tmp_path / "dt"; dt_dir.mkdir()
    rng = np.random.default_rng(3)
    # AP11's 41-point recall grid only saturates with >= 41 valid gts
    # (a property shared with the reference/devkit), so use 4 x 12 gts laid
    # out on a grid (no overlaps -> unambiguous greedy matching).
    for i in range(4):
        rows = []
        for k in range(12):
            gx, gy = k % 4, k // 4
            x1, y1 = 20 + gx * 250, 20 + gy * 120
            w, h = rng.uniform(60, 110), rng.uniform(50, 90)
            x3, z3 = rng.uniform(-10, 10), rng.uniform(10, 40)
            ry = rng.uniform(-np.pi, np.pi)
            rows.append(["Car", 0.0, 0, 0.5, x1, y1, x1 + w, y1 + h,
                         1.5, 1.6, 3.9, x3, 1.65, z3, ry])
        _write_label(gt_dir / f"{i:06d}.txt", rows)
        _write_label(dt_dir / f"{i:06d}.txt",
                     [r + [round(float(rng.uniform(0.5, 1.0)), 3)]
                      for r in rows])
    res = evaluate_kitti(str(gt_dir), str(dt_dir), classes=["Car"])
    for key in ["Car_image", "Car_bev", "Car_3d",
                "Car_image_R40", "Car_bev_R40", "Car_3d_R40"]:
        np.testing.assert_allclose(res[key], [100.0] * 3, atol=0.5, err_msg=key)
    # AOS perfect too (alpha matches)
    np.testing.assert_allclose(res["Car_aos"], [100.0] * 3, atol=0.5)


def test_eval_false_positive_lowers_precision(tmp_path):
    gt_dir = tmp_path / "gt"; gt_dir.mkdir()
    dt_dir = tmp_path / "dt"; dt_dir.mkdir()
    gt_row = ["Car", 0.0, 0, 0.5, 100, 100, 200, 180, 1.5, 1.6, 3.9,
              0.0, 1.65, 15.0, 0.3]
    _write_label(gt_dir / "000000.txt", [gt_row])
    # one perfect detection + one high-scoring false positive
    fp_row = ["Car", 0.0, 0, 0.5, 400, 100, 500, 180, 1.5, 1.6, 3.9,
              8.0, 1.65, 15.0, 0.3]
    _write_label(dt_dir / "000000.txt",
                 [gt_row + [0.8], fp_row + [0.9]])
    res = evaluate_kitti(str(gt_dir), str(dt_dir), classes=["Car"])
    assert res["Car_3d"][1] < 100.0
    assert res["Car_3d"][1] > 0.0


def test_eval_ignores_dontcare_and_van(tmp_path):
    """Detections on Van gts or inside DontCare regions must not count as FP
    for the Car class."""
    car = ["Car", 0.0, 0, 0.5, 100, 100, 200, 180, 1.5, 1.6, 3.9,
           0.0, 1.65, 15.0, 0.3]
    van = ["Van", 0.0, 0, 0.5, 300, 100, 400, 180, 1.9, 1.9, 5.5,
           5.0, 1.65, 15.0, 0.3]
    dc = ["DontCare", -1, -1, -10, 500, 100, 600, 180,
          -1, -1, -1, -1000, -1000, -1000, -10]
    van_det = ["Car", 0.0, 0, 0.5, 300, 100, 400, 180, 1.9, 1.9, 5.5,
               5.0, 1.65, 15.0, 0.3]
    dc_det = ["Car", 0.0, 0, 0.5, 500, 100, 600, 180, 1.5, 1.6, 3.9,
              10.0, 1.65, 15.0, 0.3]

    def run(name, det_rows):
        gt_dir = tmp_path / f"gt_{name}"; gt_dir.mkdir()
        dt_dir = tmp_path / f"dt_{name}"; dt_dir.mkdir()
        _write_label(gt_dir / "000000.txt", [car, van, dc])
        _write_label(dt_dir / "000000.txt", det_rows)
        return evaluate_kitti(str(gt_dir), str(dt_dir), classes=["Car"])

    clean = run("clean", [car + [0.9]])
    spurious = run("spur", [car + [0.9], van_det + [0.8], dc_det + [0.7]])
    # detections matching a Van gt or inside a DontCare region are neutral:
    # AP identical with and without them
    np.testing.assert_allclose(spurious["Car_image"], clean["Car_image"],
                               atol=1e-9)


def test_image_box_overlap_criteria():
    a = np.array([[0., 0., 10., 10.]])
    b = np.array([[0., 0., 5., 10.]])
    assert image_box_overlap(a, b)[0, 0] == pytest.approx(0.5)
    assert image_box_overlap(a, b, criterion=0)[0, 0] == pytest.approx(0.5)
    assert image_box_overlap(a, b, criterion=1)[0, 0] == pytest.approx(1.0)


def test_nms_select_matches_full_nms():
    from m3dssd_tpu.ops.nms import nms_select
    rng = np.random.default_rng(7)
    N, K = 300, 25
    x1 = rng.uniform(0, 200, N)
    y1 = rng.uniform(0, 200, N)
    dets = np.stack([x1, y1, x1 + rng.uniform(5, 60, N),
                     y1 + rng.uniform(5, 60, N),
                     rng.uniform(0, 1, N)], axis=1).astype(np.float32)
    for thresh in [0.3, 0.5]:
        keep_ref = py_cpu_nms(dets, thresh)[:K]
        idxs, valid = nms_select(jnp.array(dets[:, :4]),
                                 jnp.array(dets[:, 4]), thresh, K)
        got = np.asarray(idxs)[np.asarray(valid)].tolist()
        assert got == keep_ref, thresh


def test_nms_select_fewer_survivors_than_requested():
    from m3dssd_tpu.ops.nms import nms_select
    dets = np.array([[0, 0, 10, 10, 0.9],
                     [1, 1, 11, 11, 0.8],
                     [2, 0, 12, 10, 0.7]], np.float32)
    idxs, valid = nms_select(jnp.array(dets[:, :4]), jnp.array(dets[:, 4]),
                             0.5, 5)
    got = np.asarray(idxs)[np.asarray(valid)].tolist()
    assert got == py_cpu_nms(dets, 0.5)
    assert int(np.asarray(valid).sum()) == len(got)


def _random_boxes(rng, n, spread=60.0):
    x1 = rng.uniform(0, 200, n)
    y1 = rng.uniform(0, 80, n)
    w = rng.uniform(4, spread, n)
    h = rng.uniform(4, spread, n)
    boxes = np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    return boxes, scores


def test_nms_select_stop_below_matches_full_above_threshold():
    """Early-stop NMS: survivors above the stop threshold are exactly those
    of the full selection, in the same order; sub-threshold slots come back
    valid=False."""
    from m3dssd_tpu.ops.nms import nms_select
    rng = np.random.default_rng(31)
    for trial in range(8):
        boxes, scores = _random_boxes(rng, 120)
        # quantize scores so ties occur
        scores = np.round(scores * 20) / 20
        for thresh in (0.3, 0.6, 0.95):
            fi, fv = nms_select(jnp.asarray(boxes), jnp.asarray(scores),
                                0.4, 16)
            si, sv = nms_select(jnp.asarray(boxes), jnp.asarray(scores),
                                0.4, 16, stop_below=thresh)
            fi, fv, si, sv = map(np.asarray, (fi, fv, si, sv))
            above = fv & (scores[fi] >= thresh)
            # the early-stop output is the above-threshold prefix
            k = int(above.sum())
            assert above[:k].all() and not above[k:].any()
            assert sv[:k].all() and not sv[k:].any()
            np.testing.assert_array_equal(si[:k], fi[:k])


def test_nms_bitmask_matches_sequential():
    """The parallel bitmask fixpoint equals sequential greedy selection,
    including under score ties (stable order) and heavy overlap chains."""
    from m3dssd_tpu.ops.nms import nms_bitmask_select_t, nms_select_t
    rng = np.random.default_rng(32)
    for trial in range(8):
        n = 150
        boxes, scores = _random_boxes(rng, n, spread=100.0)
        scores = np.round(scores * 10) / 10          # many exact ties
        bt = jnp.asarray(boxes.T)
        sc = jnp.asarray(scores)
        si, sv = nms_select_t(bt, sc, 0.4, 24)
        bi, bv = nms_bitmask_select_t(bt, sc, 0.4, 24)
        np.testing.assert_array_equal(np.asarray(sv), np.asarray(bv))
        k = int(np.asarray(sv).sum())
        np.testing.assert_array_equal(np.asarray(si)[:k], np.asarray(bi)[:k])


def test_nms_bitmask_suppression_chain():
    """A < B < C score chain where B suppresses C but A suppresses B: greedy
    keeps A and C — the fixpoint must recover C (2 Jacobi rounds)."""
    from m3dssd_tpu.ops.nms import nms_bitmask_select_t, nms_select_t
    # +1-convention IoUs: A-B = B-C = 0.467 (> 0.4), A-C = 0.158 (< 0.4)
    boxes = np.array([[0, 0, 10, 10], [4, 0, 14, 10], [8, 0, 18, 10]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    bt = jnp.asarray(boxes.T)
    si, sv = nms_select_t(bt, jnp.asarray(scores), 0.4, 3)
    bi, bv = nms_bitmask_select_t(bt, jnp.asarray(scores), 0.4, 3)
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(bv))
    k = int(np.asarray(sv).sum())
    assert k == 2
    np.testing.assert_array_equal(np.asarray(si)[:k], np.asarray(bi)[:k])
    assert set(np.asarray(bi)[:k].tolist()) == {0, 2}


@pytest.mark.parametrize("metric", [0, 1])
@pytest.mark.parametrize("compute_fp", [False, True])
def test_compute_statistics_fast_matches_transcription(metric, compute_fp):
    """The vectorized fallback matcher equals the protocol transcription on
    randomized scenarios (same generator as the native parity test)."""
    from m3dssd_tpu.eval.kitti_eval import (compute_statistics,
                                            compute_statistics_fast)
    rng = np.random.default_rng(5)
    for case in range(30):
        ngt = int(rng.integers(0, 14))
        ndt = int(rng.integers(0, 18))
        gt = np.concatenate([np.sort(rng.uniform(0, 300, [ngt, 4]), axis=1),
                             rng.uniform(-np.pi, np.pi, [ngt, 1])], axis=1)
        dt = np.concatenate([np.sort(rng.uniform(0, 300, [ndt, 4]), axis=1),
                             rng.uniform(-np.pi, np.pi, [ndt, 1]),
                             rng.uniform(0, 1, [ndt, 1])], axis=1)
        # quantize scores/overlaps so exact ties exercise tie-breaking
        dt[:, -1] = np.round(dt[:, -1] * 8) / 8
        overlaps = np.round(rng.uniform(0, 1, [ndt, ngt]) * 8) / 8
        ig = rng.choice([-1, 0, 1], ngt, p=[0.2, 0.6, 0.2]).astype(np.int64)
        idt = rng.choice([-1, 0, 1], ndt, p=[0.2, 0.6, 0.2]).astype(np.int64)
        dc = np.sort(rng.uniform(0, 300, [2, 4]), axis=1)
        for thresh in ([0.0] if not compute_fp else [0.0, 0.5, 0.875]):
            want = compute_statistics(overlaps, gt, dt, ig, idt, dc, metric,
                                      min_overlap=0.5, thresh=thresh,
                                      compute_fp=compute_fp,
                                      compute_aos=compute_fp)
            got = compute_statistics_fast(overlaps, gt, dt, ig, idt, dc,
                                          metric, min_overlap=0.5,
                                          thresh=thresh,
                                          compute_fp=compute_fp,
                                          compute_aos=compute_fp)
            assert want[:3] == got[:3], (case, thresh)
            np.testing.assert_allclose(got[3], want[3], rtol=1e-12)
            np.testing.assert_array_equal(got[4], want[4])


def test_fused_statistics_py_matches_per_threshold_loop():
    from m3dssd_tpu.eval.kitti_eval import (compute_statistics,
                                            fused_statistics_py)
    rng = np.random.default_rng(6)
    ngt, ndt = 10, 14
    gt = np.concatenate([np.sort(rng.uniform(0, 300, [ngt, 4]), axis=1),
                         rng.uniform(-np.pi, np.pi, [ngt, 1])], axis=1)
    dt = np.concatenate([np.sort(rng.uniform(0, 300, [ndt, 4]), axis=1),
                         rng.uniform(-np.pi, np.pi, [ndt, 1]),
                         rng.uniform(0, 1, [ndt, 1])], axis=1)
    overlaps = rng.uniform(0, 1, [ndt, ngt])
    ig = np.zeros(ngt, np.int64)
    idt = np.zeros(ndt, np.int64)
    dc = np.sort(rng.uniform(0, 300, [1, 4]), axis=1)
    thresholds = np.linspace(0.0, 0.9, 41)
    pr = np.zeros([41, 4])
    fused_statistics_py(overlaps, gt, dt, ig, idt, dc, 0, 0.5, thresholds,
                        True, pr)
    want = np.zeros([41, 4])
    for t, th in enumerate(thresholds):
        tp, fp, fn, sim, _ = compute_statistics(
            overlaps, gt, dt, ig, idt, dc, 0, min_overlap=0.5, thresh=th,
            compute_fp=True, compute_aos=True)
        want[t] += [tp, fp, fn, sim if sim != -1 else 0.0]
    np.testing.assert_allclose(pr, want, rtol=1e-12)


def test_eval_engine_is_announced(caplog):
    """eval_class must say which matching engine ran (the silent python
    fallback was minutes-slow on large splits before it was batched)."""
    import logging as _logging
    import m3dssd_tpu.eval.kitti_eval as ke
    ke._ENGINE_LOGGED = False
    gt = [{"name": np.array(["Car"]), "truncated": np.zeros(1),
           "occluded": np.zeros(1, np.int64), "alpha": np.zeros(1),
           "bbox": np.array([[0.0, 0.0, 100.0, 100.0]]),
           "dimensions": np.ones((1, 3)), "location": np.zeros((1, 3)),
           "rotation_y": np.zeros(1)}]
    dt = [dict(gt[0], score=np.array([0.9]))]
    with caplog.at_level(_logging.INFO):
        ke.eval_class(gt, dt, [0], [1], 0, ke.OVERLAP_0_7[None][:, :, [0]])
    assert any("KITTI eval engine" in r.message for r in caplog.records)
    ke._ENGINE_LOGGED = False
