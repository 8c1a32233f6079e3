"""Property tests for the host geometry library."""

import numpy as np
import pytest

from m3dssd_tpu import geometry as geo
from m3dssd_tpu.data.synthetic import DEFAULT_P2


def test_alpha_rot_roundtrip():
    rng = np.random.default_rng(0)
    z = rng.uniform(5, 60, 100)
    x = rng.uniform(-20, 20, 100)
    ry = rng.uniform(-np.pi, np.pi, 100)
    alpha = geo.convert_rot_to_alpha(ry, z, x)
    back = geo.convert_alpha_to_rot(alpha, z, x)
    np.testing.assert_allclose(geo.snap_to_pi(back - ry), 0, atol=1e-9)


def test_project_backproject_roundtrip():
    p2 = DEFAULT_P2
    p2_inv = np.linalg.inv(p2)
    rng = np.random.default_rng(1)
    for _ in range(20):
        x3d, y3d, z3d = rng.uniform(-10, 10), rng.uniform(-2, 2), rng.uniform(5, 50)
        proj = p2 @ np.array([x3d, y3d, z3d, 1.0])
        u, v = proj[0] / proj[2], proj[1] / proj[2]
        back = geo.backproject(p2_inv, u, v, proj[2])
        np.testing.assert_allclose(back[:3], [x3d, y3d, z3d], atol=1e-6)


def test_project_3d_axis_aligned_box():
    """A yaw-0 box projects to corners symmetric about the projected center."""
    p2 = DEFAULT_P2
    verts = geo.project_3d(p2, 0.0, 0.0, 20.0, 2.0, 1.5, 4.0, 0.0)
    assert verts.shape == (8, 2)
    box = geo.bbox_from_verts(verts)
    cx_proj = p2 @ np.array([0.0, 0.0, 20.0, 1.0])
    cx_proj = cx_proj[:2] / cx_proj[2]
    # projected center inside the 2D box
    assert box[0] < cx_proj[0] < box[2]
    assert box[1] < cx_proj[1] < box[3]


def test_project_3d_batched_matches_scalar():
    rng = np.random.default_rng(2)
    xs = rng.uniform(-5, 5, 7)
    zs = rng.uniform(10, 40, 7)
    rys = rng.uniform(-np.pi, np.pi, 7)
    batched = geo.project_3d(DEFAULT_P2, xs, 0.0, zs, 1.6, 1.5, 3.9, rys)
    for i in range(7):
        single = geo.project_3d(DEFAULT_P2, xs[i], 0.0, zs[i], 1.6, 1.5, 3.9, rys[i])
        np.testing.assert_allclose(batched[i], single, atol=1e-9)


def test_iou_basic():
    a = np.array([[0., 0., 10., 10.]])
    b = np.array([[0., 0., 10., 10.], [5., 5., 15., 15.], [20., 20., 30., 30.]])
    ious = geo.iou(a, b)[0]
    np.testing.assert_allclose(ious[0], 1.0)
    np.testing.assert_allclose(ious[1], 25.0 / 175.0)
    np.testing.assert_allclose(ious[2], 0.0)


def test_iou_ign_is_coverage_of_box_a():
    a = np.array([[0., 0., 10., 10.]])
    b = np.array([[0., 0., 5., 10.]])  # covers half of a
    np.testing.assert_allclose(geo.iou_ign(a, b)[0, 0], 0.5)


def test_bbox_transform_roundtrip():
    rng = np.random.default_rng(3)
    rois = np.stack([rng.uniform(0, 50, 10), rng.uniform(0, 50, 10),
                     rng.uniform(60, 100, 10), rng.uniform(60, 100, 10)], axis=1)
    gts = rois + rng.uniform(-5, 5, rois.shape)
    deltas = geo.bbox_transform(rois, gts)
    rec = geo.bbox_transform_inv(rois, deltas)
    # The reference's encode uses ctr = x1+0.5(w-1) while decode uses
    # ctr = x1+0.5w; the net effect is exact x1/y1 and x2/y2 shifted by +1.
    # We reproduce that convention bit-for-bit.
    np.testing.assert_allclose(rec[:, 0:2], gts[:, 0:2], atol=1e-9)
    np.testing.assert_allclose(rec[:, 2:4], gts[:, 2:4] + 1.0, atol=1e-9)


def test_xywh_xyxy_roundtrip():
    box = np.array([[3., 4., 10., 20.]])
    xyxy = geo.xywh_to_xyxy(box)
    np.testing.assert_allclose(xyxy, [[3., 4., 12., 23.]])
    np.testing.assert_allclose(geo.xyxy_to_xywh(xyxy), box)
