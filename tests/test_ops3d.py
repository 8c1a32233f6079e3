"""Tests for the 3D capability ops: iou3d/GIoU, roipool3d, PSROI pooling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3dssd_tpu.ops.iou3d import (boxes3d_to_bev, boxes_iou3d, boxes_iou_bev,
                                  giou_3d, nms_bev)
from m3dssd_tpu.ops.psroi import dcn_v2_psroi_pooling
from m3dssd_tpu.ops.roipool3d import enlarge_box3d, pts_in_boxes3d, roipool3d


def _cam_box(x, y, z, h, w, l, ry):
    return np.array([x, y, z, h, w, l, ry], dtype=np.float32)


def test_iou3d_identical_and_disjoint():
    a = jnp.array([_cam_box(0, 1.65, 10, 1.5, 1.6, 3.9, 0.4)])
    assert float(boxes_iou3d(a, a)[0, 0]) == pytest.approx(1.0, rel=1e-5)
    b = jnp.array([_cam_box(50, 1.65, 10, 1.5, 1.6, 3.9, 0.0)])
    assert float(boxes_iou3d(a, b)[0, 0]) == pytest.approx(0.0, abs=1e-7)


def test_iou_bev_matches_host_evaluator():
    """Device BEV IoU must agree with the host (eval) rotated IoU."""
    from m3dssd_tpu.eval.rotate_iou import rotate_iou
    rng = np.random.default_rng(0)
    n = 12
    boxes = np.stack([rng.uniform(-20, 20, n), np.full(n, 1.65),
                      rng.uniform(5, 50, n), rng.uniform(1, 2, n),
                      rng.uniform(1, 3, n), rng.uniform(2, 5, n),
                      rng.uniform(-np.pi, np.pi, n)], axis=1)
    got = np.asarray(boxes_iou_bev(jnp.array(boxes), jnp.array(boxes)))
    # host evaluator format: [cx, cz, xsize, ysize, angle]
    rb = np.asarray(boxes3d_to_bev(jnp.array(boxes)))
    want = rotate_iou(rb, rb)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_giou3d_properties():
    # axis-aligned identical boxes: GIoU exactly 1
    a0 = jnp.array([_cam_box(0, 1.65, 10, 1.5, 1.6, 3.9, 0.0)])
    g0, i0 = giou_3d(a0, a0)
    assert float(i0[0]) == pytest.approx(1.0, rel=1e-5)
    assert float(g0[0]) == pytest.approx(1.0, rel=1e-4)
    # rotated identical: IoU 1; GIoU < 1 under the AABB-hull convention but
    # still the maximum over any perturbation
    a = jnp.array([_cam_box(0, 1.65, 10, 1.5, 1.6, 3.9, 0.2)])
    g_same, iou_same = giou_3d(a, a)
    assert float(iou_same[0]) == pytest.approx(1.0, rel=1e-5)
    assert 0.5 < float(g_same[0]) <= 1.0
    shifted = a.at[0, 0].add(1.0)
    g_shift, _ = giou_3d(a, shifted)
    assert float(g_shift[0]) < float(g_same[0])
    b = jnp.array([_cam_box(30, 1.65, 10, 1.5, 1.6, 3.9, 0.2)])
    g_far, iou_far = giou_3d(a, b)
    assert float(iou_far[0]) == pytest.approx(0.0, abs=1e-6)
    assert float(g_far[0]) < 0  # disjoint -> negative GIoU


def test_giou3d_differentiable():
    a = jnp.array([_cam_box(0, 1.65, 10, 1.5, 1.6, 3.9, 0.2)])
    b = jnp.array([_cam_box(1.0, 1.65, 11, 1.5, 1.6, 3.9, 0.3)])

    def loss(bb):
        g, _ = giou_3d(a, bb)
        return -g.sum()

    g = jax.grad(loss)(b)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_nms_bev_suppresses_rotated_duplicates():
    base = _cam_box(0, 1.65, 10, 1.5, 1.6, 3.9, 0.3)
    near = base.copy(); near[0] += 0.2
    far = base.copy(); far[0] += 30
    boxes = jnp.array([base, near, far])
    scores = jnp.array([0.9, 0.8, 0.7])
    idxs, valid = nms_bev(boxes, scores, 0.5, 3)
    kept = np.asarray(idxs)[np.asarray(valid)].tolist()
    assert kept == [0, 2]


def test_pts_in_boxes3d():
    box = jnp.array([_cam_box(0, 1.65, 10, 1.5, 2.0, 4.0, 0.0)])
    pts = jnp.array([
        [0.0, 1.0, 10.0],    # inside
        [0.0, 1.65, 10.0],   # on bottom face -> inside
        [0.0, 2.0, 10.0],    # below bottom -> outside
        [1.9, 1.0, 10.0],    # beyond l/2=2.0? x=1.9 < 2.0 inside
        [2.2, 1.0, 10.0],    # outside along length
        [0.0, 1.0, 11.2],    # beyond w/2=1.0 -> outside
    ])
    m = np.asarray(pts_in_boxes3d(pts, box))[0]
    assert m.tolist() == [True, True, False, True, False, False]


def test_pts_in_rotated_box():
    # 90-degree yaw swaps the roles of l and w
    box = jnp.array([_cam_box(0, 1.65, 10, 1.5, 2.0, 4.0, np.pi / 2)])
    pts = jnp.array([
        [1.9, 1.0, 10.0],    # along x: limited by w/2=1 after rotation -> out
        [0.0, 1.0, 11.9],    # along z: limited by l/2=2 -> inside
    ])
    m = np.asarray(pts_in_boxes3d(pts, box))[0]
    assert m.tolist() == [False, True]


def test_roipool3d_shapes_and_membership():
    rng = np.random.default_rng(1)
    pts = jnp.array(rng.uniform(-5, 5, [200, 3]).astype(np.float32)
                    + np.array([0, 0, 10], np.float32))
    feats = jnp.array(rng.normal(size=(200, 4)).astype(np.float32))
    boxes = jnp.array([_cam_box(0, 1.65, 10, 1.5, 2.0, 4.0, 0.0),
                       _cam_box(100, 1.65, 10, 1.5, 2.0, 4.0, 0.0)])
    pooled, empty = roipool3d(pts, feats, boxes, pool_extra_width=0.5,
                              sampled_pts_num=32)
    assert pooled.shape == (2, 32, 7)
    assert not bool(empty[0])
    assert bool(empty[1])          # far box has no points
    np.testing.assert_allclose(np.asarray(pooled[1]), 0.0)


def test_enlarge_box3d():
    b = jnp.array([_cam_box(0, 1.65, 10, 1.5, 2.0, 4.0, 0.0)])
    e = np.asarray(enlarge_box3d(b, 0.5))
    np.testing.assert_allclose(e[0, 3:6], [2.5, 3.0, 5.0])
    np.testing.assert_allclose(e[0, 1], 1.65 + 0.5)


def test_psroi_pooling_uniform_map():
    """On a channel-constant map, PSROI pooling returns each bin's group
    constant regardless of offsets."""
    C_out, G, P = 2, 2, 4
    C = C_out * G * G
    x = np.zeros((1, 16, 16, C), np.float32)
    for c in range(C):
        x[..., c] = float(c)
    rois = jnp.array([[0, 2.0, 2.0, 13.0, 13.0]])
    out = dcn_v2_psroi_pooling(jnp.array(x), rois, None,
                               spatial_scale=1.0, pooled_size=P,
                               output_dim=C_out, no_trans=True,
                               group_size=G)
    assert out.shape == (1, P, P, C_out)
    o = np.asarray(out)[0]
    # bin (0,0) reads group 0 -> channels [0, 1]; bin (3,3) group 3 -> [6, 7]
    np.testing.assert_allclose(o[0, 0], [0.0, 1.0], atol=1e-5)
    np.testing.assert_allclose(o[3, 3], [6.0, 7.0], atol=1e-5)
