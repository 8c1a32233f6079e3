"""Anchor generation / placement / target assignment tests."""

import numpy as np
import pytest

from m3dssd_tpu import geometry as geo
from m3dssd_tpu.anchors import (anchor_center, calc_output_size,
                                compute_bbox_stats, generate_anchors,
                                locate_anchors)
from m3dssd_tpu.targets import build_targets, compute_targets, image_gt_arrays
from m3dssd_tpu.data.kitti import build_imdb


@pytest.fixture(scope="module")
def imdb(synthetic_kitti, tiny_conf):
    return build_imdb(tiny_conf, synthetic_kitti, "train")


def test_anchor_center_convention():
    a = anchor_center(32, 64, 8)
    # centered at (stride-1)/2 = 3.5
    assert (a[0] + a[2]) / 2 == pytest.approx(3.5)
    assert (a[1] + a[3]) / 2 == pytest.approx(3.5)
    assert a[2] - a[0] == pytest.approx(32)
    assert a[3] - a[1] == pytest.approx(64)


def test_generate_anchors_shapes_and_priors(imdb, tiny_conf):
    conf = tiny_conf.replace(anchors=None)
    anchors = generate_anchors(conf, imdb, cache_folder=None)
    A = conf.num_anchor_scales * len(conf.anchor_ratios)
    assert anchors.shape == (A, 9)
    # 3D priors must be physically plausible for cars
    assert np.all(anchors[:, 4] > 0)          # z depth positive
    assert np.all(anchors[:, 5:8] > 0.3)      # dims positive
    assert np.all(anchors[:, 5:8] < 8.0)


def test_cluster_anchors_improves_iou(imdb, tiny_conf):
    """k-means clustering must improve mean anchor-gt IoU over the geometric
    ladder (ref:lib/rpn_util.py:186-427)."""
    from m3dssd_tpu.anchors import _normalized_gts, cluster_anchors

    conf = tiny_conf.replace(anchors=None, cluster_anchors=1)
    norm_gts = _normalized_gts(conf, imdb)
    assert norm_gts.shape[0] > 0

    def mean_iou(anc):
        return float(np.max(geo.iou(anc[:, :4], norm_gts[:, :4]), axis=0).mean())

    ladder = generate_anchors(conf.replace(cluster_anchors=0), imdb)
    clustered = cluster_anchors(conf, ladder, imdb)
    assert clustered.shape[1] == 9
    assert np.all(np.isfinite(clustered))
    assert mean_iou(clustered) >= mean_iou(ladder)
    # 3D prior tails are cluster means: plausible ranges
    assert np.all(clustered[:, 4] > 0)


def test_cluster_anchors_even_and_expand(imdb, tiny_conf):
    """even_anchors seeds from height-sorted gt slices; expand_anchors grows
    the anchor count while mean IoU improves (ref:lib/rpn_util.py:267-285,
    404-420)."""
    from m3dssd_tpu.anchors import _normalized_gts, cluster_anchors

    base = tiny_conf.replace(anchors=None, cluster_anchors=1,
                             num_anchor_scales=2)
    ladder = generate_anchors(base.replace(cluster_anchors=0), imdb)
    A0 = ladder.shape[0]
    norm_gts = _normalized_gts(base, imdb)

    even = cluster_anchors(base.replace(even_anchors=1), ladder, imdb)
    assert even.shape[1] == 9 and np.all(np.isfinite(even))

    expanded = cluster_anchors(base.replace(expand_anchors=A0 + 4),
                               ladder, imdb)
    assert A0 <= expanded.shape[0] <= A0 + 4

    def mean_iou(anc):
        return float(np.max(geo.iou(anc[:, :4], norm_gts[:, :4]), axis=0).mean())

    fixed = cluster_anchors(base, ladder, imdb)
    assert mean_iou(expanded) >= mean_iou(fixed) - 1e-9


def test_locate_anchors_order_and_values():
    anchors = np.array([[0., 0., 7., 7., 0, 0, 0, 0, 0],
                        [0., 0., 15., 15., 0, 0, 0, 0, 0]])
    feat = [3, 5]
    rois = locate_anchors(anchors, feat, 8)
    A, H, W = 2, 3, 5
    assert rois.shape == (H * W * A, 5)
    # flat order (h, w, a): n = (h*W + w)*A + a
    for a in range(A):
        for h in range(H):
            for w in range(W):
                n = (h * W + w) * A + a
                np.testing.assert_allclose(
                    rois[n, :4],
                    anchors[a, :4] + np.array([w * 8, h * 8, w * 8, h * 8]))
                assert rois[n, 4] == a


def test_compute_targets_simple_scene():
    """Handcrafted scene: one gt exactly on an anchor must be fg with ~zero
    2D transform; distant anchors must be bg."""
    anchors = np.array([[-16., -16., 16., 16., 20., 1.6, 1.5, 3.9, 0.]])
    feat = [4, 4]
    rois = locate_anchors(anchors, feat, 8)
    # gt aligned with roi at (h=1, w=1): anchor + shift (8, 8)
    gt = rois[1 * 4 + 1, :4][None, :].copy()
    gts_3d = np.array([[gt[0, 0] + 16, gt[0, 1] + 16, 20., 1.6, 1.5, 3.9,
                        0.1, 0., 0., 20., 0.2]])
    tf, ols, raw = compute_targets(
        gt, np.zeros([0, 4]), np.array([1]), rois,
        fg_thresh=0.5, ign_thresh=0.5, bg_thresh_lo=0.0, bg_thresh_hi=0.5,
        best_thresh=0.35, gts_3d=gts_3d, anchors=anchors, tracker=rois[:, 4])
    n = 1 * 4 + 1
    assert tf[n, 4] == 1  # fg with class 1
    np.testing.assert_allclose(tf[n, 0:4], 0.0, atol=1e-6)
    # 3D: dz = 0, scales log(1)=0, dry = 0.2
    np.testing.assert_allclose(tf[n, 7], 0.0, atol=1e-6)   # dz
    np.testing.assert_allclose(tf[n, 8:11], 0.0, atol=1e-6)  # sw/sh/sl
    # rotation target is alpha-based: gts_3d col 6 (alpha=0.1) - anchor prior 0
    np.testing.assert_allclose(tf[n, 11], 0.1, atol=1e-6)
    # a far-away roi is bg
    assert tf[3 * 4 + 3, 4] == -1


def test_compute_targets_ignore_region():
    # small anchors (8x8) so neighbouring rois don't fall in the ignore region
    anchors = np.array([[-4., -4., 4., 4., 20., 1.6, 1.5, 3.9, 0.]])
    rois = locate_anchors(anchors, [2, 2], 8)
    gts_ign = rois[0, :4][None, :].copy()  # ignore box on roi 0
    tf, _, _ = compute_targets(
        np.zeros([0, 4]), gts_ign, np.zeros(0, dtype=int), rois,
        0.5, 0.5, 0.0, 0.5, 0.35,
        gts_3d=np.zeros([0, 11]), anchors=anchors, tracker=rois[:, 4])
    assert tf[0, 4] == 0       # ignored
    assert np.all(tf[1:, 4] == -1)  # others bg


def test_best_anchor_forcing():
    """A gt below fg_thresh IoU but above best_thresh must still get one fg."""
    anchors = np.array([[-16., -16., 16., 16., 20., 1.6, 1.5, 3.9, 0.]])
    rois = locate_anchors(anchors, [2, 2], 8)
    # gt concentric with roi 0 but scaled 0.65x -> IoU = 0.65^2 ~ 0.42
    c = (rois[0, 0:2] + rois[0, 2:4]) / 2
    half = (rois[0, 2:4] - rois[0, 0:2]) / 2 * 0.65
    gt = np.concatenate([c - half, c + half])[None, :]
    best_iou = geo.iou(rois[:, :4], gt).max()
    assert 0.35 < best_iou < 0.5
    gts_3d = np.array([[0., 0., 20., 1.6, 1.5, 3.9, 0., 0., 0., 20., 0.]])
    tf, _, _ = compute_targets(gt, np.zeros([0, 4]), np.array([2]), rois,
                               0.5, 0.5, 0.0, 0.5, 0.35,
                               gts_3d=gts_3d, anchors=anchors, tracker=rois[:, 4])
    assert (tf[:, 4] == 2).sum() == 1


def test_bbox_stats_and_build_targets(imdb, tiny_conf):
    conf = tiny_conf.replace(anchors=None)
    generate_anchors(conf, imdb, None)
    compute_bbox_stats(conf, imdb, None)
    assert conf.bbox_means.shape == (1, 11)
    assert conf.bbox_stds.shape == (1, 11)
    assert np.all(conf.bbox_stds > 0)

    t = build_targets(conf, imdb[0])
    N = conf.anchors.shape[0] * conf.feat_size[0] * conf.feat_size[1]
    assert t["labels"].shape == (N,)
    assert t["bbox_2d"].shape == (N, 4)
    assert t["bbox_3d"].shape == (N, 7)
    assert t["labels_fg"].sum() > 0          # synthetic scenes have cars
    assert t["any_val"] == 1
    # fg/bg/ign partition the anchor set
    total = (t["labels_fg"].astype(int) + t["labels_bg"].astype(int)
             + t["labels_ign"].astype(int))
    assert np.all(total == 1)
    # whitened fg targets should be roughly standard scale
    fg = t["labels_fg"].astype(bool)
    assert np.abs(t["bbox_2d"][fg]).mean() < 5.0


def test_calc_output_size():
    np.testing.assert_array_equal(calc_output_size([384, 1280], 8), [48, 160])
    np.testing.assert_array_equal(calc_output_size([375, 1242], 8), [47, 156])
