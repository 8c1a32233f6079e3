"""Device target assignment vs the host numpy implementation."""

import jax.numpy as jnp
import numpy as np
import pytest

from m3dssd_tpu import geometry as geo
from m3dssd_tpu.anchors import locate_anchors
from m3dssd_tpu.ops.targets_device import IGN_FLAG, compute_targets_device
from m3dssd_tpu.targets import compute_targets


def _random_scene(rng, A=4, H=6, W=8, G=3, n_ign=1):
    anchors = np.concatenate([
        np.stack([rng.uniform(-30, -10, A), rng.uniform(-30, -10, A),
                  rng.uniform(10, 30, A), rng.uniform(10, 30, A)], axis=1),
        np.abs(rng.normal(20, 3, [A, 1])),
        np.abs(rng.normal(2, .2, [A, 3])),
        rng.uniform(-1, 1, [A, 1])], axis=1)
    rois = locate_anchors(anchors, [H, W], 8)
    # gts overlapping the roi field
    cx = rng.uniform(0, W * 8, G)
    cy = rng.uniform(0, H * 8, G)
    w = rng.uniform(15, 50, G)
    h = rng.uniform(15, 50, G)
    gts_val = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)
    gts_3d = np.concatenate([
        cx[:, None], cy[:, None], rng.uniform(10, 40, [G, 1]),
        np.abs(rng.normal(2, .3, [G, 3])), rng.uniform(-1, 1, [G, 1]),
        rng.normal(size=(G, 4))], axis=1)
    box_lbls = rng.integers(1, 4, G)
    icx = rng.uniform(0, W * 8, n_ign)
    icy = rng.uniform(0, H * 8, n_ign)
    gts_ign = np.stack([icx - 20, icy - 20, icx + 20, icy + 20], axis=1)
    return anchors, rois, gts_val, gts_3d, box_lbls, gts_ign


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_device_matches_host_assignment(seed):
    rng = np.random.default_rng(seed)
    anchors, rois, gts_val, gts_3d, box_lbls, gts_ign = _random_scene(rng)
    means = np.zeros([1, 11])
    stds = np.ones([1, 11])

    host_tf, _, _ = compute_targets(
        gts_val, gts_ign, box_lbls, rois, 0.5, 0.5, 0.0, 0.5, 0.35,
        gts_3d=gts_3d, anchors=anchors, tracker=rois[:, 4])

    G = gts_val.shape[0]
    dev = compute_targets_device(
        jnp.array(rois), jnp.array(anchors), jnp.array(means),
        jnp.array(stds),
        jnp.array(gts_val, jnp.float32), jnp.array(gts_3d, jnp.float32),
        jnp.array(box_lbls, jnp.int32), jnp.ones(G, bool),
        jnp.array(gts_ign, jnp.float32), jnp.ones(gts_ign.shape[0], bool))

    host_fg = host_tf[:, 4] > 0
    host_bg = host_tf[:, 4] < 0
    host_ign = host_tf[:, 4] == 0
    np.testing.assert_array_equal(np.asarray(dev["labels_fg"], bool), host_fg)
    np.testing.assert_array_equal(np.asarray(dev["labels_bg"], bool), host_bg)
    np.testing.assert_array_equal(np.asarray(dev["labels_ign"], bool), host_ign)

    # labels match on fg
    np.testing.assert_array_equal(np.asarray(dev["labels"])[host_fg],
                                  host_tf[host_fg, 4].astype(np.int32))
    # regression targets match on fg (device outputs are channel-major [P,N])
    np.testing.assert_allclose(np.asarray(dev["bbox_2d"]).T[host_fg],
                               host_tf[host_fg, 0:4], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dev["bbox_3d"]).T[host_fg],
                               host_tf[host_fg, 5:12], rtol=1e-4, atol=1e-4)


def test_device_assignment_with_padding():
    """Padded (invalid) gts must not affect the result."""
    rng = np.random.default_rng(5)
    anchors, rois, gts_val, gts_3d, box_lbls, gts_ign = _random_scene(rng)
    means = np.zeros([1, 11]); stds = np.ones([1, 11])
    G = gts_val.shape[0]

    def run(g2, g3, gc, gv, ib, iv):
        return compute_targets_device(
            jnp.array(rois), jnp.array(anchors), jnp.array(means),
            jnp.array(stds), jnp.array(g2, jnp.float32),
            jnp.array(g3, jnp.float32), jnp.array(gc, jnp.int32),
            jnp.array(gv, bool), jnp.array(ib, jnp.float32),
            jnp.array(iv, bool))

    base = run(gts_val, gts_3d, box_lbls, np.ones(G, bool),
               gts_ign, np.ones(1, bool))
    # pad with huge bogus gts marked invalid
    pad2 = np.concatenate([gts_val, np.array([[0, 0, 1000, 1000.]] * 2)], 0)
    pad3 = np.concatenate([gts_3d, np.zeros([2, 11]) + 5.0], 0)
    padc = np.concatenate([box_lbls, [1, 1]])
    padv = np.concatenate([np.ones(G, bool), [False, False]])
    padded = run(pad2, pad3, padc, padv, gts_ign, np.ones(1, bool))
    for k in base:
        np.testing.assert_array_equal(np.asarray(base[k]),
                                      np.asarray(padded[k]), err_msg=k)


def test_device_assignment_no_gts():
    rng = np.random.default_rng(6)
    anchors, rois, gts_val, gts_3d, box_lbls, gts_ign = _random_scene(rng)
    means = np.zeros([1, 11]); stds = np.ones([1, 11])
    dev = compute_targets_device(
        jnp.array(rois), jnp.array(anchors), jnp.array(means),
        jnp.array(stds), jnp.array(gts_val, jnp.float32),
        jnp.array(gts_3d, jnp.float32), jnp.array(box_lbls, jnp.int32),
        jnp.zeros(gts_val.shape[0], bool),
        jnp.array(gts_ign, jnp.float32), jnp.zeros(1, bool))
    assert int(np.asarray(dev["labels_fg"]).sum()) == 0
    assert int(np.asarray(dev["any_val"])) == 0
    assert np.asarray(dev["labels_bg"], bool).all()
