"""Loss semantics and train-step tests (incl. multi-device mesh)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3dssd_tpu.anchors import locate_anchors
from m3dssd_tpu.losses.rpn_loss import IGN_FLAG, RPNLossConfig, rpn_3d_loss
from m3dssd_tpu.ops.boxes import bbox_transform_inv, smooth_l1


def _toy_setup(B=2, A=2, H=4, W=5, C=4, seed=0):
    rng = np.random.default_rng(seed)
    N = A * H * W
    anchors = np.concatenate([
        np.tile(np.array([[-16., -16., 16., 16.], [-8., -24., 8., 24.]]),
                (A // 2, 1))[:A],
        np.abs(rng.normal(20, 3, [A, 1])),
        np.abs(rng.normal(2, .2, [A, 3])),
        rng.uniform(-1, 1, [A, 1])], axis=1)
    rois = locate_anchors(anchors, [H, W], 8)
    outputs = {
        "cls": jnp.array(rng.normal(size=(B, N, C)).astype(np.float32)),
        "bbox_2d": jnp.array(rng.normal(size=(B, 4, N)).astype(np.float32) * .1),
        "bbox_3d": jnp.array(rng.normal(size=(B, 7, N)).astype(np.float32) * .1),
    }
    outputs["prob"] = jax.nn.softmax(outputs["cls"], axis=-1)
    labels = np.zeros((B, N), np.int32)
    fg = np.zeros((B, N), np.int8)
    ign = np.zeros((B, N), np.int8)
    # image 0: two fg anchors, one ignored; image 1: all bg
    i1, i2, i3 = 3 % N, 10 % N, 20 % N
    labels[0, i1] = 1; fg[0, i1] = 1
    labels[0, i2] = 2; fg[0, i2] = 1
    labels[0, i3] = IGN_FLAG; ign[0, i3] = 1
    bg = ((fg == 0) & (ign == 0)).astype(np.int8)
    batch = {
        "labels": jnp.array(labels),
        "labels_fg": jnp.array(fg),
        "labels_bg": jnp.array(bg),
        "labels_ign": jnp.array(ign),
        "bbox_2d": jnp.array(rng.normal(size=(B, 4, N)).astype(np.float32) * .1),
        "bbox_3d": jnp.array(rng.normal(size=(B, 7, N)).astype(np.float32) * .1),
        "any_val": jnp.array([1, 1], jnp.int32),
    }
    means = np.zeros([1, 11]); stds = np.ones([1, 11])
    return outputs, batch, rois, anchors, means, stds


def test_loss_finite_and_components():
    outputs, batch, rois, anchors, means, stds = _toy_setup()
    cfg = RPNLossConfig()
    loss, stats = rpn_3d_loss(outputs, batch, rois, anchors, means, stds, cfg)
    assert np.isfinite(float(loss))
    for k in ["loss_cls", "loss_bbox3d", "loss_iou", "iou", "err_z", "err_ry"]:
        assert k in stats and np.isfinite(float(stats[k])), k
    assert float(stats["fg_count"]) == 2  # both fg selected (budget >> 2)


def test_loss_zero_when_pred_equals_target():
    """With perfect 3D predictions the 3D loss term is 0 and IoU loss ~0."""
    outputs, batch, rois, anchors, means, stds = _toy_setup()
    outputs = dict(outputs)
    outputs["bbox_3d"] = batch["bbox_3d"]
    outputs["bbox_2d"] = batch["bbox_2d"]
    cfg = RPNLossConfig(cls_2d_lambda=0.0)
    loss, stats = rpn_3d_loss(outputs, batch, rois, anchors, means, stds, cfg)
    np.testing.assert_allclose(float(stats["loss_bbox3d"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(stats["iou"]), 1.0, atol=1e-4)
    np.testing.assert_allclose(float(stats["loss_iou"]), 0.0, atol=1e-4)


def test_hard_negative_selection_picks_lowest_scores():
    """With a tiny bg budget, the selected bg anchors must be the ones the
    classifier is most wrong about (lowest bg prob)."""
    outputs, batch, rois, anchors, means, stds = _toy_setup(B=1, A=2, H=2, W=2)
    N = outputs["cls"].shape[1]
    # craft prob: bg prob ascending with index
    logits = np.zeros((1, N, 4), np.float32)
    logits[0, :, 0] = np.linspace(-3, 3, N)  # later anchors more confident bg
    outputs = dict(outputs)
    outputs["cls"] = jnp.array(logits)
    outputs["prob"] = jax.nn.softmax(outputs["cls"], axis=-1)
    labels = np.zeros((1, N), np.int32)
    fg = np.zeros((1, N), np.int8); fg[0, 0] = 1; labels[0, 0] = 1
    bg = ((fg == 0)).astype(np.int8)
    batch = dict(batch)
    batch["labels"] = jnp.array(labels)
    batch["labels_fg"] = jnp.array(fg)
    batch["labels_bg"] = jnp.array(bg)
    batch["labels_ign"] = jnp.zeros((1, N), jnp.int8)
    batch["bbox_2d"] = batch["bbox_2d"][:, :, :N]
    batch["bbox_3d"] = batch["bbox_3d"][:, :, :N]
    batch["any_val"] = jnp.array([1], jnp.int32)

    # box_samples st total budget = 3 -> bg budget = 3 - 1 = 2
    cfg = RPNLossConfig(box_samples=3.0 / N, fg_fraction=1.0 / 3.0)
    loss, stats = rpn_3d_loss(outputs, batch, rois, anchors, means, stds, cfg)
    # the 2 hardest bg anchors (idx 1, 2 after fg idx 0) have lowest bg prob
    assert float(stats["bg_count"]) == 2
    assert float(stats["fg_count"]) == 1


def test_empty_image_contributes_nothing():
    outputs, batch, rois, anchors, means, stds = _toy_setup()
    batch = dict(batch)
    batch["any_val"] = jnp.array([0, 0], jnp.int32)
    cfg = RPNLossConfig()
    loss, stats = rpn_3d_loss(outputs, batch, rois, anchors, means, stds, cfg)
    assert float(stats["fg_count"]) == 0
    assert float(stats["bg_count"]) == 0
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)


def test_loss_channel_major_path_matches_legacy():
    """The cls_t/prob_t/lse fast path (lane-sliced class dim, what the real
    model emits) computes the same loss, stats, and logits-gradient as the
    legacy [B,N,C] path."""
    outputs, batch, rois, anchors, means, stds = _toy_setup()
    cfg = RPNLossConfig()   # full stats: exercises _argmax_class_t too

    def run(logits, fast):
        o = dict(outputs)
        o["cls"] = logits
        o["prob"] = jax.nn.softmax(logits, axis=-1)
        if fast:
            o["cls_t"] = logits.transpose(0, 2, 1)
            o["prob_t"] = o["prob"].transpose(0, 2, 1)
            o["lse"] = jax.nn.logsumexp(logits, axis=-1)
        else:
            o.pop("cls_t", None)
        return rpn_3d_loss(o, batch, rois, anchors, means, stds, cfg)

    logits = outputs["cls"]
    l_ref, g_ref = jax.value_and_grad(lambda z: run(z, False)[0])(logits)
    l_fast, g_fast = jax.value_and_grad(lambda z: run(z, True)[0])(logits)
    _, stats_ref = run(logits, False)
    _, stats_fast = run(logits, True)

    np.testing.assert_allclose(float(l_fast), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)
    for k in stats_ref:
        np.testing.assert_allclose(np.asarray(stats_fast[k]),
                                   np.asarray(stats_ref[k]), rtol=1e-4,
                                   atol=1e-6, err_msg=k)


def test_smooth_l1():
    x = jnp.array([0.0, 0.5, 1.0, 2.0, -3.0])
    got = np.asarray(smooth_l1(x, jnp.zeros(5)))
    np.testing.assert_allclose(got, [0.0, 0.125, 0.5, 1.5, 2.5], atol=1e-6)


def test_bbox_transform_inv_matches_numpy():
    from m3dssd_tpu import geometry as geo
    rng = np.random.default_rng(0)
    rois = np.stack([rng.uniform(0, 50, 7), rng.uniform(0, 50, 7),
                     rng.uniform(60, 100, 7), rng.uniform(60, 100, 7)], axis=1)
    deltas = rng.normal(size=(7, 4)) * 0.3
    means = rng.normal(size=4) * 0.1
    stds = rng.uniform(0.5, 2.0, 4)
    got = np.asarray(bbox_transform_inv(jnp.array(rois), jnp.array(deltas),
                                        jnp.array(means), jnp.array(stds)))
    want = geo.bbox_transform_inv(rois, deltas.copy(), means, stds)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


# ---------------------------------------------------------------------------
# end-to-end train step
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_train_setup(synthetic_kitti, tiny_conf):
    from m3dssd_tpu.data.kitti import Kitti3DDataset
    from m3dssd_tpu.data.loader import TrainLoader
    conf = tiny_conf.replace(anchors=None)
    ds = Kitti3DDataset(conf, synthetic_kitti, phase="train")
    loader = TrainLoader(ds, batch_size=2, num_workers=2, seed=0)
    return conf, ds, loader


def test_train_step_runs_and_loss_decreases(tiny_train_setup):
    from m3dssd_tpu.models import build
    from m3dssd_tpu.train.state import create_train_state, make_train_step

    conf, ds, loader = tiny_train_setup
    conf = conf.replace(lr=0.01, warmup=0.0)
    model = build(conf)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(conf, model, rng, max_iter=100)
    train_step = make_train_step(conf, ds.rois)

    batch = next(iter(loader.batches(1)))
    losses = []
    for i in range(8):
        state, stats = train_step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(stats["loss"]))
    assert np.isfinite(losses).all()
    # overfitting a single batch must reduce the loss
    assert losses[-1] < losses[0], losses


def test_train_step_on_8_device_mesh(tiny_train_setup):
    """The same jitted step partitioned over a 'data' mesh axis."""
    from m3dssd_tpu.models import build
    from m3dssd_tpu.parallel import make_mesh, replicate_state, shard_batch
    from m3dssd_tpu.train.state import create_train_state, make_train_step

    conf, ds, loader = tiny_train_setup
    # warmup=0: with the stock warmup fraction, step 0 has lr == 0 and a
    # single-step test would see no parameter movement
    conf = conf.replace(warmup=0.0)
    model = build(conf)
    state = create_train_state(conf, model, jax.random.PRNGKey(0), max_iter=100)
    train_step = make_train_step(conf, ds.rois)

    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    batch = next(iter(loader.batches(1)))
    # pad batch to 8 images so it shards evenly
    batch8 = {k: np.concatenate([np.asarray(v)] * 4, axis=0)
              for k, v in batch.items()}
    with mesh:
        sharded = shard_batch(mesh, batch8)
        state_r = replicate_state(mesh, state)
        new_state, stats = train_step(state_r, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(stats["loss"]))
    # params actually updated
    diff = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), jax.tree_util.tree_map(
            lambda a, b: a - b, new_state.params, state.params), 0.0)
    assert diff > 0


def test_loss_3d_proj_and_iou_branches():
    """Capability branches bbox_3d_proj_lambda / bbox_3d_iou_lambda run and
    are zero for perfect predictions."""
    outputs, batch, rois, anchors, means, stds = _toy_setup()
    B = outputs["cls"].shape[0]
    p2 = np.eye(4); p2[0, 0] = p2[1, 1] = 700.0
    p2[0, 2] = 300.0; p2[1, 2] = 90.0
    batch = dict(batch)
    batch["p2_inv"] = jnp.array(np.tile(np.linalg.inv(p2), (B, 1, 1)),
                                jnp.float32)
    cfg = RPNLossConfig(cls_2d_lambda=0, iou_2d_lambda=0, bbox_3d_lambda=0,
                        bbox_3d_proj_lambda=1.0, bbox_3d_iou_lambda=1.0)
    loss, stats = rpn_3d_loss(outputs, batch, rois, anchors, means, stds, cfg)
    assert np.isfinite(float(loss))
    assert "loss_bbox3d_proj" in stats and "loss_bbox3d_iou" in stats

    # perfect prediction -> proj loss 0; giou(a,a) close to max
    outputs2 = dict(outputs)
    outputs2["bbox_3d"] = batch["bbox_3d"]
    loss2, stats2 = rpn_3d_loss(outputs2, batch, rois, anchors, means, stds,
                                cfg)
    np.testing.assert_allclose(float(stats2["loss_bbox3d_proj"]), 0.0,
                               atol=1e-5)
    assert float(stats2["loss_bbox3d_iou"]) < float(stats["loss_bbox3d_iou"])


def test_freeze_layers_mask(tiny_conf):
    """freeze_blacklist params receive no updates; others do."""
    from m3dssd_tpu.models import build
    from m3dssd_tpu.train.state import create_train_state, freeze_mask_fn
    from m3dssd_tpu.utils.synthetic_conf import finalize_conf_synthetic
    import optax

    conf = finalize_conf_synthetic(
        tiny_conf.replace(anchors=None, freeze_blacklist=["base"]))
    model = build(conf)
    state = create_train_state(conf, model, jax.random.PRNGKey(0), max_iter=10)
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    updates, _ = state.tx.update(grads, state.opt_state, state.params)
    flat = jax.tree_util.tree_flatten_with_path(updates)[0]
    frozen = [np.allclose(v, 0) for k, v in flat
              if "base" in jax.tree_util.keystr(k)]
    live = [np.allclose(v, 0) for k, v in flat
            if "base" not in jax.tree_util.keystr(k)]
    assert frozen and all(frozen)
    assert live and not all(live)


def test_extras_focal_and_dice():
    from m3dssd_tpu.losses.extras import dice_loss, sigmoid_focal_loss
    logits = jnp.array([5.0, -5.0, 0.0])
    targets = jnp.array([1.0, 0.0, 1.0])
    fl = np.asarray(sigmoid_focal_loss(logits, targets))
    # confident-correct predictions get tiny loss; uncertain larger
    assert fl[0] < 1e-3 and fl[1] < 1e-3 and fl[2] > 0.04
    # perfect dice ~ 0, inverted ~ 1
    assert float(dice_loss(jnp.array([10., -10.]), jnp.array([1., 0.]))) < 0.01
    assert float(dice_loss(jnp.array([-10., 10.]), jnp.array([1., 0.]))) > 0.9


def test_extras_bin_roundtrip():
    from m3dssd_tpu.losses.extras import (decode_bin, decode_heading,
                                          encode_bin, encode_heading)
    rng = np.random.default_rng(0)
    v = jnp.array(rng.uniform(-3, 3, 50))
    b, r = encode_bin(v, search_range=3.0, num_bins=12)
    np.testing.assert_allclose(np.asarray(decode_bin(b, r, 3.0, 12)),
                               np.asarray(v), atol=1e-5)
    a = jnp.array(rng.uniform(-np.pi, np.pi, 50))
    hb, hr = encode_heading(a, 12)
    back = np.asarray(decode_heading(hb, hr, 12))
    np.testing.assert_allclose(np.unwrap(back - np.asarray(a)), 0, atol=1e-5)


def test_extras_bin_reg_loss_zero_at_gt():
    from m3dssd_tpu.losses.extras import bin_based_reg_loss, encode_bin
    rng = np.random.default_rng(1)
    gt = jnp.array(rng.uniform(-2, 2, 10))
    b, r = encode_bin(gt, 2.0, 8)
    logits = jax.nn.one_hot(b, 8) * 50.0      # confident correct bin
    res = jnp.zeros((10, 8)).at[jnp.arange(10), b].set(r)
    loss = float(bin_based_reg_loss(logits, res, gt, 2.0, 8))
    assert loss < 1e-3


def test_rank_select_pools_matches_per_pool():
    """The shared-sort pool selection equals vmapped _rank_select exactly,
    including ties (stable order) and zero budgets."""
    import jax
    from m3dssd_tpu.losses.rpn_loss import _rank_select, _rank_select_pools
    rng = np.random.default_rng(5)
    B, N = 3, 200
    # quantized scores force plenty of ties
    score = jnp.array((rng.integers(0, 20, size=(B, N)) / 20.0)
                      .astype(np.float32))
    fg = jnp.array(rng.random((B, N)) < 0.1)
    bg = jnp.array((rng.random((B, N)) < 0.6) & ~np.asarray(fg))
    fgb = jnp.array([3, 0, 50], jnp.int32)
    bgb = jnp.array([40, 17, 0], jnp.int32)
    want_fg = jax.vmap(_rank_select, in_axes=(0, 0, 0, None))(
        score, fg, fgb, None)
    want_bg = jax.vmap(_rank_select, in_axes=(0, 0, 0, None))(
        score, bg, bgb, None)
    got_fg, got_bg = _rank_select_pools(score, [fg, bg], [fgb, bgb])
    np.testing.assert_array_equal(np.asarray(got_fg), np.asarray(want_fg))
    np.testing.assert_array_equal(np.asarray(got_bg), np.asarray(want_bg))


def test_rank_select_pools_bisect_matches_sort():
    """The sort-free bit-bisection pool selection equals the shared-sort
    form EXACTLY — quantized scores (heavy ties), zero/overfull budgets,
    empty pools, and negative scores (sign-flip key branch)."""
    from m3dssd_tpu.losses.rpn_loss import (_rank_select_pools,
                                            _rank_select_pools_bisect)
    rng = np.random.default_rng(11)
    B, N = 4, 300
    score = jnp.array((rng.integers(-10, 10, size=(B, N)) / 8.0)
                      .astype(np.float32))
    fg = np.asarray(rng.random((B, N)) < 0.1)
    bg = (rng.random((B, N)) < 0.6) & ~fg
    fg[3] = False                                   # empty pool row
    fg, bg = jnp.array(fg), jnp.array(bg)
    fgb = jnp.array([3, 0, 50, 7], jnp.int32)       # 50 > pool size, 0, empty
    bgb = jnp.array([40, 17, 0, 1000], jnp.int32)
    want = _rank_select_pools(score, [fg, bg], [fgb, bgb])
    got = _rank_select_pools_bisect(score, [fg, bg], [fgb, bgb])
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_rank_select_pools_bisect_signed_zero_ties():
    """Mixed -0.0/+0.0 scores tying at the threshold: the sort path's tie
    logic compares with float == (treats them equal); the bit key must
    normalize -0.0 so the two paths select identically."""
    from m3dssd_tpu.losses.rpn_loss import (_rank_select_pools,
                                            _rank_select_pools_bisect)
    score = jnp.array([[-0.0, +0.0, -0.0, +0.0, -1.0, 1.0, -0.0, +0.0]],
                      jnp.float32)
    pool = jnp.ones((1, 8), bool)
    for budget in range(9):
        b = jnp.array([budget], jnp.int32)
        want = _rank_select_pools(score, [pool], [b])
        got = _rank_select_pools_bisect(score, [pool], [b])
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]),
                                      err_msg=f"budget={budget}")


def test_loss_mining_bisect_matches_sort_loss():
    """rpn_3d_loss with mining_bisect=True is bit-identical to the sort
    path (same selection -> same loss and stats). Tight budgets so the
    selection actually discriminates."""
    outputs, batch, rois, anchors, means, stds = _toy_setup(B=2, A=2, H=6,
                                                            W=8, seed=3)
    N = outputs["cls"].shape[1]
    base = RPNLossConfig(box_samples=8.0 / N, fg_fraction=0.25)
    loss_a, stats_a = rpn_3d_loss(outputs, batch, rois, anchors, means,
                                  stds, base)
    loss_b, stats_b = rpn_3d_loss(
        outputs, batch, rois, anchors, means, stds,
        dataclasses.replace(base, mining_bisect=True))
    np.testing.assert_array_equal(np.asarray(loss_a), np.asarray(loss_b))
    for k in stats_a:
        np.testing.assert_array_equal(np.asarray(stats_a[k]),
                                      np.asarray(stats_b[k]), err_msg=k)


def test_take_class_matches_gather():
    from m3dssd_tpu.losses.rpn_loss import _take_class
    rng = np.random.default_rng(6)
    v = jnp.array(rng.normal(size=(2, 50, 4)).astype(np.float32))
    lbl = jnp.array(rng.integers(0, 4, size=(2, 50)).astype(np.int32))
    want = np.take_along_axis(np.asarray(v), np.asarray(lbl)[..., None],
                              axis=2)[..., 0]
    np.testing.assert_allclose(np.asarray(_take_class(v, lbl)), want,
                               rtol=1e-6)


def test_train_step_on_2d_data_spatial_mesh(tiny_train_setup):
    """DP x SP: images shard their height across a 'spatial' mesh axis
    (GSPMD conv halo exchange); the loss must match the DP-only value."""
    from m3dssd_tpu.models import build
    from m3dssd_tpu.parallel import make_mesh, replicate_state, shard_batch
    from m3dssd_tpu.train.state import create_train_state, make_train_step

    conf, ds, loader = tiny_train_setup
    conf = conf.replace(warmup=0.0)
    model = build(conf)
    state = create_train_state(conf, model, jax.random.PRNGKey(0),
                               max_iter=100)
    train_step = make_train_step(conf, ds.rois)

    batch = next(iter(loader.batches(1)))
    batch4 = {k: np.concatenate([np.asarray(v)] * 2, axis=0)
              for k, v in batch.items()}

    mesh_dp = make_mesh(4)
    with mesh_dp:
        s = shard_batch(mesh_dp, batch4)
        st = replicate_state(mesh_dp, state)
        _, stats_dp = train_step(st, s, jax.random.PRNGKey(1))
    loss_dp = float(stats_dp["loss"])

    mesh_2d = make_mesh(8, spatial=2)
    assert dict(mesh_2d.shape) == {"data": 4, "spatial": 2}
    with mesh_2d:
        s = shard_batch(mesh_2d, batch4)
        # images sharded over H, targets over N (h-major flat order)
        assert "spatial" in str(s["images"].sharding.spec)
        assert "spatial" in str(s["labels"].sharding.spec)
        st = replicate_state(mesh_2d, state)
        _, stats_2d = train_step(st, s, jax.random.PRNGKey(1))
    loss_2d = float(stats_2d["loss"])
    np.testing.assert_allclose(loss_2d, loss_dp, rtol=1e-4)


def test_train_step_on_3d_dp_sp_tp_mesh(tiny_train_setup):
    """DP x SP x TP: wide parameters additionally shard their output
    channels over a 'model' axis (Megatron-style weight sharding, GSPMD
    derives the collectives). Loss must match the DP-only value and the
    wide leaves must really be model-sharded."""
    from m3dssd_tpu.models import build
    from m3dssd_tpu.parallel import make_mesh, replicate_state, shard_batch
    from m3dssd_tpu.train.state import create_train_state, make_train_step

    conf, ds, loader = tiny_train_setup
    conf = conf.replace(warmup=0.0)
    model = build(conf)
    state = create_train_state(conf, model, jax.random.PRNGKey(0),
                               max_iter=100)
    train_step = make_train_step(conf, ds.rois)

    batch = next(iter(loader.batches(1)))
    batch4 = {k: np.concatenate([np.asarray(v)] * 2, axis=0)
              for k, v in batch.items()}

    mesh_dp = make_mesh(4)
    with mesh_dp:
        s = shard_batch(mesh_dp, batch4)
        st = replicate_state(mesh_dp, state)
        _, stats_dp = train_step(st, s, jax.random.PRNGKey(1))
    loss_dp = float(stats_dp["loss"])

    mesh_3d = make_mesh(8, spatial=2, model=2)
    assert dict(mesh_3d.shape) == {"data": 2, "spatial": 2, "model": 2}
    with mesh_3d:
        s = shard_batch(mesh_3d, batch4)
        # use a low floor so the tiny test model has shardable leaves
        st = replicate_state(mesh_3d, state, min_model_dim=32)
        wide = [x for x in jax.tree_util.tree_leaves(st.params)
                if x.ndim >= 1 and x.shape[-1] >= 32]
        assert wide and all("model" in str(x.sharding.spec) for x in wide)
        new_state, stats_3d = train_step(st, s, jax.random.PRNGKey(1))
    loss_3d = float(stats_3d["loss"])
    np.testing.assert_allclose(loss_3d, loss_dp, rtol=1e-4)
    # updated params stay usable (finite) after a TP step
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(new_state.params))


def test_device_target_train_step_matches_host(synthetic_kitti, tiny_conf):
    """pre_compute_target=False: the train step assigns targets on-device
    from padded gts (targets.build_gt_arrays -> ops/targets_device.py inside
    the jit) and must produce the same loss/stats/update as the host
    precomputed-target path on an identical augmented batch."""
    from m3dssd_tpu.data.kitti import Kitti3DDataset
    from m3dssd_tpu.data.loader import TrainLoader
    from m3dssd_tpu.models import build
    from m3dssd_tpu.train.state import create_train_state, make_train_step

    conf_h = tiny_conf.replace(anchors=None)
    ds_h = Kitti3DDataset(conf_h, synthetic_kitti, phase="train")
    conf_d = conf_h.replace(pre_compute_target=False)
    ds_d = Kitti3DDataset(conf_d, synthetic_kitti, phase="train")

    # same seed => bit-identical augmented images from both loaders
    batch_h = next(TrainLoader(ds_h, 2, num_workers=2, seed=5).batches(1))
    batch_d = next(TrainLoader(ds_d, 2, num_workers=2, seed=5).batches(1))
    np.testing.assert_array_equal(batch_h["images"], batch_d["images"])
    assert "labels" not in batch_d and "gt_boxes2d" in batch_d

    model = build(conf_h)
    state = create_train_state(conf_h, model, jax.random.PRNGKey(0), 10)
    step_h = make_train_step(conf_h, ds_h.rois)
    step_d = make_train_step(conf_d, ds_d.rois)
    rng = jax.random.PRNGKey(1)
    s_h, st_h = step_h(state, batch_h, rng)
    s_d, st_d = step_d(state, batch_d, rng)

    for k in st_h:
        np.testing.assert_allclose(np.asarray(st_h[k]), np.asarray(st_d[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    ph = jax.tree_util.tree_leaves(s_h.params)
    pd = jax.tree_util.tree_leaves(s_d.params)
    for a, b in zip(ph, pd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_remat_light_stats_donate_exact(tiny_train_setup):
    """The train-perf knobs are exact: remat (recompute-in-backward) and
    light_stats (skip logging-only stats) must not change the training math,
    and donated-state steps must match non-donated ones.

    remat_dcn/remat_towers only change what XLA saves for the backward pass
    (jax.checkpoint); light_stats only drops stats-dict keys
    (losses/rpn_loss.py); donate only aliases buffers (train/state.py).
    """
    from m3dssd_tpu.models import build
    from m3dssd_tpu.train.state import create_train_state, make_train_step

    conf, ds, loader = tiny_train_setup
    conf = conf.replace(warmup=0.0)
    batch = next(iter(loader.batches(1)))
    rng = jax.random.PRNGKey(3)

    def one_step(c, donate=False):
        model = build(c)
        state = create_train_state(c, model, jax.random.PRNGKey(0), 100)
        step = make_train_step(c, ds.rois, donate=donate)
        new_state, stats = step(state, batch, rng)
        return new_state, stats

    s0, st0 = one_step(conf.replace(loss_light_stats=False))
    assert {"acc_fg", "acc_bg", "err_z", "err_ry"} <= set(st0)

    s1, st1 = one_step(conf.replace(remat_dcn=True, remat_towers=True))
    np.testing.assert_allclose(float(st1["loss"]), float(st0["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)

    s2, st2 = one_step(conf.replace(loss_light_stats=True))
    assert float(st2["loss"]) == float(st0["loss"])
    assert not {"acc_fg", "acc_bg", "err_z", "err_ry"} & set(st2)

    _, st3 = one_step(conf, donate=True)
    assert float(st3["loss"]) == float(st0["loss"])
