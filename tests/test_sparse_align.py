"""Top-M sparse alignment (models/align.py:SparseSel) equality tests.

The sparse path must be EXACT vs the dense deformable path whenever the
confident-position count fits the budget — and must fall back to the dense
path (same results again) when it overflows. Reference semantics:
ref:model/module/feturealign_mgpu.py:102-208 (shape), :7-99 (center).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3dssd_tpu.models.align import (CenterAlign, ShapeAlign, SparseSel,
                                     confident_topm)


def _mk_prob(B, H, W, A, confident, seed=0):
    """Mostly-background confidence field with `confident` hot positions."""
    rng = np.random.default_rng(seed)
    prob = rng.uniform(0.01, 0.3, size=(B, H, W, A)).astype(np.float32)
    flat = rng.choice(B * H * W, size=confident, replace=False)
    for p in flat:
        b, r = divmod(p, H * W)
        y, x = divmod(r, W)
        prob[b, y, x, rng.integers(0, A)] = rng.uniform(0.6, 0.95)
    return jnp.asarray(prob)


def _mk_anchors(A, seed=1):
    rng = np.random.default_rng(seed)
    w = rng.uniform(16, 120, A)
    h = rng.uniform(16, 120, A)
    return np.stack([-w / 2, -h / 2, w / 2, h / 2], axis=1).astype(np.float32)


def test_confident_topm_selects_exactly_the_confident_positions():
    prob = _mk_prob(2, 6, 8, 3, confident=5)
    sel = confident_topm(prob, 0.5, m_per_image=8)
    assert bool(sel.ok)
    flags = np.asarray(jnp.max(prob, -1) > 0.5).reshape(-1)
    want = np.nonzero(flags)[0]
    got = np.asarray(sel.pos)
    np.testing.assert_array_equal(got[:len(want)], want)
    assert (got[len(want):] == flags.size).all()      # sentinel tail

    # overflow: more confident positions than budget -> ok is False
    sel_small = confident_topm(prob, 0.5, m_per_image=1)
    assert not bool(sel_small.ok)

    # empty: no confident positions -> ok, all-sentinel
    sel_none = confident_topm(prob, 0.99, m_per_image=8)
    assert bool(sel_none.ok)
    assert (np.asarray(sel_none.pos) == flags.size).all()


@pytest.mark.parametrize("confident", [0, 7])
def test_shape_align_sparse_matches_dense(confident):
    B, H, W, C, A = 2, 10, 12, 16, 4
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    prob = _mk_prob(B, H, W, A, confident)
    m = ShapeAlign(C, _mk_anchors(A), feat_stride=8, kernel=3)
    v = m.init(jax.random.PRNGKey(0), x, prob)

    dense = m.apply(v, x, prob)
    sel = confident_topm(prob, m.thresh, m_per_image=8)
    assert bool(sel.ok)
    sparse = m.apply(v, x, prob, sparse_sel=sel)
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)

    # overflow budget -> cond takes the dense branch -> identical
    if confident > 1:
        sel1 = confident_topm(prob, m.thresh, m_per_image=1)
        assert not bool(sel1.ok)
        fallback = m.apply(v, x, prob, sparse_sel=sel1)
        np.testing.assert_allclose(np.asarray(fallback), np.asarray(dense),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("confident", [0, 7])
def test_center_align_sparse_matches_dense(confident):
    B, H, W, C, A = 2, 10, 12, 16, 4
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    prob = _mk_prob(B, H, W, A, confident)
    bx = jnp.asarray(rng.normal(size=(B, H, W, A)).astype(np.float32))
    by = jnp.asarray(rng.normal(size=(B, H, W, A)).astype(np.float32))
    m = CenterAlign(C, _mk_anchors(A), xy_mean=np.array([0.1, -0.05]),
                    xy_std=np.array([0.4, 0.3]), feat_stride=8)
    v = m.init(jax.random.PRNGKey(0), x, bx, by, prob)

    dense = m.apply(v, x, bx, by, prob)
    sel = confident_topm(prob, m.thresh, m_per_image=8)
    assert bool(sel.ok)
    sparse = m.apply(v, x, bx, by, prob, sparse_sel=sel)
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)

    if confident > 1:
        sel1 = confident_topm(prob, m.thresh, m_per_image=1)
        fallback = m.apply(v, x, bx, by, prob, sparse_sel=sel1)
        np.testing.assert_allclose(np.asarray(fallback), np.asarray(dense),
                                   rtol=1e-6, atol=1e-6)


def test_shape_align_sparse_gradients_match_dense():
    """sparse_align_train path: grads wrt x and params agree with dense."""
    B, H, W, C, A = 1, 8, 9, 8, 3
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    prob = _mk_prob(B, H, W, A, confident=4)
    m = ShapeAlign(C, _mk_anchors(A), feat_stride=8, kernel=3)
    v = m.init(jax.random.PRNGKey(0), x, prob)
    sel = confident_topm(prob, m.thresh, m_per_image=8)
    assert bool(sel.ok)

    def loss_dense(params, xx):
        return jnp.sum(m.apply(params, xx, prob) ** 2)

    def loss_sparse(params, xx):
        return jnp.sum(m.apply(params, xx, prob, sparse_sel=sel) ** 2)

    gd = jax.grad(loss_dense, argnums=(0, 1))(v, x)
    gs = jax.grad(loss_sparse, argnums=(0, 1))(v, x)
    for a, b in zip(jax.tree_util.tree_leaves(gd),
                    jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_full_model_sparse_eval_matches_dense(synthetic_kitti, tiny_conf):
    """Flagship-style model (shape+center align) end-to-end: detector
    outputs with the sparse knob on vs off."""
    from m3dssd_tpu.data.kitti import Kitti3DDataset
    from m3dssd_tpu.inference.detect import make_detector
    from m3dssd_tpu.models import build

    conf = tiny_conf.replace(anchors=None, crop_size=[96, 320],
                             test_scale=[96, 320], shape_align=True,
                             center_align=True, sparse_align_topm=0,
                             score_thres=0.05)
    ds = Kitti3DDataset(conf, synthetic_kitti, phase="train")
    val = Kitti3DDataset(conf, synthetic_kitti, phase="validation")
    model_dense = build(conf)
    conf_sparse = conf.replace(sparse_align_topm=1024)
    model_sparse = build(conf_sparse)

    v = model_dense.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 128, 3), jnp.float32), train=False)
    p, bs = v["params"], v.get("batch_stats", {})
    im = val[0]["input"][None]

    d_dense = np.asarray(make_detector(conf, ds.rois, model_dense)(
        p, bs, im, np.float32(1.0)))
    d_sparse = np.asarray(make_detector(conf_sparse, ds.rois, model_sparse)(
        p, bs, im, np.float32(1.0)))
    np.testing.assert_allclose(d_sparse, d_dense, rtol=1e-4, atol=1e-3)


def test_sparse_train_on_2d_mesh_matches_dense(synthetic_kitti, tiny_conf):
    """conf.sparse_align_train under GSPMD: the sparse path's cumsum/
    searchsorted/scatter must partition correctly on a 2-D data x spatial
    mesh and produce the same loss as the dense path."""
    import jax
    from m3dssd_tpu.data.kitti import Kitti3DDataset
    from m3dssd_tpu.data.loader import TrainLoader
    from m3dssd_tpu.models import build
    from m3dssd_tpu.parallel import make_mesh, replicate_state, shard_batch
    from m3dssd_tpu.train.state import create_train_state, make_train_step

    conf0 = tiny_conf.replace(anchors=None, warmup=0.0, shape_align=True,
                              center_align=True, sparse_align_topm=0)
    ds = Kitti3DDataset(conf0, synthetic_kitti, phase="train")
    loader = TrainLoader(ds, batch_size=2, num_workers=2, seed=0)
    batch = next(iter(loader.batches(1)))
    batch4 = {k: np.concatenate([np.asarray(v)] * 2, axis=0)
              for k, v in batch.items()}

    def loss_with(conf):
        model = build(conf)
        state = create_train_state(conf, model, jax.random.PRNGKey(0),
                                   max_iter=100)
        step = make_train_step(conf, ds.rois)
        mesh = make_mesh(8, spatial=2)
        with mesh:
            s = shard_batch(mesh, batch4)
            st = replicate_state(mesh, state)
            _, stats = step(st, s, jax.random.PRNGKey(1))
        return float(stats["loss"])

    loss_dense = loss_with(conf0)
    loss_sparse = loss_with(conf0.replace(sparse_align_topm=512,
                                          sparse_align_train=True))
    np.testing.assert_allclose(loss_sparse, loss_dense, rtol=2e-4)
