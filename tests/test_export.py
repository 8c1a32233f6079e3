"""AOT export: serialized StableHLO artifact reproduces the live detector."""

import jax
import jax.numpy as jnp
import numpy as np


def test_exported_detector_roundtrip(tiny_conf, tmp_path):
    from m3dssd_tpu.anchors import locate_anchors
    from m3dssd_tpu.inference.detect import make_detector
    from m3dssd_tpu.inference.export import (export_detector, load_detector,
                                             save_exported)
    from m3dssd_tpu.models import build
    from m3dssd_tpu.train.state import create_train_state
    from m3dssd_tpu.utils.synthetic_conf import finalize_conf_synthetic

    conf = finalize_conf_synthetic(tiny_conf.replace(anchors=None))
    model = build(conf, "test")
    state = create_train_state(conf, model, jax.random.PRNGKey(0), max_iter=1)
    rois = locate_anchors(conf.anchors, conf.feat_size, conf.feat_stride)

    exp = export_detector(conf, rois, model, state.params, state.batch_stats,
                          platforms=("cpu",))
    path = str(tmp_path / "det.shlo")
    save_exported(exp, path, conf=conf)

    served = load_detector(path)
    assert served.meta["det_cols"][4] == "score"
    assert served.meta["test_scale"] == list(conf.test_scale)

    h, w = conf.test_scale
    img = jnp.asarray(
        np.random.RandomState(0).rand(1, h, w, 3).astype(np.float32))
    sf = jnp.float32(1.0)
    live = make_detector(conf, rois, model)(
        state.params, state.batch_stats, img, sf)
    aot = served(img, sf)
    np.testing.assert_allclose(np.asarray(aot), np.asarray(live),
                               rtol=1e-5, atol=1e-5)

    # batched export: signature only (lowering is the expensive part we
    # already exercised above; the batched detector itself is e2e-tested)
    exp_b = export_detector(conf, rois, model, state.params,
                            state.batch_stats, batch_size=2,
                            platforms=("cpu",))
    assert exp_b.in_avals[0].shape == (2, h, w, 3)
    assert exp_b.in_avals[1].shape == (2,)
    assert exp_b.out_avals[0].shape == (2, conf.nms_topN_post, 14)


def test_fold_bn_eval_exact(tiny_conf):
    """BN constant-folding (utils/fold_bn.py) leaves the frozen eval forward
    numerically unchanged on the FULL flagship graph (ANAB + align + DCN
    necks + towers), with randomized BN stats so the fold is non-trivial."""
    from m3dssd_tpu.models import build
    from m3dssd_tpu.train.state import create_train_state
    from m3dssd_tpu.utils.fold_bn import fold_bn_eval
    from m3dssd_tpu.utils.synthetic_conf import finalize_conf_synthetic

    conf = finalize_conf_synthetic(tiny_conf.replace(
        anchors=None, crop_size=[96, 160], test_scale=[96, 160],
        num_anchor_scales=2, attention="ANAB", center_align=True,
        shape_align=True))
    model = build(conf, "test")
    state = create_train_state(conf, model, jax.random.PRNGKey(1), max_iter=1)

    # randomize every BN leaf so identity-stats can't mask a wrong fold
    rng = np.random.default_rng(3)

    def perturb(tree, leaves):
        if isinstance(tree, dict):
            return {k: (jnp.asarray(
                np.asarray(v) + rng.normal(0, 0.2, np.shape(v)) *
                (0.5 if k == "var" else 1.0) + (1.0 if k == "var" else 0.0))
                if k in leaves and not isinstance(v, dict) else
                perturb(v, leaves)) for k, v in tree.items()}
        return tree

    params = perturb(state.params, {"scale", "bias"})
    bstats = perturb(state.batch_stats, {"mean"})
    # variances must stay positive
    bstats = jax.tree_util.tree_map(
        lambda v: jnp.abs(v) + 0.05, perturb(bstats, {"var"}))

    p2, s2, n = fold_bn_eval(params, bstats)
    assert n > 40, f"only {n} BN folded"

    img = jnp.asarray(rng.normal(0, 1, (1, 96, 160, 3)).astype(np.float32))
    out0 = model.apply({"params": params, "batch_stats": bstats}, img,
                       train=False)
    out1 = model.apply({"params": p2, "batch_stats": s2}, img, train=False)
    for k in ["cls", "prob", "bbox_2d", "bbox_3d", "scores"]:
        np.testing.assert_allclose(np.asarray(out1[k]), np.asarray(out0[k]),
                                   rtol=2e-4, atol=2e-4, err_msg=k)


def test_export_fold_bn(tiny_conf):
    """fold_bn=True export reproduces the unfolded detector output."""
    from m3dssd_tpu.anchors import locate_anchors
    from m3dssd_tpu.inference.detect import make_detector
    from m3dssd_tpu.inference.export import export_detector
    from m3dssd_tpu.models import build
    from m3dssd_tpu.train.state import create_train_state
    from m3dssd_tpu.utils.synthetic_conf import finalize_conf_synthetic

    conf = finalize_conf_synthetic(tiny_conf.replace(
        anchors=None, crop_size=[96, 160], test_scale=[96, 160],
        num_anchor_scales=2))
    model = build(conf, "test")
    state = create_train_state(conf, model, jax.random.PRNGKey(0), max_iter=1)
    rois = locate_anchors(conf.anchors, conf.feat_size, conf.feat_stride)

    exp = export_detector(conf, rois, model, state.params, state.batch_stats,
                          platforms=("cpu",), fold_bn=True)
    img = jnp.asarray(
        np.random.RandomState(1).rand(1, 96, 160, 3).astype(np.float32))
    live = make_detector(conf, rois, model)(
        state.params, state.batch_stats, img, jnp.float32(1.0))
    aot = exp.call(img, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(aot), np.asarray(live),
                               rtol=1e-4, atol=1e-4)
