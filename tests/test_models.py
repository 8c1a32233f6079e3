"""Model zoo tests: shapes, variants, alignment/attention paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3dssd_tpu.models import build, make_dla
from m3dssd_tpu.models.attention import ANAB
from m3dssd_tpu.models.layers import AdaptiveAvgPool2d, LocalConv2d
from m3dssd_tpu.models.necks import DLASeg
from m3dssd_tpu.models.rpn import flatten_anchor_map, unflatten_anchor_map


def test_adaptive_avg_pool_matches_torch_semantics():
    """Exact torch AdaptiveAvgPool2d behavior on non-divisible sizes."""
    import torch
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 7, 11, 3)).astype(np.float32)
    for out in [(1, 1), (4, 4), (3, 5)]:
        got = np.asarray(AdaptiveAvgPool2d.apply(jnp.array(x), *out))
        want = torch.nn.functional.adaptive_avg_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), out).numpy()
        np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                                   rtol=1e-5, atol=1e-6)


def test_flatten_unflatten_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.array(rng.normal(size=(2, 4, 6, 3, 5)).astype(np.float32))
    flat = flatten_anchor_map(x)
    assert flat.shape == (2, 3 * 4 * 6, 5)
    back = unflatten_anchor_map(flat, (4, 6), 3)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))
    # flat order (h, w, a): n = (h*W + w)*A + a
    np.testing.assert_allclose(np.asarray(flat[0, (2 * 6 + 3) * 3 + 1]),
                               np.asarray(x[0, 2, 3, 1]))


def test_local_conv2d_bands_are_independent():
    """Each row band uses its own kernel: perturbing band 0's input must not
    change band 1's interior output."""
    m = LocalConv2d(num_rows=2, features=4)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 8, 6, 3)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.array(x))
    y0 = np.asarray(m.apply(params, jnp.array(x)))
    x2 = x.copy()
    x2[:, 0:2] += 10.0  # inside band 0 only, away from the band boundary
    y1 = np.asarray(m.apply(params, jnp.array(x2)))
    assert np.abs(y1[:, 0:3] - y0[:, 0:3]).max() > 0.1   # band 0 changed
    np.testing.assert_allclose(y1[:, 5:], y0[:, 5:], atol=1e-6)  # band 1 interior


def test_dla34_level_shapes():
    model, channels = make_dla("dla34")
    x = jnp.zeros((1, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    levels = model.apply(variables, x, train=False)
    assert len(levels) == 6
    for i, lv in enumerate(levels):
        stride = 2 ** max(0, i - 1) if i <= 1 else 2 ** (i - 1)
        # strides are 1,2,4,8,16,32
    strides = [1, 2, 4, 8, 16, 32]
    for lv, s, c in zip(levels, strides, channels):
        assert lv.shape == (1, 64 // s, 96 // s, c), (lv.shape, s, c)


@pytest.mark.parametrize("use_dcn", [False, True])
def test_dlaseg_stride8_output(use_dcn):
    seg = DLASeg(base_name="dla34", down_ratio=8, use_dcn=use_dcn)
    x = jnp.zeros((1, 64, 96, 3))
    variables = seg.init(jax.random.PRNGKey(0), x, train=False)
    y = seg.apply(variables, x, train=False)
    assert y.shape == (1, 8, 12, 128)


def test_anab_shape_and_residual():
    m = ANAB()
    rng = np.random.default_rng(3)
    x = jnp.array(rng.normal(size=(2, 8, 12, 16)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape
    # with zero-init Q/K/V convs? no — convs are random; just check finite
    assert np.isfinite(np.asarray(y)).all()


def test_nl_up_attention():
    """NLUp: cross-resolution position attention; rows of the attention
    matrix are convex combinations of value tokens."""
    from m3dssd_tpu.models.attention import NLUp

    rng = np.random.default_rng(5)
    q = jnp.array(rng.normal(size=(2, 6, 8, 16)).astype(np.float32))
    v = jnp.array(rng.normal(size=(2, 3, 4, 24)).astype(np.float32))
    m = NLUp()
    params = m.init(jax.random.PRNGKey(0), q, v, train=False)
    y = m.apply(params, q, v, train=False)
    assert y.shape == q.shape
    assert np.isfinite(np.asarray(y)).all()
    # softmax rows are convex weights: every output position lies within the
    # [min, max] range of the projected value tokens (per channel)
    kernel = np.asarray(params["params"]["v_conv"]["kernel"])[0, 0]  # [24,16]
    vtok = np.asarray(v).reshape(2, -1, 24) @ kernel                 # [B,S,16]
    out = np.asarray(y).reshape(2, -1, 16)
    assert (out <= vtok.max(axis=1, keepdims=True) + 1e-5).all()
    assert (out >= vtok.min(axis=1, keepdims=True) - 1e-5).all()


def test_deform_loc_conv_zero_offset_equals_banded_conv():
    """At init (zero offsets, mask 0.5) DeformLocConv must equal 0.5x a
    per-band plain conv with the same weights — checked against the numpy
    DCN oracle per band."""
    from m3dssd_tpu.models.necks import DeformLocConv
    from m3dssd_tpu.ops.dcn import dcn_v2_reference

    B, H, W, C, F, r = 1, 8, 6, 5, 7, 2
    rng = np.random.default_rng(7)
    x = jnp.array(rng.normal(size=(B, H, W, C)).astype(np.float32))
    m = DeformLocConv(features=F, num_rows=r)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    y = np.asarray(m.apply(variables, x, train=False,
                           mutable=["batch_stats"])[0])
    assert y.shape == (B, H, W, F)

    # reproduce pre-BN output with the oracle, band by band. NOTE bands see
    # REAL neighbor rows in their halo (the module pads the full image then
    # slices overlapping bands, like the reference's pad+unfold), so feed the
    # oracle the padded band with padding=0.
    w = np.asarray(variables["params"]["weight"])     # [r, 9C, F]
    b = np.asarray(variables["params"]["bias"])       # [r, F]
    t = H // r
    xp = np.pad(np.asarray(x), [(0, 0), (1, 1), (1, 1), (0, 0)])
    pre = np.zeros((B, H, W, F))
    for i in range(r):
        band = xp[:, i * t:i * t + t + 2]             # [B, t+2, W+2, C]
        KK = 9
        off = np.zeros((B, t, W, KK, 2))
        mask = np.full((B, t, W, KK), 0.5)
        wi = w[i].reshape(3, 3, C, F)
        pre[:, i * t:i * t + t] = dcn_v2_reference(
            band, off, mask, wi, b[i], stride=1, padding=0)
    # apply the module's BN (init: mean 0 var 1) + leaky relu
    bn = variables["params"]["BatchNorm_0"]
    expect = pre * np.asarray(bn["scale"]) + np.asarray(bn["bias"])
    expect = np.where(expect >= 0, expect, 0.01 * expect)
    np.testing.assert_allclose(y, expect, rtol=1e-4, atol=1e-4)


def _tiny_build_conf(tiny_conf, **kw):
    conf = tiny_conf.replace(**kw)
    if conf.anchors is None:
        A = conf.num_anchor_scales * len(conf.anchor_ratios)
        rng = np.random.default_rng(0)
        anchors = np.concatenate([
            rng.uniform(-20, 20, [A, 2]),
            rng.uniform(30, 60, [A, 2]),
            np.abs(rng.normal(20, 5, [A, 1])),
            np.abs(rng.normal(2, 0.3, [A, 3])),
            rng.uniform(-1, 1, [A, 1])], axis=1)
        anchors[:, 2:4] += anchors[:, 0:2]
        conf = conf.replace(anchors=anchors,
                            bbox_means=np.zeros([1, 11]),
                            bbox_stds=np.ones([1, 11]))
    return conf


@pytest.mark.parametrize("variant", ["base", "anab_fullalign"])
def test_rpn_forward_shapes(tiny_conf, variant):
    kw = {}
    if variant == "anab_fullalign":
        kw = dict(attention="ANAB", center_align=True, shape_align=True)
    conf = _tiny_build_conf(tiny_conf, **kw)
    model = build(conf)
    H, W = conf.crop_size
    x = jnp.zeros((1, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)

    A = conf.anchors.shape[0]
    fh, fw = H // 8, W // 8
    N = A * fh * fw
    assert out["cls"].shape == (1, N, conf.num_classes)
    assert out["prob"].shape == (1, N, conf.num_classes)
    assert out["bbox_2d"].shape == (1, 4, N)   # channel-major (PERF.md)
    assert out["bbox_3d"].shape == (1, 7, N)
    assert out["feat_size"] == (fh, fw)
    prob = np.asarray(out["prob"])
    np.testing.assert_allclose(prob.sum(-1), 1.0, atol=1e-3)


def test_rpn_train_mode_updates_batch_stats(tiny_conf):
    conf = _tiny_build_conf(tiny_conf)
    model = build(conf)
    x = jnp.ones((1, conf.crop_size[0], conf.crop_size[1], 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = model.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    # at least one BN running stat must have moved
    leaves0 = jax.tree_util.tree_leaves(variables["batch_stats"])
    leaves1 = jax.tree_util.tree_leaves(mutated["batch_stats"])
    moved = any(not np.allclose(a, b) for a, b in zip(leaves0, leaves1))
    assert moved


def test_s2d_stem_matches_canonical():
    """The space-to-depth stem is an exact relabeling of the canonical stem:
    same param tree, same outputs (all 6 levels), train and eval modes."""
    rng = np.random.default_rng(7)
    x = jnp.array(rng.normal(size=(2, 64, 96, 3)).astype(np.float32))
    dla_a, _ = make_dla("dla34", s2d=False)
    dla_b, _ = make_dla("dla34", s2d=True)
    v = dla_a.init(jax.random.PRNGKey(0), x, train=False)
    # identical parameter structure (torch import / checkpoints unaffected)
    vb = dla_b.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.structure(v) == jax.tree.structure(vb)
    outs_a = dla_a.apply(v, x, train=False)
    outs_b = dla_b.apply(v, x, train=False)
    assert len(outs_a) == len(outs_b) == 6
    for i, (a, b) in enumerate(zip(outs_a, outs_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"level {i}")
    # train mode: batch stats updates must match (phase-pooled statistics)
    # train mode normalizes by batch statistics (divides by tiny stds),
    # which amplifies accumulation-order noise -> looser tolerance
    outs_a, mut_a = dla_a.apply(v, x, train=True, mutable=["batch_stats"])
    outs_b, mut_b = dla_b.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(outs_a[-1]), np.asarray(outs_b[-1]),
                               rtol=1e-2, atol=1e-3)
    fa = jax.tree.leaves(mut_a)
    fb = jax.tree.leaves(mut_b)
    for la, lb in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-2, atol=1e-3)


def test_model_scores_match_prob_reduce():
    """The model's in-layout det scores/classes equal the naive reduce over
    the flattened softmax output."""
    from m3dssd_tpu.config import kitti_3d_base
    from m3dssd_tpu.utils.synthetic_conf import finalize_conf_synthetic
    conf = finalize_conf_synthetic(kitti_3d_base().replace(
        crop_size=[64, 96], test_scale=[64, 96], num_anchor_scales=3,
        back_bone="dla34", pre_train=False, compute_dtype="float32"))
    model = build(conf)
    rng = np.random.default_rng(3)
    x = jnp.array(rng.normal(size=(1, 64, 96, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(1), x, train=False)
    out = model.apply(v, x, train=False)
    prob = np.asarray(out["prob"][0])
    want_scores = prob[:, 1:].max(axis=1)
    want_cls = prob[:, 1:].argmax(axis=1) + 1
    np.testing.assert_allclose(np.asarray(out["scores"][0]), want_scores,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out["cls_pred"][0]), want_cls)


def test_packed_input_matches_raw():
    """Feeding host-packed images (space_to_depth_np) with packed=True gives
    identical outputs to the raw-image path."""
    from m3dssd_tpu.config import kitti_3d_base
    from m3dssd_tpu.models.dla import space_to_depth_np
    from m3dssd_tpu.utils.synthetic_conf import finalize_conf_synthetic
    conf = finalize_conf_synthetic(kitti_3d_base().replace(
        crop_size=[64, 96], test_scale=[64, 96], num_anchor_scales=3,
        back_bone="dla34", pre_train=False, compute_dtype="float32"))
    model = build(conf)
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 64, 96, 3)).astype(np.float32)
    v = model.init(jax.random.PRNGKey(1), jnp.array(x), train=False)
    out_raw = model.apply(v, jnp.array(x), train=False)
    out_pk = model.apply(v, jnp.array(space_to_depth_np(x)), train=False,
                         packed=True)
    for k in ("prob", "scores", "bbox_2d", "bbox_3d"):
        np.testing.assert_allclose(np.asarray(out_raw[k]),
                                   np.asarray(out_pk[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_bias_background_sparsifies_confidence(synthetic_kitti, tiny_conf):
    """models/rpn.py:bias_background raises P(bg): fg_prob drops below the
    alignment threshold almost everywhere (the deployment regime bench.py
    emulates), and the params tree shape/dtype is unchanged."""
    import jax
    import jax.numpy as jnp
    from m3dssd_tpu.data.kitti import Kitti3DDataset
    from m3dssd_tpu.models import build
    from m3dssd_tpu.models.rpn import bias_background

    conf = tiny_conf.replace(anchors=None)
    Kitti3DDataset(conf, synthetic_kitti, phase="train")  # injects anchors
    model = build(conf)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 64, 128, 3), jnp.float32), train=False)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 64, 128, 3)).astype(np.float32))

    out0 = model.apply(v, x, train=False)
    p2 = bias_background(v["params"], conf.num_classes, 4.0)
    out1 = model.apply({"params": p2, "batch_stats": v["batch_stats"]},
                       x, train=False)
    fg0 = 1.0 - np.asarray(out0["prob"])[..., 0]
    fg1 = 1.0 - np.asarray(out1["prob"])[..., 0]
    assert (fg1 > 0.5).mean() < 0.01 < (fg0 > 0.5).mean()
    assert jax.tree_util.tree_structure(p2) == \
        jax.tree_util.tree_structure(v["params"])
