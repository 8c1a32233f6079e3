"""Tests for the capability-parity module grab-bag (models/extras.py, M6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3dssd_tpu.models import extras


def test_bbox_transform_retina_roundtrip():
    """Zero deltas return the anchors; known deltas decode analytically."""
    anchors = jnp.array([[10.0, 20.0, 50.0, 60.0]])
    out = extras.bbox_transform_retina(anchors, jnp.zeros((1, 4)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(anchors),
                               atol=1e-5)
    # dx = 1 std-unit shifts center by 0.1 * width
    out = extras.bbox_transform_retina(anchors,
                                       jnp.array([[1.0, 0.0, 0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(out)[0, [0, 2]],
                               [10.0 + 4.0, 50.0 + 4.0], atol=1e-4)


def test_clip_boxes():
    b = jnp.array([[-5.0, -3.0, 900.0, 400.0]])
    out = np.asarray(extras.clip_boxes(b, 375, 800))
    np.testing.assert_allclose(out, [[0, 0, 800, 375]])


def test_retina_heads_shapes_and_prior():
    x = jnp.zeros((2, 8, 10, 32))
    reg = extras.RetinaRegressionHead(num_anchors=9)
    cls = extras.RetinaClassificationHead(num_anchors=9, num_classes=5,
                                          prior=0.01)
    rv = reg.init(jax.random.PRNGKey(0), x)
    cv = cls.init(jax.random.PRNGKey(1), x)
    r = reg.apply(rv, x)
    c = cls.apply(cv, x)
    assert r.shape == (2, 8 * 10 * 9, 4)
    assert c.shape == (2, 8 * 10 * 9, 5)
    # zero input + prior-bias: initial P(fg) == prior (last-conv weights see
    # zero activations only through the relu towers on zero input)
    np.testing.assert_allclose(np.asarray(c), 0.01, atol=1e-3)


def test_anchors_for_shape():
    a = extras.anchors_for_shape((64, 128), pyramid_levels=(3, 4))
    per_cell = 9
    n3 = (64 // 8) * (128 // 8) * per_cell
    n4 = (64 // 16) * (128 // 16) * per_cell
    assert a.shape == (n3 + n4, 4)
    # all boxes have positive extent
    assert np.all(a[:, 2] > a[:, 0]) and np.all(a[:, 3] > a[:, 1])


def test_conv_ws_standardizes_weights():
    """Output of ConvWS equals a plain conv with the whitened kernel."""
    x = jnp.array(np.random.default_rng(0).normal(
        size=(1, 6, 6, 4)).astype(np.float32))
    m = extras.ConvWS(features=8, kernel=3, use_bias=False)
    v = m.init(jax.random.PRNGKey(2), x)
    y = np.asarray(m.apply(v, x))
    w = np.asarray(v["params"]["kernel"])
    wn = (w - w.mean(axis=(0, 1, 2), keepdims=True)) / \
        (w.std(axis=(0, 1, 2), keepdims=True) + 1e-5)
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(wn), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(y, np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("conv_type,norm,act",
                         [("conv", "bn", "relu"), ("conv_ws", "gn", "leaky"),
                          ("conv", None, None)])
def test_conv_module_variants(conv_type, norm, act):
    x = jnp.ones((2, 8, 8, 16))
    m = extras.ConvModule(features=32, conv_type=conv_type, norm=norm,
                          act=act, gn_groups=8)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (2, 8, 8, 32)
    assert np.isfinite(np.asarray(y)).all()


def test_swish_and_drop_connect():
    x = jnp.array([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(np.asarray(extras.swish(x)),
                               np.asarray(x) / (1 + np.exp(-np.asarray(x))),
                               rtol=1e-6)
    y = extras.drop_connect(jnp.ones((8, 2, 2, 1)), jax.random.PRNGKey(0),
                            0.5, deterministic=False)
    vals = np.unique(np.asarray(y))
    assert set(np.round(vals, 4)).issubset({0.0, 2.0})
    # deterministic mode is identity
    z = extras.drop_connect(jnp.ones((4, 1)), jax.random.PRNGKey(0), 0.5,
                            deterministic=True)
    np.testing.assert_allclose(np.asarray(z), 1.0)


def test_same_padding_conv_output_size():
    x = jnp.zeros((1, 7, 9, 3))
    m = extras.Conv2dSamePadding(features=4, kernel=3, stride=2)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 4, 5, 4)     # ceil(7/2), ceil(9/2)


def test_round_filters_and_bias_prior():
    assert extras.round_filters(32, None) == 32
    assert extras.round_filters(32, 1.5) == 48
    b = extras.bias_init_with_prob(0.01)
    assert abs(1 / (1 + np.exp(-b)) - 0.01) < 1e-9


def test_init_helpers_statistics():
    rng = jax.random.PRNGKey(0)
    w = np.asarray(extras.kaiming_init(rng, (3, 3, 64, 64)))
    fan_out = 64 * 9
    assert abs(w.std() - np.sqrt(2.0 / fan_out)) < 0.01
    w2 = np.asarray(extras.xavier_init(rng, (128, 256)))
    assert abs(w2.std() - np.sqrt(2.0 / (128 + 256))) < 0.01
