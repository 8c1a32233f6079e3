"""DCNv2 op tests: oracle comparison, conv equivalence, gradients.

Mirrors the reference's kernel test strategy (ref:model/DCNv2/test.py:
zero-offset identity checks + gradcheck) with a numpy loop oracle and
finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3dssd_tpu.ops.dcn import dcn_v2, dcn_v2_reference, bilinear_sample


def _rand_case(rng, B=2, H=6, W=7, Cin=3, Cout=4, K=3):
    x = rng.normal(size=(B, H, W, Cin)).astype(np.float32)
    offset = (rng.normal(size=(B, H, W, K * K, 2)) * 1.5).astype(np.float32)
    mask = rng.uniform(0.2, 1.0, size=(B, H, W, K * K)).astype(np.float32)
    weight = rng.normal(size=(K, K, Cin, Cout)).astype(np.float32) * 0.3
    bias = rng.normal(size=(Cout,)).astype(np.float32)
    return x, offset, mask, weight, bias


def test_dcn_matches_loop_oracle():
    rng = np.random.default_rng(0)
    x, offset, mask, weight, bias = _rand_case(rng)
    got = dcn_v2(jnp.array(x), jnp.array(offset), jnp.array(mask),
                 jnp.array(weight), jnp.array(bias))
    want = dcn_v2_reference(x, offset, mask, weight, bias)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_zero_offset_equals_plain_conv():
    """With zero offsets and unit mask, DCNv2 == standard 3x3 conv
    (ref:model/DCNv2/test.py:32 check_zero_offset)."""
    rng = np.random.default_rng(1)
    B, H, W, Cin, Cout, K = 2, 8, 9, 3, 5, 3
    x = rng.normal(size=(B, H, W, Cin)).astype(np.float32)
    weight = rng.normal(size=(K, K, Cin, Cout)).astype(np.float32) * 0.2
    offset = np.zeros((B, H, W, K * K, 2), np.float32)
    mask = np.ones((B, H, W, K * K), np.float32)

    got = dcn_v2(jnp.array(x), jnp.array(offset), jnp.array(mask),
                 jnp.array(weight))
    conv = jax.lax.conv_general_dilated(
        jnp.array(x), jnp.array(weight), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(conv),
                               rtol=1e-4, atol=1e-4)


def test_integer_offset_is_shift():
    """Integer offsets shift the sampling grid exactly."""
    rng = np.random.default_rng(2)
    B, H, W, C = 1, 8, 8, 2
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    # 1x1 kernel, identity weight per channel
    weight = np.zeros((1, 1, C, C), np.float32)
    weight[0, 0] = np.eye(C)
    offset = np.zeros((B, H, W, 1, 2), np.float32)
    offset[..., 0, 0] = 1.0  # dy = +1 -> sample one row down
    mask = np.ones((B, H, W, 1), np.float32)
    got = np.asarray(dcn_v2(jnp.array(x), jnp.array(offset), jnp.array(mask),
                            jnp.array(weight), stride=1, padding=0))
    np.testing.assert_allclose(got[:, :-1], x[:, 1:], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got[:, -1], 0.0, atol=1e-6)  # out of bounds


def test_mask_modulation():
    rng = np.random.default_rng(3)
    x, offset, mask, weight, bias = _rand_case(rng, B=1, H=5, W=5)
    half = dcn_v2(jnp.array(x), jnp.array(offset), jnp.array(mask * 0.5),
                  jnp.array(weight))
    full = dcn_v2(jnp.array(x), jnp.array(offset), jnp.array(mask),
                  jnp.array(weight))
    np.testing.assert_allclose(np.asarray(half), np.asarray(full) * 0.5,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("wrt", ["x", "offset", "mask", "weight"])
def test_gradients_finite_difference(wrt):
    """Autodiff gradients match central finite differences
    (role of ref:model/DCNv2/test.py gradcheck)."""
    rng = np.random.default_rng(4)
    x, offset, mask, weight, bias = _rand_case(rng, B=1, H=4, W=4, Cin=2,
                                               Cout=2)
    jax.config.update("jax_enable_x64", True)
    try:
        args = {"x": jnp.array(x, jnp.float64),
                "offset": jnp.array(offset, jnp.float64),
                "mask": jnp.array(mask, jnp.float64),
                "weight": jnp.array(weight, jnp.float64)}

        def f(v):
            a = dict(args)
            a[wrt] = v
            with jax.disable_jit():
                out = dcn_v2(a["x"], a["offset"], a["mask"], a["weight"],
                             jnp.array(bias, jnp.float64))
            return jnp.sum(out * jnp.cos(jnp.arange(out.size, dtype=jnp.float64)
                                         .reshape(out.shape)))

        g = np.asarray(jax.grad(f)(args[wrt]))
        v0 = np.asarray(args[wrt], dtype=np.float64)
        eps = 1e-5
        idxs = [tuple(rng.integers(0, s) for s in v0.shape) for _ in range(6)]
        for idx in idxs:
            vp = v0.copy(); vp[idx] += eps
            vm = v0.copy(); vm[idx] -= eps
            fd = (float(f(jnp.array(vp))) - float(f(jnp.array(vm)))) / (2 * eps)
            # offset gradients are only piecewise-smooth (bilinear kinks at
            # integer coords); tolerance reflects that
            np.testing.assert_allclose(g[idx], fd, rtol=2e-3, atol=2e-5)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_bilinear_sample_exact_at_integers():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 5, 6, 3)).astype(np.float32)
    py = jnp.array([[2.0, 4.0]])
    px = jnp.array([[3.0, 5.0]])
    got = np.asarray(bilinear_sample(jnp.array(x), py, px))
    np.testing.assert_allclose(got[0, 0], x[0, 2, 3], rtol=1e-6)
    np.testing.assert_allclose(got[0, 1], x[0, 4, 5], rtol=1e-6)


def test_stride_2():
    rng = np.random.default_rng(6)
    B, H, W, Cin, Cout, K = 1, 8, 8, 2, 3, 3
    x = rng.normal(size=(B, H, W, Cin)).astype(np.float32)
    Ho = Wo = 4
    offset = (rng.normal(size=(B, Ho, Wo, K * K, 2)) * 0.7).astype(np.float32)
    mask = rng.uniform(0.5, 1.0, size=(B, Ho, Wo, K * K)).astype(np.float32)
    weight = rng.normal(size=(K, K, Cin, Cout)).astype(np.float32)
    got = dcn_v2(jnp.array(x), jnp.array(offset), jnp.array(mask),
                 jnp.array(weight), stride=2)
    want = dcn_v2_reference(x, offset, mask, weight, stride=2)
    assert got.shape == (B, Ho, Wo, Cout)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_bilinear_sample_paired_matches_plain():
    from m3dssd_tpu.ops.dcn import bilinear_sample_paired
    rng = np.random.default_rng(9)
    x = jnp.array(rng.normal(size=(2, 7, 9, 5)).astype(np.float32))
    # sample points covering interior, boundaries, and out-of-bounds
    py = jnp.array(rng.uniform(-2, 9, size=(2, 40)).astype(np.float32))
    px = jnp.array(rng.uniform(-2, 11, size=(2, 40)).astype(np.float32))
    a = np.asarray(bilinear_sample(x, py, px))
    b = np.asarray(bilinear_sample_paired(x, py, px))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    # exact integer coords too
    pyi = jnp.array([[0.0, 6.0, 3.0]])
    pxi = jnp.array([[0.0, 8.0, 4.0]])
    a = np.asarray(bilinear_sample(x[:1], pyi, pxi))
    b = np.asarray(bilinear_sample_paired(x[:1], pyi, pxi))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_bilinear_sample_packed_matches_plain():
    from m3dssd_tpu.ops.dcn import bilinear_sample_packed
    rng = np.random.default_rng(10)
    x = jnp.array(rng.normal(size=(2, 7, 9, 5)).astype(np.float32))
    # sample points covering interior, boundaries, and out-of-bounds
    py = jnp.array(rng.uniform(-2, 9, size=(2, 40)).astype(np.float32))
    px = jnp.array(rng.uniform(-2, 11, size=(2, 40)).astype(np.float32))
    a = np.asarray(bilinear_sample(x, py, px))
    b = np.asarray(bilinear_sample_packed(x, py, px))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    # exact integer coords (incl. the H-1/W-1 edge where x0+1 is OOB)
    pyi = jnp.array([[0.0, 6.0, 3.0, -1.0]])
    pxi = jnp.array([[0.0, 8.0, 4.0, 11.0]])
    a = np.asarray(bilinear_sample(x[:1], pyi, pxi))
    b = np.asarray(bilinear_sample_packed(x[:1], pyi, pxi))
    np.testing.assert_allclose(a, b, rtol=1e-6)
    # gradients agree too (the packed path must backprop identically)
    def f(fn):
        return lambda v: jnp.sum(fn(v, py, px) ** 2)
    ga = np.asarray(jax.grad(f(bilinear_sample))(x))
    gb = np.asarray(jax.grad(f(bilinear_sample_packed))(x))
    np.testing.assert_allclose(ga, gb, rtol=1e-4, atol=1e-5)


def test_dcn_shift_matches_gather_for_clamped_offsets():
    from m3dssd_tpu.ops.dcn import dcn_v2_shift
    rng = np.random.default_rng(11)
    B, H, W, C, Co = 2, 7, 9, 6, 5
    x = jnp.array(rng.normal(size=(B, H, W, C)).astype(np.float32))
    offset = jnp.array(np.clip(rng.normal(size=(B, H, W, 9, 2)) * 0.7,
                               -1, 1).astype(np.float32))
    mask = jnp.array(rng.uniform(0.2, 1, size=(B, H, W, 9)).astype(np.float32))
    w = jnp.array((rng.normal(size=(3, 3, C, Co)) * 0.3).astype(np.float32))
    b = jnp.array(rng.normal(size=(Co,)).astype(np.float32))
    a = np.asarray(dcn_v2(x, offset, mask, w, b))
    s = np.asarray(dcn_v2_shift(x, offset, mask, w, b, clamp=1.0))
    np.testing.assert_allclose(s, a, rtol=1e-4, atol=1e-4)
    # out-of-range offsets are clamped (differs from gather by design)
    big = offset * 10.0
    s2 = np.asarray(dcn_v2_shift(x, big, mask, w, b, clamp=1.0))
    s3 = np.asarray(dcn_v2_shift(x, jnp.clip(big, -1, 1), mask, w, b, clamp=1.0))
    np.testing.assert_allclose(s2, s3, rtol=1e-5)


def test_dcn_shift_gradients_flow():
    from m3dssd_tpu.ops.dcn import dcn_v2_shift
    rng = np.random.default_rng(12)
    x = jnp.array(rng.normal(size=(1, 5, 6, 4)).astype(np.float32))
    offset = jnp.array((rng.normal(size=(1, 5, 6, 9, 2)) * 0.3).astype(np.float32))
    mask = jnp.array(rng.uniform(0.5, 1, size=(1, 5, 6, 9)).astype(np.float32))
    w = jnp.array((rng.normal(size=(3, 3, 4, 4)) * 0.2).astype(np.float32))

    def loss(o):
        return jnp.sum(dcn_v2_shift(x, o, mask, w, clamp=1.0) ** 2)

    g = np.asarray(jax.grad(loss)(offset))
    assert np.isfinite(g).all() and np.abs(g).sum() > 0


def test_dcn_shift_pallas_matches_xla():
    """The fused Pallas kernel (interpret mode on CPU) equals dcn_v2_shift."""
    from m3dssd_tpu.ops.dcn import dcn_v2_shift
    from m3dssd_tpu.ops.dcn_pallas import dcn_v2_shift_pallas
    rng = np.random.default_rng(13)
    B, H, W, C, Co = 2, 6, 11, 8, 16    # W chosen so Wp is NOT 8-aligned
    x = jnp.array(rng.normal(size=(B, H, W, C)).astype(np.float32))
    off = jnp.array((rng.normal(size=(B, H, W, 9, 2)) * 0.8)
                    .astype(np.float32))
    m = jnp.array(rng.random((B, H, W, 9)).astype(np.float32))
    w = jnp.array((rng.normal(size=(3, 3, C, Co)) * 0.1).astype(np.float32))
    b = jnp.array(rng.normal(size=(Co,)).astype(np.float32))
    want = np.asarray(dcn_v2_shift(x, off, m, w, b, clamp=1.0))
    got = np.asarray(dcn_v2_shift_pallas(x, off, m, w, b, clamp=1.0,
                                         interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("clamp", [1.0, 2.0])
def test_dcn_shift_custom_vjp_matches_autodiff(clamp):
    """The hand-written shift-DCN transpose (_dcn_shift_core_bwd) equals
    XLA's autodiff of the identical forward, for every input grad."""
    from m3dssd_tpu.ops.dcn import dcn_v2_shift
    rng = np.random.default_rng(21)
    B, H, W, C, Co = 2, 5, 7, 4, 6
    x = jnp.array(rng.normal(size=(B, H, W, C)).astype(np.float32))
    # spans the clip boundary on both sides
    off = jnp.array(rng.uniform(-clamp - 0.7, clamp + 0.7,
                                size=(B, H, W, 9, 2)).astype(np.float32))
    m = jnp.array(rng.uniform(0, 1, size=(B, H, W, 9)).astype(np.float32))
    w = jnp.array((rng.normal(size=(3, 3, C, Co)) * 0.3).astype(np.float32))
    b = jnp.array(rng.normal(size=(Co,)).astype(np.float32))
    cot = jnp.array(rng.normal(size=(B, H, W, Co)).astype(np.float32))

    def loss(custom):
        return lambda *a: jnp.sum(
            dcn_v2_shift(*a, clamp=clamp, custom_vjp=custom) * cot)

    ga = jax.grad(loss(False), argnums=(0, 1, 2, 3, 4))(x, off, m, w, b)
    gc = jax.grad(loss(True), argnums=(0, 1, 2, 3, 4))(x, off, m, w, b)
    for name, a, c in zip("x off mask w b".split(), ga, gc):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=1e-5, atol=1e-6, err_msg=name)
    # forward traces are identical
    np.testing.assert_array_equal(
        np.asarray(dcn_v2_shift(x, off, m, w, b, clamp=clamp,
                                custom_vjp=True)),
        np.asarray(dcn_v2_shift(x, off, m, w, b, clamp=clamp,
                                custom_vjp=False)))


def test_dcn_shift_custom_vjp_subgradient_ties():
    """At EXACT tie points — zero-init offsets (the DCN module's init state,
    where the relu kink of the d=+-1 triangle knots is hit everywhere) and
    offsets exactly at +-clamp — the custom VJP must reproduce autodiff's
    subgradient convention, or offset learning from init would change."""
    from m3dssd_tpu.ops.dcn import dcn_v2_shift
    rng = np.random.default_rng(22)
    B, H, W, C, Co = 1, 4, 5, 3, 4
    x = jnp.array(rng.normal(size=(B, H, W, C)).astype(np.float32))
    m = jnp.array(rng.uniform(0, 1, size=(B, H, W, 9)).astype(np.float32))
    w = jnp.array((rng.normal(size=(3, 3, C, Co)) * 0.3).astype(np.float32))
    cot = jnp.array(rng.normal(size=(B, H, W, Co)).astype(np.float32))
    off0 = jnp.zeros((B, H, W, 9, 2), jnp.float32)
    offc = jnp.array(rng.choice([-1.0, 0.0, 1.0],
                                size=(B, H, W, 9, 2)).astype(np.float32))
    for off in (off0, offc):
        def loss(custom):
            return lambda *a: jnp.sum(
                dcn_v2_shift(*a, m, w, clamp=1.0, custom_vjp=custom) * cot)
        ga = jax.grad(loss(False), argnums=(0, 1))(x, off)
        gc = jax.grad(loss(True), argnums=(0, 1))(x, off)
        for name, a, c in zip(["x", "off"], ga, gc):
            np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                       rtol=1e-5, atol=1e-6, err_msg=name)
        # the tie gradient is the offset-learning signal at init: nonzero
        assert np.abs(np.asarray(gc[1])).sum() > 0
