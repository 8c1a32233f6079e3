"""Torch checkpoint import: mapping totality + numerical round trip.

Strategy: build the flax model, synthesize a torch-style state_dict by
*inverting* the converters from the flax leaves, import it, and check the
loaded tree equals the synthesized values — validating name translation,
layout transposes, and the channel permutations in both directions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3dssd_tpu.config import kitti_3d_anab_fullalign
from m3dssd_tpu.models import build
from m3dssd_tpu.utils.synthetic_conf import finalize_conf_synthetic
from m3dssd_tpu.utils.torch_import import (flax_to_torch_key,
                                           load_reference_checkpoint)


@pytest.fixture(scope="module")
def model_and_vars():
    conf = finalize_conf_synthetic(kitti_3d_anab_fullalign().replace(
        crop_size=[64, 128], test_scale=[64, 128], num_anchor_scales=2,
        back_bone="dla34", pre_train=False, compute_dtype="float32"))
    model = build(conf)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)),
                   train=False)
    return conf, model, v


def _torch_shape(parts, leaf, flax_shape):
    """Expected torch tensor shape for a given flax leaf."""
    if leaf in ("kernel", "weight") and len(flax_shape) == 4:
        kh, kw, i, o = flax_shape
        return (o, i, kh, kw)
    return tuple(flax_shape)


def test_mapping_total_and_injective(model_and_vars):
    conf, model, v = model_and_vars
    A, C = conf.anchors.shape[0], conf.num_classes
    import jax.tree_util as jtu

    seen = {}
    unmapped = []
    for path, val in jtu.tree_flatten_with_path(v["params"])[0]:
        parts = tuple(str(k.key) for k in path)
        try:
            key, _ = flax_to_torch_key(parts[:-1], parts[-1],
                                       num_anchors=A, num_classes=C)
        except Exception:
            unmapped.append("/".join(parts))
            continue
        assert key not in seen, f"duplicate torch key {key} for " \
            f"{'/'.join(parts)} and {seen[key]}"
        seen[key] = "/".join(parts)
    # every parameter must be mapped
    assert not unmapped, unmapped
    # batch_stats too
    for path, val in jtu.tree_flatten_with_path(v["batch_stats"])[0]:
        parts = tuple(str(k.key) for k in path)
        key, _ = flax_to_torch_key(parts[:-1], parts[-1],
                                   num_anchors=A, num_classes=C)


def test_import_roundtrip_values(model_and_vars):
    """Synthesize torch tensors whose converted values are known, import,
    and verify every leaf changed to the expected value."""
    conf, model, v = model_and_vars
    A, C = conf.anchors.shape[0], conf.num_classes
    import jax.tree_util as jtu

    rng = np.random.default_rng(0)
    sd = {}
    expected = {}

    for coll in ["params", "batch_stats"]:
        for path, val in jtu.tree_flatten_with_path(v[coll])[0]:
            parts = tuple(str(k.key) for k in path)
            key, conv = flax_to_torch_key(parts[:-1], parts[-1],
                                          num_anchors=A, num_classes=C)
            tshape = _torch_shape(parts, parts[-1], np.asarray(val).shape)
            t = rng.normal(size=tshape).astype(np.float32)
            sd[key] = t
            expected["/".join(parts)] = np.asarray(conv(t))

    params, batch_stats, stats = load_reference_checkpoint(
        v, sd, num_anchors=A, num_classes=C, block="basic")
    assert stats["loaded"] > 100
    assert not stats["unmapped"], stats["unmapped"][:5]
    assert not stats["shape_mismatch"], stats["shape_mismatch"][:5]

    for tree, coll in [(params, "params"), (batch_stats, "batch_stats")]:
        for path, val in jtu.tree_flatten_with_path(tree)[0]:
            parts = "/".join(str(k.key) for k in path)
            np.testing.assert_allclose(np.asarray(val), expected[parts],
                                       rtol=1e-6, err_msg=parts)


def test_pin_parity_conf():
    """Checkpoints with learned DCN offsets must force the gather path
    (dcn_shift_clamp=None); trunk-only checkpoints keep the fast shift path."""
    from m3dssd_tpu.utils.torch_import import pin_parity_conf

    conf = kitti_3d_anab_fullalign()
    assert conf.dcn_shift_clamp is not None  # fast path is the default
    sd_ref = {"base.dla_up.ida_0.proj_1.conv.conv_offset_mask.weight":
              np.zeros((27, 8, 3, 3), np.float32)}
    sd_trunk = {"base.base.base_layer.0.weight":
                np.zeros((16, 3, 7, 7), np.float32)}
    assert pin_parity_conf(conf, sd_ref).dcn_shift_clamp is None
    assert pin_parity_conf(conf, sd_trunk).dcn_shift_clamp == \
        conf.dcn_shift_clamp
    # already-pinned conf stays pinned
    pinned = conf.replace(dcn_shift_clamp=None)
    assert pin_parity_conf(pinned, sd_ref).dcn_shift_clamp is None


def test_trainer_pins_parity_on_torch_import(synthetic_kitti, tiny_conf,
                                             tmp_path):
    """An imported reference-format checkpoint (learned DCN offsets) must
    never run through dcn_v2_shift: the Trainer auto-pins the conf before
    building the model, and persists the pinned conf with the run."""
    import torch

    from m3dssd_tpu.config import Config
    from m3dssd_tpu.train.trainer import Trainer

    pth = tmp_path / "ref_ckpt.pth"
    torch.save({"base.dla_up.ida_0.proj_1.conv.conv_offset_mask.weight":
                torch.zeros((27, 8, 3, 3))}, str(pth))

    conf = tiny_conf.replace(pretrained=str(pth))
    assert conf.dcn_shift_clamp is not None
    out = tmp_path / "run"
    tr = Trainer(conf, synthetic_kitti, str(out), use_mesh=False)
    assert tr.conf.dcn_shift_clamp is None
    assert tr.model.dcn_shift_clamp is None
    # the conf persisted with the run must be the pinned one, so
    # scripts/test.py rebuilds the same (gather-path) graph
    saved = Config.load(str(out / "conf.pkl"))
    assert saved.dcn_shift_clamp is None


def test_import_model_still_runs(model_and_vars):
    conf, model, v = model_and_vars
    A, C = conf.anchors.shape[0], conf.num_classes
    import jax.tree_util as jtu
    rng = np.random.default_rng(1)
    sd = {}
    for coll in ["params", "batch_stats"]:
        for path, val in jtu.tree_flatten_with_path(v[coll])[0]:
            parts = tuple(str(k.key) for k in path)
            key, conv = flax_to_torch_key(parts[:-1], parts[-1],
                                          num_anchors=A, num_classes=C)
            tshape = _torch_shape(parts, parts[-1], np.asarray(val).shape)
            sd[key] = (rng.normal(size=tshape) * 0.05).astype(np.float32)
    # make BN variances positive
    for k in sd:
        if k.endswith("running_var"):
            sd[k] = np.abs(sd[k]) + 0.5

    params, batch_stats, _ = load_reference_checkpoint(
        v, sd, num_anchors=A, num_classes=C)
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      jnp.zeros((1, 64, 128, 3)), train=False)
    assert np.isfinite(np.asarray(out["prob"])).all()


def test_real_torch_file_roundtrip(model_and_vars, tmp_path):
    """The REAL serialization path: torch.save a reference-named state_dict
    (zip format, torch tensors incl. a non-contiguous storage view), load it
    through load_torch_file -> load_reference_checkpoint, and verify the
    loaded tree equals the in-memory import (ref:lib/core.py:477-511
    partial-load semantics operate on torch-deserialized files)."""
    import torch

    conf, model, v = model_and_vars
    A, C = conf.anchors.shape[0], conf.num_classes
    import jax.tree_util as jtu

    rng = np.random.default_rng(3)
    sd = {}
    for coll in ["params", "batch_stats"]:
        for path, val in jtu.tree_flatten_with_path(v[coll])[0]:
            parts = tuple(str(k.key) for k in path)
            key, conv = flax_to_torch_key(parts[:-1], parts[-1],
                                          num_anchors=A, num_classes=C)
            tshape = _torch_shape(parts, parts[-1], np.asarray(val).shape)
            t = rng.normal(size=tshape).astype(np.float32)
            sd[key] = torch.from_numpy(t)
    # make one tensor a non-contiguous view: torch.save keeps storage views
    k0 = sorted(k for k in sd if sd[k].ndim == 4)[0]
    sd[k0] = torch.from_numpy(
        np.ascontiguousarray(np.moveaxis(sd[k0].numpy(), 0, -1))) \
        .permute(3, 0, 1, 2)
    assert not sd[k0].is_contiguous()

    path = str(tmp_path / "ref_ckpt.pth")
    torch.save({"state_dict": sd}, path)    # the reference wraps in a dict

    from m3dssd_tpu.utils.torch_import import load_torch_file
    loaded_sd = load_torch_file(path)
    assert set(loaded_sd) == set(sd)
    params_f, bstats_f, stats_f = load_reference_checkpoint(
        v, loaded_sd, num_anchors=A, num_classes=C, block="basic")
    params_m, bstats_m, stats_m = load_reference_checkpoint(
        v, {k: t.numpy() for k, t in sd.items()},
        num_anchors=A, num_classes=C, block="basic")
    assert stats_f["loaded"] == stats_m["loaded"] > 100
    assert not stats_f["unmapped"] and not stats_f["shape_mismatch"]
    for a, b in zip(jtu.tree_leaves((params_f, bstats_f)),
                    jtu.tree_leaves((params_m, bstats_m))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_real_torch_file_pins_parity(model_and_vars, tmp_path):
    """dcn_shift_clamp=None pinning works through the real file path: a
    saved checkpoint with nonzero learned DCN offsets forces the exact
    gather-path DCN when loaded by file (utils/torch_import.pin_parity_conf)."""
    import torch

    conf, model, v = model_and_vars
    A, C = conf.anchors.shape[0], conf.num_classes
    import jax.tree_util as jtu
    sd = {}
    for coll in ["params", "batch_stats"]:
        for path, val in jtu.tree_flatten_with_path(v[coll])[0]:
            parts = tuple(str(k.key) for k in path)
            key, _ = flax_to_torch_key(parts[:-1], parts[-1],
                                       num_anchors=A, num_classes=C)
            tshape = _torch_shape(parts, parts[-1], np.asarray(val).shape)
            sd[key] = torch.ones(tshape)     # nonzero offset conv weights
    path = str(tmp_path / "ref_offsets.pth")
    torch.save(sd, path)                     # bare state_dict form

    from m3dssd_tpu.utils.torch_import import (load_torch_file,
                                               pin_parity_conf)
    loaded = load_torch_file(path)
    pinned = pin_parity_conf(conf.replace(dcn_shift_clamp=1.0), loaded)
    assert pinned.dcn_shift_clamp is None
