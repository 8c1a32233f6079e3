"""ImageNet-DLA bootstrap (scripts/fetch_pretrained.py).

Parity target: ref:model/pose_dla_dcn.py:27-28,399-415 — the reference
downloads ImageNet DLA trunk weights and fine-tunes from them (strict=False:
the fc classifier head is dropped, detector heads stay at init).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from m3dssd_tpu.config import load_config
from m3dssd_tpu.models import build
from m3dssd_tpu.utils.synthetic_conf import finalize_conf_synthetic
from m3dssd_tpu.utils.torch_import import flax_to_torch_key


def _synth_imagenet_dla34(tmp_path):
    """torch.save a synthetic ImageNet-DLA34 state_dict with the upstream
    key names (trunk-only namespace + an fc head), returning
    (path, {full-model torch key -> expected converted numpy})."""
    import torch

    import jax.tree_util as jtu
    conf = finalize_conf_synthetic(load_config("kitti_3d_base").replace(
        back_bone="dla34", crop_size=[64, 128], test_scale=[64, 128],
        num_anchor_scales=2, pre_train=False))
    model = build(conf)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)),
                   train=False)
    A, C = conf.anchors.shape[0], conf.num_classes
    rng = np.random.default_rng(7)
    sd, expected, expected_params = {}, {}, set()
    for coll in ["params", "batch_stats"]:
        for path, val in jtu.tree_flatten_with_path(v[coll])[0]:
            parts = tuple(str(k.key) for k in path)
            if parts[:2] != ("base", "base"):
                continue                       # trunk only
            key, conv = flax_to_torch_key(parts[:-1], parts[-1],
                                          num_anchors=A, num_classes=C)
            assert key.startswith("base.base.")
            shape = np.asarray(val).shape
            if parts[-1] in ("kernel", "weight") and len(shape) == 4:
                kh, kw, i, o = shape
                t = rng.normal(size=(o, i, kh, kw)).astype(np.float32)
            else:
                t = rng.normal(size=shape).astype(np.float32)
            sd[key[len("base.base."):]] = torch.from_numpy(t)
            expected["/".join(parts)] = np.asarray(conv(t))
            if coll == "params":
                expected_params.add("/".join(parts))
    sd["fc.weight"] = torch.zeros(1000, 512)   # ImageNet classifier head
    sd["fc.bias"] = torch.zeros(1000)
    path = str(tmp_path / "dla34-ba72cf86.pth")
    torch.save(sd, path)
    return path, expected, conf, expected_params


def test_fetch_pretrained_seed_roundtrip(tmp_path):
    import fetch_pretrained

    dla_file, expected, conf, _ = _synth_imagenet_dla34(tmp_path)
    out = str(tmp_path / "seed_ckpt")
    stats = fetch_pretrained.convert(dla_file, out, backbone="dla34")
    assert stats["loaded"] == len(expected)
    assert not stats["shape_mismatch"]
    assert os.path.isdir(os.path.join(out, "seed"))

    # restore into a fresh state: trunk leaves match the converted torch
    # values, head/neck leaves keep their init values
    from m3dssd_tpu.utils.checkpoint import is_seed_checkpoint, restore_seed
    assert is_seed_checkpoint(out)
    import jax.tree_util as jtu
    model = build(conf)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)),
                   train=False)
    params, batch_stats = restore_seed(out, v["params"], v["batch_stats"])
    n_trunk = n_other = 0
    for coll, tree in [("params", params), ("batch_stats", batch_stats)]:
        for path, val in jtu.tree_flatten_with_path(tree)[0]:
            parts = "/".join(str(k.key) for k in path)
            if parts in expected:
                np.testing.assert_allclose(np.asarray(val), expected[parts],
                                           rtol=1e-6, err_msg=parts)
                n_trunk += 1
            else:
                n_other += 1
    assert n_trunk == len(expected) and n_other > 0


def test_trainer_accepts_seed_dir(tmp_path, synthetic_kitti, tiny_conf):
    """conf.pretrained pointing at a seed dir loads trunk weights into the
    Trainer state without touching optimizer state."""
    import fetch_pretrained

    dla_file, expected, _, expected_params = _synth_imagenet_dla34(tmp_path)
    out = str(tmp_path / "seed_ckpt")
    fetch_pretrained.convert(dla_file, out, backbone="dla34")

    from m3dssd_tpu.train.trainer import Trainer
    conf = tiny_conf.replace(pretrained=out, max_epoch=1, do_test=False)
    tr = Trainer(conf, synthetic_kitti, str(tmp_path / "run"),
                 use_mesh=False)
    import jax.tree_util as jtu
    hit = 0
    for path, val in jtu.tree_flatten_with_path(tr.state.params)[0]:
        parts = "/".join(str(k.key) for k in path)
        if parts in expected:
            np.testing.assert_allclose(np.asarray(val), expected[parts],
                                       rtol=1e-6, err_msg=parts)
            hit += 1
    assert hit == len(expected_params) > 0
    assert int(tr.state.step) == 0
