"""Sparse pre-NMS compaction (inference/detect.py:_compact_above).

Contract: every detection the framework emits (rows with score >=
conf.score_thres — the test driver's filter) is EXACTLY the same with
compaction on or off; greedy NMS suppression only flows from higher- to
lower-scored boxes, so dropping sub-threshold candidates cannot change the
surviving above-threshold set. Overflow (> M candidates) falls back to the
dense path via lax.cond.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_compact_above_selects_passing_indices():
    from m3dssd_tpu.inference.detect import _compact_above

    scores = jnp.asarray([0.1, 0.9, 0.3, 0.8, 0.05, 0.8])
    idx, ok = _compact_above(scores, 0.3, 4)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(idx), [1, 2, 3, 5])

    idx, ok = _compact_above(scores, 0.3, 8)       # budget > count: sentinel
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(idx), [1, 2, 3, 5, 6, 6, 6, 6])

    _, ok = _compact_above(scores, 0.01, 4)        # overflow
    assert not bool(ok)


def _setup(synthetic_kitti, tiny_conf, **over):
    from m3dssd_tpu.data.kitti import Kitti3DDataset
    from m3dssd_tpu.models import build

    conf = tiny_conf.replace(anchors=None, **over)
    ds = Kitti3DDataset(conf, synthetic_kitti, phase="train")
    val = Kitti3DDataset(conf, synthetic_kitti, phase="validation")
    model = build(conf)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 64, 128, 3), jnp.float32), train=False)
    return conf, ds, val, model, v["params"], v.get("batch_stats", {})


def _kept(dets, thresh):
    """Rows the framework keeps (postprocess_dets filter)."""
    dets = np.asarray(dets)
    return dets[dets[:, 4] >= thresh]


@pytest.mark.parametrize("batched", [False, True])
def test_sparse_nms_matches_dense_kept_rows(synthetic_kitti, tiny_conf,
                                            batched):
    """With a threshold only a few positions clear, the sparse path is
    active and all kept rows match the dense detector exactly; kept rows
    form a prefix (greedy NMS emits in descending score)."""
    from m3dssd_tpu.inference.detect import make_batch_detector, make_detector

    conf0, ds, val, model, p, bs = _setup(synthetic_kitti, tiny_conf)
    imgs = np.stack([val[i % len(val)]["input"] for i in range(2)], axis=0)
    sfs = np.ones(2, np.float32)

    # pick a threshold that ~30 anchors of THIS random init clear; the
    # position budget (nms_sparse_topm // A, floor 16) must cover the
    # <=30 positions those anchors occupy so the sparse branch runs
    out = model.apply({"params": p, "batch_stats": bs},
                      jnp.asarray(imgs), train=False)
    scores = np.asarray(out["scores"])
    thresh = float(np.quantile(scores, 1.0 - 30.0 / scores[0].size))
    A = ds.rois[:, 4].astype(int).max() + 1
    n_pos = int((scores.reshape(2, -1, A) >= thresh).any(-1).sum(1).max())
    assert 0 < n_pos < 2048 // A + 16

    dense_conf = conf0.replace(nms_sparse_topm=0, score_thres=thresh)
    sparse_conf = conf0.replace(nms_sparse_topm=2048, score_thres=thresh)
    if batched:
        d_dense = make_batch_detector(dense_conf, ds.rois, model)
        d_sparse = make_batch_detector(sparse_conf, ds.rois, model)
        out_d = np.asarray(d_dense(p, bs, imgs, jnp.asarray(sfs)))
        out_s = np.asarray(d_sparse(p, bs, imgs, jnp.asarray(sfs)))
        for b in range(2):
            kd, ks = _kept(out_d[b], thresh), _kept(out_s[b], thresh)
            assert kd.shape == ks.shape and kd.shape[0] > 0
            np.testing.assert_allclose(ks, kd, rtol=1e-5, atol=1e-5)
    else:
        d_dense = make_detector(dense_conf, ds.rois, model)
        d_sparse = make_detector(sparse_conf, ds.rois, model)
        for b in range(2):
            out_d = np.asarray(d_dense(p, bs, imgs[b:b + 1], np.float32(1.0)))
            out_s = np.asarray(d_sparse(p, bs, imgs[b:b + 1], np.float32(1.0)))
            kd, ks = _kept(out_d, thresh), _kept(out_s, thresh)
            assert kd.shape == ks.shape and kd.shape[0] > 0
            np.testing.assert_allclose(ks, kd, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("batched", [False, True])
def test_sparse_nms_overflow_falls_back_dense(synthetic_kitti, tiny_conf,
                                              batched):
    """When more than M candidates clear the threshold, the cond takes the
    dense branch: output EXACTLY equals the dense detector's (all rows)."""
    from m3dssd_tpu.inference.detect import make_batch_detector, make_detector

    conf0, ds, val, model, p, bs = _setup(synthetic_kitti, tiny_conf)
    im = val[0]["input"][None]
    # score_thres low enough that (almost) every anchor passes; M tiny
    dense_conf = conf0.replace(nms_sparse_topm=0, score_thres=0.01)
    sparse_conf = conf0.replace(nms_sparse_topm=8, score_thres=0.01)
    if batched:
        out_d = np.asarray(make_batch_detector(dense_conf, ds.rois, model)(
            p, bs, im, jnp.ones(1, jnp.float32)))
        out_s = np.asarray(make_batch_detector(sparse_conf, ds.rois, model)(
            p, bs, im, jnp.ones(1, jnp.float32)))
    else:
        out_d = np.asarray(make_detector(dense_conf, ds.rois, model)(
            p, bs, im, np.float32(1.0)))
        out_s = np.asarray(make_detector(sparse_conf, ds.rois, model)(
            p, bs, im, np.float32(1.0)))
    np.testing.assert_array_equal(out_s, out_d)


def test_sparse_nms_driver_txts_identical(synthetic_kitti, tiny_conf,
                                          tmp_path):
    """End-to-end: the eval driver writes byte-identical KITTI result txts
    with compaction on (sparse regime) and off."""
    import glob
    import os
    from m3dssd_tpu.inference.detect import make_batch_detector
    from m3dssd_tpu.inference.test_driver import test_kitti_3d

    conf0, ds, val, model, p, bs = _setup(synthetic_kitti, tiny_conf)
    imgs = np.stack([val[i]["input"] for i in range(len(val))], axis=0)
    out = model.apply({"params": p, "batch_stats": bs},
                      jnp.asarray(imgs), train=False)
    scores = np.asarray(out["scores"])
    thresh = float(np.quantile(scores, 1.0 - 30.0 / scores[0].size))

    res = {}
    for name, m in [("dense", 0), ("sparse", 2048)]:
        conf = conf0.replace(nms_sparse_topm=m, score_thres=thresh)
        path = str(tmp_path / name)
        test_kitti_3d(val, make_batch_detector(conf, ds.rois, model), p, bs,
                      conf, path, evaluate=False, batch_size=2)
        res[name] = sorted(glob.glob(os.path.join(path, "*.txt")))

    assert [os.path.basename(f) for f in res["dense"]] == \
        [os.path.basename(f) for f in res["sparse"]] and res["dense"]
    nonempty = 0
    for f1, f2 in zip(res["dense"], res["sparse"]):
        t1, t2 = open(f1).read(), open(f2).read()
        assert t1 == t2, os.path.basename(f1)
        nonempty += bool(t1.strip())
    assert nonempty > 0
