"""End-to-end pipeline tests: train -> detect -> write -> evaluate,
plus the driver entry points."""

import os

import jax
import numpy as np
import pytest


def test_hill_climb_recovers_perturbed_pose(synthetic_kitti, tiny_conf):
    """Perturb the true (z, ry) of consistent 3D boxes; the hill climb must
    move them back toward projection consistency."""
    from m3dssd_tpu import geometry as geo
    from m3dssd_tpu.data.kitti import build_imdb
    from m3dssd_tpu.inference.hill_climb import hill_climb, _objective

    imdb = build_imdb(tiny_conf, synthetic_kitti, "train")
    imobj = next(o for o in imdb if len(o.gts) >= 1)
    p2, p2_inv = imobj.p2, imobj.p2_inv

    gts = imobj.gts
    cx = np.array([g.bbox_3d[0] for g in gts])
    cy = np.array([g.bbox_3d[1] for g in gts])
    z = np.array([g.bbox_3d[2] for g in gts])
    w3 = np.array([g.bbox_3d[3] for g in gts])
    h3 = np.array([g.bbox_3d[4] for g in gts])
    l3 = np.array([g.bbox_3d[5] for g in gts])
    ry = np.array([g.rotY for g in gts])
    box2d = np.stack([geo.xywh_to_xyxy(g.bbox_full) for g in gts])

    ry_pert = geo.snap_to_pi(ry + 0.4)
    ol0, _ = _objective(p2, p2_inv, box2d, cx, cy, z, w3, h3, l3, ry_pert)
    z2, ry2 = hill_climb(p2, p2_inv, box2d, cx, cy, z, w3, h3, l3, ry_pert,
                         step_r_init=0.3 * np.pi, r_lim=0.01)
    ol1, _ = _objective(p2, p2_inv, box2d, cx, cy, z2, w3, h3, l3, ry2)
    assert np.all(ol1 >= ol0 - 1e-9)
    assert ol1.mean() > ol0.mean()  # strictly better on average


def test_detector_and_driver_end_to_end(synthetic_kitti, tiny_conf, tmp_path):
    """Few train steps, then the full detect -> KITTI txt -> AP pipeline."""
    from m3dssd_tpu.data.kitti import Kitti3DDataset
    from m3dssd_tpu.data.loader import TrainLoader
    from m3dssd_tpu.inference.detect import make_detector
    from m3dssd_tpu.inference.test_driver import test_kitti_3d
    from m3dssd_tpu.models import build
    from m3dssd_tpu.train.state import create_train_state, make_train_step

    conf = tiny_conf.replace(anchors=None, score_thres=0.05)
    ds = Kitti3DDataset(conf, synthetic_kitti, phase="train")
    loader = TrainLoader(ds, batch_size=2, num_workers=2, seed=0)
    model = build(conf)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(conf, model, rng, max_iter=20)
    train_step = make_train_step(conf, ds.rois)
    batch = next(iter(loader.batches(1)))
    for i in range(3):
        state, stats = train_step(state, batch, jax.random.fold_in(rng, i))
    assert np.isfinite(float(stats["loss"]))

    val = Kitti3DDataset(conf, synthetic_kitti, phase="validation")
    detect = make_detector(conf, ds.rois, model)
    results = str(tmp_path / "results")
    gt_path = os.path.join(synthetic_kitti, "kitti_split1", "validation",
                           "label_2")
    res, sel = test_kitti_3d(val, detect, state.params, state.batch_stats,
                             conf, results, gt_path=gt_path)
    # pipeline integrity: one result file per val image, metrics computed
    import glob
    assert len(glob.glob(os.path.join(results, "*.txt"))) == len(val)
    assert res is not None and "Car_3d_R40" in res
    assert 0.0 <= sel <= 100.0


def test_checkpoint_roundtrip(tiny_conf, tmp_path):
    from m3dssd_tpu.models import build
    from m3dssd_tpu.train.state import create_train_state
    from m3dssd_tpu.utils.checkpoint import (latest_step, restore_checkpoint,
                                             save_checkpoint)
    from m3dssd_tpu.utils.synthetic_conf import finalize_conf_synthetic

    conf = finalize_conf_synthetic(tiny_conf.replace(anchors=None))
    model = build(conf)
    state = create_train_state(conf, model, jax.random.PRNGKey(0), max_iter=10)
    ckpt = str(tmp_path / "weights")
    save_checkpoint(ckpt, state, 7)
    assert latest_step(ckpt) == 7

    # perturb then restore
    import jax.numpy as jnp
    perturbed = state.replace(
        params=jax.tree_util.tree_map(lambda x: x + 1.0, state.params))
    restored = restore_checkpoint(ckpt, perturbed)
    a = jax.tree_util.tree_leaves(restored.params)
    b = jax.tree_util.tree_leaves(state.params)
    assert all(np.allclose(x, y) for x, y in zip(a, b))

    # async save (trainer path): returns after the D2H snapshot, the file
    # write lands in the background; after wait_for_saves the checkpoint
    # restores bit-identically even if the live state mutated meanwhile
    from m3dssd_tpu.utils.checkpoint import wait_for_saves
    ckpt2 = str(tmp_path / "weights_async")
    save_checkpoint(ckpt2, state, 9, async_save=True)
    state_mut = state.replace(
        params=jax.tree_util.tree_map(lambda x: x * 0.0, state.params))
    wait_for_saves()
    assert latest_step(ckpt2) == 9
    restored2 = restore_checkpoint(ckpt2, state_mut)
    a2 = jax.tree_util.tree_leaves(restored2.params)
    assert all(np.allclose(x, y) for x, y in zip(a2, b))


def test_graft_entry_single_chip():
    import __graft_entry__ as ge
    import jax

    fn, args = ge.entry()
    jitted = jax.jit(fn)
    out = jitted(*args)
    assert all(np.isfinite(np.asarray(o)).all() for o in out)


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_batched_driver_matches_single(synthetic_kitti, tiny_conf, tmp_path):
    """test_kitti_3d with batch_size>1 (padded tail, threaded prefetch,
    double-buffered dispatch) must write byte-identical result txts to the
    bs=1 path."""
    import jax.numpy as jnp
    from m3dssd_tpu.data.kitti import Kitti3DDataset
    from m3dssd_tpu.inference.detect import make_batch_detector, make_detector
    from m3dssd_tpu.inference.test_driver import test_kitti_3d
    from m3dssd_tpu.models import build

    conf = tiny_conf.replace(anchors=None, score_thres=0.05)
    ds = Kitti3DDataset(conf, synthetic_kitti, phase="train")
    val = Kitti3DDataset(conf, synthetic_kitti, phase="validation")
    model = build(conf)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 64, 128, 3), jnp.float32), train=False)
    p, bs = v["params"], v.get("batch_stats", {})

    res1 = str(tmp_path / "res1")
    resB = str(tmp_path / "resB")
    test_kitti_3d(val, make_detector(conf, ds.rois, model), p, bs, conf,
                  res1, evaluate=False)
    # batch 3 over 4 val images exercises the padded tail
    test_kitti_3d(val, make_batch_detector(conf, ds.rois, model), p, bs,
                  conf, resB, evaluate=False, batch_size=3)

    import glob
    files1 = sorted(glob.glob(os.path.join(res1, "*.txt")))
    filesB = sorted(glob.glob(os.path.join(resB, "*.txt")))
    assert [os.path.basename(f) for f in files1] == \
        [os.path.basename(f) for f in filesB] and files1
    for f1, fB in zip(files1, filesB):
        assert open(f1).read() == open(fB).read(), os.path.basename(f1)


def test_batch_detector_matches_single(synthetic_kitti, tiny_conf):
    """The batched detector must produce the same detections as the bs=1
    detector for each image."""
    import jax.numpy as jnp
    from m3dssd_tpu.data.kitti import Kitti3DDataset
    from m3dssd_tpu.inference.detect import make_batch_detector, make_detector
    from m3dssd_tpu.models import build

    # low score_thres -> the sparse pre-NMS budget overflows -> dense path;
    # keeps the full-table comparison non-vacuous (random-init scores never
    # clear the 0.75 default)
    conf = tiny_conf.replace(anchors=None, score_thres=0.05)
    ds = Kitti3DDataset(conf, synthetic_kitti, phase="train")
    val = Kitti3DDataset(conf, synthetic_kitti, phase="validation")
    model = build(conf)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 64, 128, 3), jnp.float32), train=False)
    p, bs = v["params"], v.get("batch_stats", {})

    d1 = make_detector(conf, ds.rois, model)
    dB = make_batch_detector(conf, ds.rois, model)

    imgs = np.stack([val[i]["input"] for i in range(2)], axis=0)
    sfs = np.ones(2, np.float32)
    batch_out = np.asarray(dB(p, bs, imgs, jnp.array(sfs)))
    for i in range(2):
        single = np.asarray(d1(p, bs, imgs[i:i + 1], np.float32(1.0)))
        np.testing.assert_allclose(batch_out[i], single, rtol=1e-4, atol=1e-3)


def test_packed_driver_matches_raw(synthetic_kitti, tiny_conf, tmp_path):
    """test_kitti_3d with host-packed input (packed_input=True) writes
    byte-identical result txts to the raw-image path."""
    import glob
    import jax.numpy as jnp
    from m3dssd_tpu.data.kitti import Kitti3DDataset
    from m3dssd_tpu.inference.detect import (make_batch_detector,
                                             make_detector,
                                             packed_input_eligible)
    from m3dssd_tpu.inference.test_driver import test_kitti_3d
    from m3dssd_tpu.models import build

    conf = tiny_conf.replace(anchors=None, score_thres=0.05)
    assert packed_input_eligible(conf)
    ds = Kitti3DDataset(conf, synthetic_kitti, phase="train")
    val = Kitti3DDataset(conf, synthetic_kitti, phase="validation")
    model = build(conf)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 64, 128, 3), jnp.float32), train=False)
    p, bs = v["params"], v.get("batch_stats", {})

    res_raw = str(tmp_path / "raw")
    res_pk = str(tmp_path / "pk")
    test_kitti_3d(val, make_detector(conf, ds.rois, model), p, bs, conf,
                  res_raw, evaluate=False)
    test_kitti_3d(val, make_batch_detector(conf, ds.rois, model,
                                           packed_input=True),
                  p, bs, conf, res_pk, evaluate=False, batch_size=2,
                  packed_input=True)

    files1 = sorted(glob.glob(os.path.join(res_raw, "*.txt")))
    files2 = sorted(glob.glob(os.path.join(res_pk, "*.txt")))
    assert [os.path.basename(f) for f in files1] == \
        [os.path.basename(f) for f in files2] and files1
    for f1, f2 in zip(files1, files2):
        assert open(f1).read() == open(f2).read(), os.path.basename(f1)


def test_clip_boxes_clamps_post_nms(synthetic_kitti, tiny_conf):
    """conf.clip_boxes clamps final 2D boxes to the original image bounds
    AFTER NMS (ref:lib/rpn_util.py:1556-1561): the clipped detector's output
    equals a manual clip of the unclipped one — same rows, same suppression."""
    import jax.numpy as jnp
    from m3dssd_tpu.data.kitti import Kitti3DDataset
    from m3dssd_tpu.inference.detect import make_batch_detector, make_detector
    from m3dssd_tpu.models import build

    # score_thres=0.05: overflow the sparse pre-NMS budget -> dense path
    conf = tiny_conf.replace(anchors=None, score_thres=0.05)
    ds = Kitti3DDataset(conf, synthetic_kitti, phase="train")
    val = Kitti3DDataset(conf, synthetic_kitti, phase="validation")
    model = build(conf)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 64, 128, 3), jnp.float32), train=False)
    p, bs = v["params"], v.get("batch_stats", {})

    conf_clip = conf.replace(clip_boxes=True)
    im = val[0]["input"][None]
    sf = np.float32(0.5)     # original image = 2x the network input
    raw = np.asarray(make_detector(conf, ds.rois, model)(p, bs, im, sf))
    clip = np.asarray(make_detector(conf_clip, ds.rois, model)(p, bs, im, sf))

    im_h = conf.test_scale[0] / sf - 1
    im_w = conf.test_scale[1] / sf - 1
    want = raw.copy()
    want[:, 0] = np.clip(want[:, 0], 0, im_w)
    want[:, 1] = np.clip(want[:, 1], 0, im_h)
    want[:, 2] = np.clip(want[:, 2], 0, im_w)
    want[:, 3] = np.clip(want[:, 3], 0, im_h)
    np.testing.assert_allclose(clip, want, rtol=1e-5, atol=1e-4)
    # the knob actually did something: at least one box was out of bounds
    assert not np.allclose(clip[:, :4], raw[:, :4])
    assert (clip[:, 0] >= 0).all() and (clip[:, 2] <= im_w + 1e-4).all()

    # batched detector applies the same clip
    clipB = np.asarray(make_batch_detector(conf_clip, ds.rois, model)(
        p, bs, im, jnp.array([sf])))[0]
    np.testing.assert_allclose(clipB, clip, rtol=1e-4, atol=1e-3)


def test_bf16_upload_identical_to_f32(synthetic_kitti, tiny_conf):
    """Pre-casting eval images to bf16 host-side (the eval driver does this
    for bf16 models to halve upload bytes) gives identical detections: the
    model's first op casts its input to bf16 anyway."""
    import ml_dtypes
    import jax.numpy as jnp
    from m3dssd_tpu.data.kitti import Kitti3DDataset
    from m3dssd_tpu.inference.detect import make_detector
    from m3dssd_tpu.models import build

    # score_thres=0.05: overflow the sparse pre-NMS budget -> dense path
    conf = tiny_conf.replace(anchors=None, compute_dtype="bfloat16",
                             score_thres=0.05)
    ds = Kitti3DDataset(conf, synthetic_kitti, phase="train")
    val = Kitti3DDataset(conf, synthetic_kitti, phase="validation")
    model = build(conf)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 64, 128, 3), jnp.float32), train=False)
    p, bs = v["params"], v.get("batch_stats", {})
    det = make_detector(conf, ds.rois, model)
    im = val[0]["input"][None]
    out_f32 = np.asarray(det(p, bs, im, np.float32(1.0)))
    out_bf16 = np.asarray(det(p, bs, im.astype(ml_dtypes.bfloat16),
                              np.float32(1.0)))
    np.testing.assert_array_equal(out_f32, out_bf16)


def test_mesh_batch_detector_matches_unsharded(synthetic_kitti, tiny_conf):
    """Multi-chip inference: make_batch_detector(mesh=...) must produce the
    same detections as the unsharded batch detector — on a 1-D data mesh
    (pure batch sharding) and on a 2-D data x spatial mesh (image height
    sharded; XLA inserts the conv halo exchanges)."""
    import jax.numpy as jnp
    from m3dssd_tpu.data.kitti import Kitti3DDataset
    from m3dssd_tpu.inference.detect import make_batch_detector
    from m3dssd_tpu.models import build
    from m3dssd_tpu.parallel import make_mesh

    # score_thres=0.05: overflow the sparse pre-NMS budget -> dense path
    conf = tiny_conf.replace(anchors=None, score_thres=0.05)
    ds = Kitti3DDataset(conf, synthetic_kitti, phase="train")
    val = Kitti3DDataset(conf, synthetic_kitti, phase="validation")
    model = build(conf)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 64, 128, 3), jnp.float32), train=False)
    p, bs = v["params"], v.get("batch_stats", {})

    imgs = np.stack([val[i % len(val)]["input"] for i in range(4)], axis=0)
    sfs = np.ones(4, np.float32)
    ref = np.asarray(make_batch_detector(conf, ds.rois, model)(
        p, bs, imgs, jnp.asarray(sfs)))

    for spatial in (1, 2):
        mesh = make_mesh(4 * spatial, spatial=spatial)
        det = make_batch_detector(conf, ds.rois, model, mesh=mesh)
        assert det.input_sharding is not None
        out = np.asarray(det(p, bs, imgs, sfs))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3,
                                   err_msg=f"spatial={spatial}")

    # tensor-parallel: wide params channel-sharded over 'model', detector
    # follows their placement (no per-call all-gather of the weights)
    from m3dssd_tpu.parallel import replicate_state
    mesh_tp = make_mesh(8, model=2)
    p_tp = replicate_state(mesh_tp, p, min_model_dim=32)
    bs_tp = replicate_state(mesh_tp, bs, min_model_dim=32)
    assert any("model" in str(x.sharding.spec)
               for x in jax.tree_util.tree_leaves(p_tp))
    det = make_batch_detector(conf, ds.rois, model, mesh=mesh_tp,
                              follow_params_sharding=True)
    out = np.asarray(det(p_tp, bs_tp, imgs, sfs))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3,
                               err_msg="model=2")


def test_mesh_batched_driver_writes_identical_txts(synthetic_kitti,
                                                   tiny_conf, tmp_path):
    """The batched eval driver with a mesh-sharded detector (multi-chip
    eval) writes byte-identical KITTI result txts to the unsharded one."""
    import glob
    import jax.numpy as jnp
    from m3dssd_tpu.data.kitti import Kitti3DDataset
    from m3dssd_tpu.inference.detect import make_batch_detector
    from m3dssd_tpu.inference.test_driver import test_kitti_3d
    from m3dssd_tpu.models import build
    from m3dssd_tpu.parallel import make_mesh

    conf = tiny_conf.replace(anchors=None, score_thres=0.05)
    ds = Kitti3DDataset(conf, synthetic_kitti, phase="train")
    val = Kitti3DDataset(conf, synthetic_kitti, phase="validation")
    model = build(conf)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 64, 128, 3), jnp.float32), train=False)
    p, bs = v["params"], v.get("batch_stats", {})

    res_plain = str(tmp_path / "plain")
    res_mesh = str(tmp_path / "mesh")
    test_kitti_3d(val, make_batch_detector(conf, ds.rois, model), p, bs,
                  conf, res_plain, evaluate=False, batch_size=2)
    mesh = make_mesh(2)
    test_kitti_3d(val, make_batch_detector(conf, ds.rois, model, mesh=mesh),
                  p, bs, conf, res_mesh, evaluate=False, batch_size=2)

    files1 = sorted(glob.glob(os.path.join(res_plain, "*.txt")))
    files2 = sorted(glob.glob(os.path.join(res_mesh, "*.txt")))
    assert [os.path.basename(f) for f in files1] == \
        [os.path.basename(f) for f in files2] and files1
    for f1, f2 in zip(files1, files2):
        assert open(f1).read() == open(f2).read(), os.path.basename(f1)
