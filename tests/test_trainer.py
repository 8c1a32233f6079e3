"""Trainer-level semantics: resume cadence, freeze-BN, run-dir layout."""

import os

import jax
import numpy as np


def _mk_trainer(synthetic_kitti, tiny_conf, out, timestamped=False, **over):
    from m3dssd_tpu.train.trainer import Trainer
    conf = tiny_conf.replace(
        anchors=None, snapshot_epoch=1, eval_epoch=2, do_test=True,
        display_iter=2, max_epoch=4, **over)
    return Trainer(conf, synthetic_kitti, str(out), use_mesh=False,
                   timestamped=timestamped)


def test_resume_epoch_cadence(synthetic_kitti, tiny_conf, tmp_path):
    """After --restore, training continues at the restored epoch: the epoch
    numbering and the eval/snapshot cadence pick up where they left off
    (ref:scripts/train_rpn_3d.py:148-151, ref:lib/core.py:803-812) instead
    of restarting at epoch 0."""
    from m3dssd_tpu.utils.checkpoint import latest_step, restore_checkpoint

    out = tmp_path / "run"
    tr = _mk_trainer(synthetic_kitti, tiny_conf, out)
    evals = []
    tr._eval = lambda epoch: (evals.append(epoch), 0.0)[1]
    spe = tr.steps_per_epoch

    tr.run(2)
    assert int(tr.state.step) == 2 * spe
    assert evals == [2]                      # eval_epoch=2 -> after epoch 2
    weights = os.path.join(str(out), "weights")
    assert latest_step(weights) == 2 * spe

    # fresh trainer + restore (exactly what scripts/train.py --restore does)
    tr2 = _mk_trainer(synthetic_kitti, tiny_conf, tmp_path / "run2")
    evals2 = []
    tr2._eval = lambda epoch: (evals2.append(epoch), 0.0)[1]
    tr2.state = restore_checkpoint(weights, tr2.state)
    assert int(tr2.state.step) == 2 * spe

    # target epochs already reached -> nothing runs, cadence not restarted
    tr2.run(2)
    assert int(tr2.state.step) == 2 * spe and evals2 == []

    # two more epochs: epoch numbering continues (2, 3), eval fires at the
    # reference-equivalent epoch 4 — NOT at 2 as a restarted loop would
    tr2.run(4)
    assert int(tr2.state.step) == 4 * spe
    assert evals2 == [4]


def test_run_dir_conventions(synthetic_kitti, tiny_conf, tmp_path):
    """Reference run-tree UX: timestamped output/<exp>/<ts>/ dirs
    (ref:lib/core.py:698-739), pretty-printed conf in the run log
    (ref:lib/util.py:32), and the best-metric dir rename at the end
    (ref:scripts/train_rpn_3d.py:305-308)."""
    import re

    exp = tmp_path / "exp"
    tr = _mk_trainer(synthetic_kitti, tiny_conf, exp, timestamped=True)
    run_dir = tr.output_dir
    assert os.path.dirname(run_dir) == str(exp)
    assert re.fullmatch(r"\d{8}_\d{6}", os.path.basename(run_dir))
    log = open(os.path.join(run_dir, "log", "train.log")).read()
    assert "conf.back_bone" in log and "conf.lr" in log

    # no metric -> no rename
    assert tr.finalize_run_dir() == run_dir and os.path.isdir(run_dir)
    # best metric -> dir renamed to carry it
    tr.best_metric = 12.3456
    new_dir = tr.finalize_run_dir()
    assert new_dir == run_dir + "_12.3456"
    assert os.path.isdir(new_dir) and not os.path.exists(run_dir)


def test_freeze_bn_stats_pinned(synthetic_kitti, tiny_conf):
    """Frozen layers' BatchNorm running stats must stay bit-identical across
    train steps (the reference puts frozen BN modules in eval mode —
    ref:lib/core.py:462-473); unfrozen layers' stats must update."""
    from m3dssd_tpu.data.kitti import Kitti3DDataset
    from m3dssd_tpu.data.loader import TrainLoader
    from m3dssd_tpu.models import build
    from m3dssd_tpu.train.state import create_train_state, make_train_step

    conf = tiny_conf.replace(anchors=None, warmup=0.0,
                             freeze_blacklist=["base"])
    ds = Kitti3DDataset(conf, synthetic_kitti, phase="train")
    loader = TrainLoader(ds, batch_size=2, num_workers=2, seed=0)
    model = build(conf)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(conf, model, rng, max_iter=20)
    train_step = make_train_step(conf, ds.rois)
    batch = next(iter(loader.batches(1)))

    bs0 = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    for i in range(2):
        state, _ = train_step(state, batch, jax.random.fold_in(rng, i))
    bs1 = jax.tree_util.tree_map(np.asarray, state.batch_stats)

    flat0 = jax.tree_util.tree_flatten_with_path(bs0)[0]
    flat1 = jax.tree_util.tree_flatten_with_path(bs1)[0]
    frozen_same, live_changed = [], []
    for (k0, v0), (k1, v1) in zip(flat0, flat1):
        name = jax.tree_util.keystr(k0)
        if "base" in name:
            frozen_same.append(np.array_equal(v0, v1))
        else:
            live_changed.append(not np.array_equal(v0, v1))
    assert frozen_same and all(frozen_same)
    assert live_changed and any(live_changed)


def test_trainer_eval_rides_training_mesh(synthetic_kitti, tiny_conf,
                                          tmp_path):
    """With a training mesh active and eval_batch_size divisible by its
    data axis, the in-training eval detector is mesh-sharded (multi-chip
    eval); the eval still runs end-to-end and returns a metric."""
    from m3dssd_tpu.train.trainer import Trainer
    conf = tiny_conf.replace(
        anchors=None, snapshot_epoch=1, eval_epoch=1, do_test=True,
        display_iter=2, max_epoch=1, eval_batch_size=4, score_thres=0.05,
        # batch_size must be divisible by the full device count for the
        # auto mesh to span all 8 devices (the data axis is clamped to
        # divide the global batch)
        batch_size=8)
    tr = Trainer(conf, synthetic_kitti, str(tmp_path / "out"), use_mesh=True)
    assert tr.mesh is not None and tr.mesh.shape["data"] == len(jax.devices())
    sel = tr._eval(epoch=1)
    assert np.isfinite(sel)
    # eval_bs=4 does not divide the 8-device mesh -> unsharded fallback
    assert getattr(tr._eval_detect, "input_sharding", None) is None

    conf8 = conf.replace(eval_batch_size=8)
    tr8 = Trainer(conf8, synthetic_kitti, str(tmp_path / "out8"),
                  use_mesh=True)
    sel8 = tr8._eval(epoch=1)
    assert np.isfinite(sel8)
    assert tr8._eval_detect.input_sharding is not None


def test_eval_protocol_gate(synthetic_kitti, tiny_conf, tmp_path):
    """Unknown test_protocol warns and skips the in-training eval instead of
    running the KITTI evaluator (ref:scripts/train_rpn_3d.py:282-300)."""
    tr = _mk_trainer(synthetic_kitti, tiny_conf, tmp_path / "run",
                     test_protocol="nuscenes")
    sel = tr._eval(1)
    assert sel == -1.0
    assert tr.val_dataset is None          # eval machinery never touched
    assert not (sel > tr.best_metric)      # can never become the best model
