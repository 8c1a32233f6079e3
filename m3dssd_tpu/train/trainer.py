"""The full training driver: epochs, LR, eval, checkpointing, best-model.

Re-derivation of ref:scripts/train_rpn_3d.py:67-309 — the epoch loop with
per-iteration LR (inside the jitted step here), stat display, periodic
checkpoint + KITTI eval, and best-model selection by mean Car 3D AP-R40.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from ..data.kitti import Kitti3DDataset
from ..data.loader import TrainLoader
from ..inference.detect import make_detector
from ..inference.test_driver import test_kitti_3d
from ..models import build
from ..parallel import make_mesh, replicate_state, shard_batch
from ..utils.checkpoint import restore_checkpoint, save_checkpoint
from ..utils.logging_utils import StatTracker, compute_eta, init_logging
from .state import create_train_state, make_train_step


def enable_compilation_cache():
    """Persistent XLA compilation cache — the deep DLA graphs cost minutes to
    compile; cache hits make restarts/evals near-instant."""
    import jax as _jax
    _jax.config.update("jax_compilation_cache_dir",
                       os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


class Trainer:
    def __init__(self, conf, data_root: str, output_dir: str,
                 cache_folder: Optional[str] = None, use_mesh: bool = True,
                 timestamped: bool = False):
        enable_compilation_cache()
        self.conf = conf
        self.data_root = data_root
        # multi-host: every process trains (SPMD over the global mesh), but
        # run-dir artifacts — conf/pickle/source snapshot, checkpoints,
        # result txts, TB scalars — are written by process 0 ONLY (pod
        # slices share a filesystem; unconditional writes race)
        self._primary = jax.process_index() == 0
        if timestamped:
            # reference run-tree convention: output/<exp>/<timestamp>/
            # (ref:lib/core.py:698-739 init_training_paths)
            output_dir = os.path.join(output_dir,
                                      time.strftime("%Y%m%d_%H%M%S"))
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        log_name = "train.log" if self._primary \
            else f"train.p{jax.process_index()}.log"
        init_logging(os.path.join(output_dir, "log", log_name))
        # pretty-printed resolved config in the run log (ref:lib/util.py:32)
        from ..utils.logging_utils import pretty_print
        import dataclasses as _dc
        logging.info("\n%s", pretty_print(
            "conf", {f.name: getattr(conf, f.name)
                     for f in _dc.fields(conf)}))

        # Parity pinning: importing a reference checkpoint with learned DCN
        # offsets forces the exact gather-path DCN (see
        # torch_import.pin_parity_conf) — must happen BEFORE the model is
        # built and before the conf is persisted with the run.
        self._pretrained_sd = None
        if conf.pretrained and not os.path.isdir(conf.pretrained):
            from ..utils.torch_import import load_torch_file, pin_parity_conf
            self._pretrained_sd = load_torch_file(conf.pretrained)
            conf = pin_parity_conf(conf, self._pretrained_sd)
            self.conf = conf

        self.dataset = Kitti3DDataset(conf, data_root, phase="train",
                                      cache_folder=cache_folder)
        # host-side space-to-depth input packing (exact relayout; saves the
        # device-side pack copy — models/dla.py:space_to_depth_np)
        self.packed_input = bool(conf.stem_s2d and conf.crop_size[0] % 2 == 0
                                 and conf.crop_size[1] % 2 == 0)

        # the mesh is built BEFORE the loader so the loader can slice the
        # global batch per host (each process decodes/augments only its own
        # images when the 'data' axis splits process-major)
        self.mesh = None
        self._per_host = False
        if use_mesh and len(jax.devices()) > 1:
            sp = max(getattr(conf, "mesh_spatial", 1), 1)
            mp = max(getattr(conf, "mesh_model", 1), 1)
            if conf.dp_devices > 0:
                n = conf.dp_devices * sp * mp
            else:
                # auto: the data axis must divide the global batch (GSPMD
                # shards batch dim 0 over it) — use the largest divisor of
                # batch_size that fits the available devices
                dp_max = max(len(jax.devices()) // (sp * mp), 1)
                dp = max(d for d in range(1, dp_max + 1)
                         if conf.batch_size % d == 0)
                n = dp * sp * mp
            if n > 1:
                self.mesh = make_mesh(n, spatial=sp, model=mp)
                from ..parallel import per_host_data_slicing_ok
                self._per_host = per_host_data_slicing_ok(self.mesh)
                logging.info("mesh over %d devices: %s (per-host input "
                             "slicing: %s)", n, dict(self.mesh.shape),
                             self._per_host)

        self.loader = TrainLoader(
            self.dataset, conf.batch_size, num_workers=conf.num_workers,
            seed=conf.rng_seed, pack_s2d=self.packed_input,
            process_index=jax.process_index() if self._per_host else 0,
            process_count=jax.process_count() if self._per_host else 1)
        self.steps_per_epoch = self.loader.steps_per_epoch
        self.max_iter = conf.max_epoch * self.steps_per_epoch

        if self._primary:
            # persist the resolved config with the run
            # (ref:train_rpn_3d.py:127)
            conf.save(os.path.join(output_dir, "conf.pkl"))
            # snapshot the package source so old checkpoints keep running
            # with the code that trained them (ref:lib/core.py:57-70;
            # scripts/test.py prefers the snapshot)
            from ..utils.source_snapshot import snapshot_source
            snapshot_source(output_dir)

        self.model = build(conf, "train")
        rng = jax.random.PRNGKey(conf.rng_seed)
        self.state = create_train_state(conf, self.model, rng, self.max_iter)
        # the state is threaded linearly through run() (self.state rebinds
        # every step) and checkpointing is synchronous, so donating the input
        # state is safe and halves the steady-state HBM footprint
        self.train_step = make_train_step(conf, self.dataset.rois,
                                          packed_input=self.packed_input,
                                          donate=True)
        self.rng = rng

        if conf.pretrained:
            self._load_pretrained(conf.pretrained)

        if self.mesh is not None:
            self.state = replicate_state(self.mesh, self.state)
        else:
            # single device: upload batches from the prefetch thread so the
            # transfer overlaps the running step (see TrainLoader.to_device)
            self.loader.to_device = True

        self.best_metric = -1.0
        self.val_dataset = None
        self._eval_detect = None
        from ..utils.profiling import make_tb_writer
        self.writer = make_tb_writer(os.path.join(output_dir, "log", "tb")) \
            if self._primary else None

    def _load_pretrained(self, path: str):
        """Load pretrained weights: a torch checkpoint (reference format /
        ImageNet DLA) or an orbax checkpoint dir (ref:lib/core.py:477-511
        partial-load semantics)."""
        conf = self.conf
        if os.path.isdir(path):
            from ..utils.checkpoint import (is_seed_checkpoint,
                                            restore_checkpoint, restore_seed)
            if is_seed_checkpoint(path):
                # optimizer-agnostic seed (scripts/fetch_pretrained.py):
                # params + BN stats only, fresh opt_state/step
                params, batch_stats = restore_seed(
                    path, self.state.params, self.state.batch_stats)
                self.state = self.state.replace(params=params,
                                                batch_stats=batch_stats)
            else:
                self.state = restore_checkpoint(path, self.state)
            return
        from ..utils.torch_import import (load_reference_checkpoint,
                                          load_torch_file)
        sd = self._pretrained_sd if self._pretrained_sd is not None \
            else load_torch_file(path)
        block = "basic" if conf.back_bone in ("dla34", "dla34_depth") \
            else "bottleneck"
        params, batch_stats, stats = load_reference_checkpoint(
            {"params": self.state.params,
             "batch_stats": self.state.batch_stats},
            sd, num_anchors=conf.anchors.shape[0],
            num_classes=conf.num_classes, block=block)
        self.state = self.state.replace(params=params,
                                        batch_stats=batch_stats)

    def _eval(self, epoch: int) -> float:
        conf = self.conf
        # testing-protocol gate (ref:scripts/train_rpn_3d.py:282-300): only
        # the kitti protocol is understood; anything else warns and skips
        # the in-training eval (never becomes the best model)
        if getattr(conf, "test_protocol", "kitti").lower() != "kitti":
            logging.warning("Testing protocol %s not understood — skipping "
                            "eval", conf.test_protocol)
            return -1.0
        if self.val_dataset is None:
            self.val_dataset = Kitti3DDataset(conf, self.data_root,
                                              phase="validation")
        # build the (batched) jitted detector ONCE and keep it alive across
        # eval epochs — a fresh closure per epoch would be a new jit cache
        # entry and a recompile (or at best a disk-cache hit)
        eval_bs = max(int(getattr(conf, "eval_batch_size", 1)), 1)
        from ..inference.detect import packed_input_eligible
        packed = packed_input_eligible(conf)
        if self._eval_detect is None:
            if eval_bs > 1:
                from ..inference.detect import make_batch_detector
                # ride the training mesh (params are already replicated on
                # it) whenever the eval batch divides over its data axis
                mesh = self.mesh if (
                    self.mesh is not None
                    and eval_bs % self.mesh.shape["data"] == 0) else None
                self._eval_detect = make_batch_detector(
                    conf, self.dataset.rois, self.model, packed_input=packed,
                    mesh=mesh,
                    # TP mesh: params are channel-sharded over 'model' —
                    # keep their placement instead of all-gathering
                    follow_params_sharding=(
                        mesh is not None and "model" in mesh.shape))
            else:
                self._eval_detect = make_detector(conf, self.dataset.rois,
                                                  self.model,
                                                  packed_input=packed)
        results = os.path.join(self.output_dir, "results",
                               f"results_{epoch}", "data")
        gt_path = os.path.join(self.data_root,
                               conf.datasets_validation[0]["name"],
                               "validation", "label_2")
        res, sel = test_kitti_3d(self.val_dataset, self._eval_detect,
                                 self.state.params,
                                 self.state.batch_stats, conf, results,
                                 gt_path=gt_path, batch_size=eval_bs,
                                 packed_input=packed)
        if res:
            logging.info("eval epoch %d: Car 3D R40 = %s", epoch,
                         res.get("Car_3d_R40"))
            if self.writer is not None:
                # per-class/metric scalars (ref:lib/rpn_util.py:1880-1896)
                for key, vals in res.items():
                    if key.startswith("_"):
                        continue
                    for d, name in zip(vals, ["easy", "moderate", "hard"]):
                        self.writer.add_scalar(f"Test/{key}/{name}", d, epoch)
        return sel

    def run(self, epochs: Optional[int] = None):
        conf = self.conf
        epochs = epochs or conf.max_epoch
        tracker = StatTracker(writer=self.writer)
        t0 = time.time()
        it = int(self.state.step)
        # resume parity: after --restore, continue the epoch numbering and
        # the eval/snapshot cadence from the restored step instead of
        # restarting at epoch 0 (ref:scripts/train_rpn_3d.py:148-151,
        # ref:lib/core.py:803-812 resume at start_epoch). Checkpoints are
        # written at epoch boundaries, so the division is exact there.
        start_epoch = it // self.steps_per_epoch
        it0 = it   # ETA over *this session's* iterations only

        for epoch in range(start_epoch, epochs):
            for batch in self.loader.batches(self.steps_per_epoch):
                if self.mesh is not None:
                    batch = shard_batch(self.mesh, batch,
                                        per_host=self._per_host)
                step_rng = jax.random.fold_in(self.rng, it)
                self.state, stats = self.train_step(self.state, batch, step_rng)
                # raw device stats of the most recent step (no host sync);
                # multi-host tests read the replicated loss from here
                self.last_stats = stats
                tracker.update({k: v for k, v in stats.items()})
                it += 1
                if it % max(int(conf.display_iter), 1) == 0:
                    eta, dt = compute_eta(t0, it - it0, self.max_iter - it0)
                    tracker.flush(it, extra=f"epoch {epoch} dt {dt:.3f}s eta {eta}")

            # epoch-end flush so short runs still report
            if tracker.counts:
                eta, dt = compute_eta(t0, it - it0, self.max_iter - it0)
                tracker.flush(it, extra=f"epoch {epoch} end dt {dt:.3f}s eta {eta}")

            if (epoch + 1) % conf.snapshot_epoch == 0 or epoch + 1 == epochs:
                # async: the D2H snapshot is taken synchronously, the file
                # write overlaps the next epoch's steps (utils/checkpoint.py).
                # Multi-host: EVERY process must call save — orbax's save
                # protocol runs global process syncs, and only primary_host
                # (process 0) actually commits bytes, so the checkpoint is
                # still written exactly once (gating on process 0 deadlocks
                # the barrier and kills the run — observed)
                save_checkpoint(os.path.join(self.output_dir, "weights"),
                                self.state, it, async_save=True)
            if conf.do_test and (epoch + 1) % conf.eval_epoch == 0:
                # every process participates in the sharded eval forward;
                # test_kitti_3d gates result writes/AP on process 0 and
                # broadcasts the selection metric so all processes take the
                # same best-model branch (the save syncs globally, above)
                sel = self._eval(epoch + 1)
                if sel > self.best_metric:
                    self.best_metric = sel
                    save_checkpoint(os.path.join(self.output_dir, "weights_best"),
                                    self.state, it, async_save=True)
                    logging.info("new best model: %.4f", sel)
        from ..utils.checkpoint import wait_for_saves
        wait_for_saves()   # all checkpoints durable before run() returns
        return self.state

    def finalize_run_dir(self) -> str:
        """End-of-run convention: rename the run directory to carry the best
        selection metric, `<output_dir>_<best>` (ref:scripts/train_rpn_3d.py
        :305-308 renames when the metric is meaningful). Returns the (possibly
        renamed) output path. No-op when no eval produced a metric, and on
        non-primary multi-host processes."""
        if self.best_metric <= 0 or not self._primary:
            return self.output_dir
        if self.writer is not None:
            try:
                self.writer.close()
            except Exception:
                pass
            self.writer = None
        new_dir = f"{self.output_dir}_{self.best_metric:.4f}"
        os.rename(self.output_dir, new_dir)
        logging.info("run dir renamed: %s", new_dir)
        self.output_dir = new_dir
        return new_dir
