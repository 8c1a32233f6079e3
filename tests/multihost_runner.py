"""Standalone multi-process train-step runner (used by test_multihost.py).

Each process hosts 4 virtual CPU devices; `jax.distributed.initialize`
stitches them into one 8-device global mesh (collectives over Gloo — the
CPU stand-in for DCN between TPU hosts). Every process builds the identical
conf/state/batch deterministically and runs ONE jitted train step on the
global mesh; the resulting loss is written to an output file.

The parent test compares the two processes' losses against the
single-process 8-device mesh value — SPMD semantics must not depend on how
devices are split across processes (SURVEY §2.9 multi-host row;
ref:scripts/train_rpn_3d.py is single-process DataParallel only).
"""

import json
import os
import sys


def build_case(data_root: str):
    """Deterministic tiny training case shared by all processes AND by the
    single-process reference run: conf, rois, and an 8-image batch."""
    import numpy as np
    from m3dssd_tpu.config import kitti_3d_base
    from m3dssd_tpu.data.kitti import Kitti3DDataset
    from m3dssd_tpu.data.loader import TrainLoader

    conf = kitti_3d_base().replace(
        crop_size=[192, 640], test_scale=[192, 640],
        num_anchor_scales=6, batch_size=2, num_workers=2,
        back_bone="dla34", compute_dtype="float32", pre_train=False,
        anchors=None, warmup=0.0)
    ds = Kitti3DDataset(conf, data_root, phase="train")
    loader = TrainLoader(ds, batch_size=2, num_workers=2, seed=0)
    batch = next(iter(loader.batches(1)))
    batch8 = {k: np.concatenate([np.asarray(v)] * 4, axis=0)
              for k, v in batch.items()}
    # Kitti3DDataset injects computed anchors/whitening stats onto the conf
    return conf, ds, batch8


def run_train_step(conf, ds, batch8, mesh):
    import jax
    from m3dssd_tpu.parallel import replicate_state, shard_batch
    from m3dssd_tpu.train.state import create_train_state, make_train_step

    from m3dssd_tpu.models import build
    model = build(conf)
    state = create_train_state(conf, model, jax.random.PRNGKey(0),
                               max_iter=100)
    train_step = make_train_step(conf, ds.rois)
    with mesh:
        sharded = shard_batch(mesh, batch8)
        state_r = replicate_state(mesh, state)
        _, stats = train_step(state_r, sharded, jax.random.PRNGKey(1))
    return float(stats["loss"])


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = int(sys.argv[3])
    data_root = sys.argv[4]
    out_path = sys.argv[5]

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    jax.config.update("jax_platforms", "cpu")
    # private CPU-only compile cache: the shared /tmp/jax_cache also holds
    # XLA:CPU AOT entries produced by the TPU-tunnel backend host (a
    # different machine type — loading those here risks SIGILL, observed as
    # cpu_aot_loader machine-feature mismatch errors)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR_MH",
                                     "/tmp/jax_cache_cpu_mh"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.device_count() == 4 * nproc
    assert jax.local_device_count() == 4

    from m3dssd_tpu.parallel import make_mesh
    conf, ds, batch8 = build_case(data_root)
    mesh = make_mesh(4 * nproc)
    loss = run_train_step(conf, ds, batch8, mesh)
    with open(out_path, "w") as f:
        json.dump({"process": pid, "loss": loss}, f)
    # explicit barrier before exit: without it, a straggler (cold compile
    # under host contention) can miss the 5-min implicit shutdown barrier
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("multihost_runner_done")


if __name__ == "__main__":
    main()
