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


def warm_gloo(mesh, barrier):
    """Establish the Gloo communicator clique with a tiny, barrier-aligned
    all-reduce BEFORE the real train step.

    Creating a Gloo context has a hard ~30 s per-rank key-value rendezvous
    deadline, and XLA creates it lazily at the FIRST collective the
    executable runs — which for the train step is the gradient psum near
    the END of a step that takes tens of seconds of compute per process on
    this 1-core host. OS scheduling skew between the two processes then
    puts their first collectives >30 s apart and context init dies with
    "GetKeyValue() timed out" (observed twice in full-suite runs).
    Communicator contexts are cached process-wide per device clique, so a
    warmup all-reduce — compiled, then barrier-aligned, then run with
    nothing else in flight — establishes the clique within seconds, and the
    train step reuses it without ever facing the deadline."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from m3dssd_tpu.parallel.mesh import _put

    x = np.arange(mesh.size, dtype=np.float32)
    xs = _put(x, mesh, (mesh.axis_names[0],))
    f = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))
    compiled = f.lower(xs).compile()
    barrier("gloo_warmup_compiled")
    out = float(compiled(xs))
    assert out == float(x.sum()), (out, float(x.sum()))


def run_train_step(conf, ds, batch8, mesh, barrier=None):
    """One jitted train step on `mesh`. `barrier(name)` (multi-process
    runs) is called between AOT compilation and execution: every NEW Gloo
    communicator has a hard ~30 s key-value rendezvous deadline, so all
    processes must START EXECUTING within 30 s of each other — compile
    times are wildly asymmetric (compile-cache hits), execution is not.
    The coordination-service barrier has a configurable timeout and does
    not ride Gloo, so it is the right alignment primitive."""
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
        rng = jax.random.PRNGKey(1)
        compiled = train_step.lower(state_r, sharded, rng).compile()
        if barrier is not None:
            barrier("train_step_compiled")
        _, stats = compiled(state_r, sharded, rng)
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
    # Pin Gloo to loopback: by default it advertises the primary interface,
    # which this sandbox intermittently blocks for local TCP — observed as
    # "Gloo context initialization failed: Connect timeout / GetKeyValue()
    # timed out". All processes of this simulation share one machine, so
    # loopback is the correct transport.
    from jax._src.lib import _jax as _jaxlib
    _orig_gloo = _jaxlib.make_gloo_tcp_collectives
    _jaxlib.make_gloo_tcp_collectives = (
        lambda distributed_client, hostname=None, interface=None:
        _orig_gloo(distributed_client=distributed_client,
                   hostname="localhost", interface="lo"))
    # generous liveness windows: on a saturated 1-core host the heartbeat
    # threads of concurrently-compiling processes can starve past the 100 s
    # default, and the coordinator then declares every task crashed
    # ("tasks are unhealthy (stopped sending heartbeats)", observed)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid,
                               initialization_timeout=600,
                               heartbeat_timeout_seconds=1200,
                               shutdown_timeout_seconds=1200)
    assert jax.device_count() == 4 * nproc
    assert jax.local_device_count() == 4

    from jax._src import distributed as _dist

    def barrier(name, timeout_min=25):
        # coordination-service barrier (NOT a Gloo collective): aligns the
        # processes across arbitrarily skewed compile times
        _dist.global_state.client.wait_at_barrier(name, timeout_min * 60000)

    from m3dssd_tpu.parallel import make_mesh
    mesh = make_mesh(4 * nproc)
    warm_gloo(mesh, barrier)
    conf, ds, batch8 = build_case(data_root)
    loss = run_train_step(conf, ds, batch8, mesh, barrier=barrier)
    with open(out_path, "w") as f:
        json.dump({"process": pid, "loss": loss}, f)
    # align exits: a straggler would otherwise miss the 5-min implicit
    # shutdown barrier
    barrier("multihost_runner_done")


if __name__ == "__main__":
    main()
