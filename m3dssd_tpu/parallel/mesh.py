"""SPMD parallelism over a device mesh: data parallel + optional spatial
partitioning.

The reference's parallelism story is single-process `torch.nn.DataParallel`
(ref:lib/core.py:73-74) — replicate, scatter, gather every step. The
TPU-native equivalent is GSPMD: one jitted train step, inputs sharded over
the mesh, parameters replicated; XLA inserts the gradient all-reduce over
ICI. The same code spans hosts (DCN) when `jax.distributed.initialize` has
been called — no code changes.

Beyond the reference's DP-only story, a 2-D ('data', 'spatial') mesh also
shards each image's HEIGHT across devices: XLA's SPMD partitioner inserts
the convolution halo exchanges automatically, and because the anchor flat
order is (h, w, a) — h-major (anchors.locate_anchors) — the flattened
[B, N] target/prediction tensors shard along the SAME axis with no
resharding between the backbone and the loss. Useful when single-image
activation memory (not batch) is the limiting factor, e.g. very large
input resolutions.

A third optional 'model' axis tensor-parallelizes the network itself:
every parameter whose trailing (output-channel) dim is wide enough shards
over 'model' — conv kernels [kh,kw,cin,cout] split their cout, and the
matching bias / BN scale / running stats split the same channel axis, so
each device holds 1/mp of the wide layers' weights AND optimizer momentum.
XLA GSPMD derives the activation shardings and inserts the all-gathers /
reduce-scatters; correctness is by construction (loss-equality tested on
a dp×sp×tp CPU mesh). Use when parameter+optimizer memory is the limit.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"
MODEL_AXIS = "model"


def make_mesh(n_devices: int = -1, axis: str = DATA_AXIS,
              spatial: int = 1, model: int = 1) -> Mesh:
    """Device mesh over the first `n_devices` devices.

    spatial=1, model=1 (default): 1-D data-parallel mesh (reference parity).
    spatial>1: adds a 'spatial' axis; images shard their height across it.
    model>1: adds a 'model' axis; wide parameters shard their output
    channels across it (see `replicate_state`).
    Axes with extent 1 are omitted, so existing 1-D/2-D callers see the
    same mesh shapes as before.
    """
    devices = jax.devices()
    if n_devices in (-1, 0, None):
        n_devices = len(devices)
    spatial = max(spatial, 1)
    model = max(model, 1)
    assert n_devices % (spatial * model) == 0, (n_devices, spatial, model)
    dims = [(axis, n_devices // (spatial * model)),
            (SPATIAL_AXIS, spatial), (MODEL_AXIS, model)]
    dims = [(name, ext) for name, ext in dims
            if ext > 1 or name == axis]          # keep 'data' even at 1
    arr = np.array(devices[:n_devices]).reshape([e for _, e in dims])
    return Mesh(arr, tuple(name for name, _ in dims))


def _spatial_size(mesh: Mesh) -> int:
    return mesh.shape.get(SPATIAL_AXIS, 1)


def _model_size(mesh: Mesh) -> int:
    return mesh.shape.get(MODEL_AXIS, 1)


def _spans_processes(mesh: Mesh) -> bool:
    """True when the mesh contains devices of other processes (multi-host:
    `jax.distributed.initialize` has been called and `jax.devices()` is
    global)."""
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def _put(x, mesh: Mesh, spec) -> jax.Array:
    """Place a host array with the given PartitionSpec — `device_put` on a
    single-process mesh, `make_array_from_callback` when the mesh spans
    processes (each process materializes only its addressable shards).

    Multi-host contract: every process passes the same GLOBAL array (the
    seeded loaders are deterministic, so each host computes the identical
    batch and contributes its local slice of it). That duplicates O(hosts)
    host work — production trainers use `shard_batch(per_host=True)` /
    `_put_local`, where each process materializes only its own slice."""
    sharding = NamedSharding(mesh, P(*spec))
    if _spans_processes(mesh):
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])
    return jax.device_put(x, sharding)


def put_global(x, sharding) -> jax.Array:
    """Place a host array every process holds IDENTICALLY under `sharding`
    (a NamedSharding) — device_put when its devices are all local,
    callback placement when it spans processes. The multi-host twin of the
    eval driver's explicit device_put (inference/test_driver.py)."""
    x = np.asarray(x)
    if sharding is None:
        return jax.device_put(x)
    me = jax.process_index()
    if all(d.process_index == me for d in sharding.device_set):
        return jax.device_put(x, sharding)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def _put_local(x_local, mesh: Mesh, spec) -> jax.Array:
    """Place a PER-HOST batch slice: this process provides only the rows of
    the leading ('data') dim its own devices hold; the global array is
    assembled without any cross-host transfer. Requires
    `per_host_data_slicing_ok(mesh)` (process-major contiguous 'data'
    blocks — how `make_mesh` lays out `jax.devices()`)."""
    sharding = NamedSharding(mesh, P(*spec))
    if not _spans_processes(mesh):
        return jax.device_put(x_local, sharding)
    nproc = jax.process_count()
    me = jax.process_index()
    gshape = (x_local.shape[0] * nproc,) + tuple(x_local.shape[1:])
    off = me * x_local.shape[0]

    def cb(idx):
        rows = idx[0]
        start = 0 if rows.start is None else rows.start
        stop = gshape[0] if rows.stop is None else rows.stop
        return x_local[(slice(start - off, stop - off),) + tuple(idx[1:])]

    return jax.make_array_from_callback(gshape, sharding, cb)


def per_host_data_slicing_ok(mesh: Mesh) -> bool:
    """True when the 'data' axis splits into process-major contiguous
    blocks (every data row lives on exactly one process, in process order) —
    the layout `make_mesh` produces from `jax.devices()` — so each host can
    materialize only its own batch slice (`shard_batch(per_host=True)`)."""
    nproc = jax.process_count()
    if nproc == 1 or DATA_AXIS not in mesh.axis_names:
        return False
    dsize = mesh.shape[DATA_AXIS]
    if dsize % nproc:
        return False
    k = dsize // nproc
    ax = mesh.axis_names.index(DATA_AXIS)
    dev = np.moveaxis(mesh.devices, ax, 0)
    for di in range(dsize):
        procs = {d.process_index for d in np.asarray(dev[di]).flat}
        if procs != {di // k}:
            return False
    return True


def shard_batch(mesh: Mesh, batch: Dict[str, Any], axis: str = DATA_AXIS,
                per_host: bool = False):
    """Place a host batch dict onto the mesh.

    Every array shards its leading (batch) dim over 'data'. On a 2-D mesh,
    arrays additionally shard over 'spatial':
      images [B, H, W, C]        -> P(data, spatial, None, None)   (H)
      per-anchor [B, N] / [B,P,N]-> P(data, spatial) / P(data, None, spatial)
        (N is (h, w, a)-flattened, h-major, so an H shard IS an N shard)
    Scalars-per-image ([B]) and matrices ([B, 4, 4]) stay data-sharded only.

    per_host: the batch holds only THIS process's slice of the global batch
    (leading dim = global_batch / process_count; loaders built with
    process_count>1 produce exactly this). Each host then decodes, augments
    and uploads only its own images — O(1) host work per host instead of the
    O(hosts) duplicated global batch. Requires
    `per_host_data_slicing_ok(mesh)`.
    """
    sp = _spatial_size(mesh)
    put_fn = _put_local if per_host else _put
    # anchor tensors have N = H*W*A in their trailing dim — always large.
    # The size floor keeps small per-image matrices (p2/p2_inv [B,4,4],
    # whose trailing 4 can divide `sp`) data-sharded only, as documented.
    _MIN_N = 32

    def put(x):
        x = np.asarray(x)
        spec = [axis] + [None] * (x.ndim - 1)
        if sp > 1:
            if x.ndim == 4 and x.shape[1] % sp == 0:      # images [B,H,W,C]
                spec[1] = SPATIAL_AXIS
            elif x.ndim == 2 and x.shape[1] >= _MIN_N \
                    and x.shape[1] % sp == 0:             # [B, N]
                spec[1] = SPATIAL_AXIS
            elif x.ndim == 3 and x.shape[1] in (4, 7) \
                    and x.shape[2] >= _MIN_N \
                    and x.shape[2] % sp == 0:             # [B, P, N]
                spec[2] = SPATIAL_AXIS
        return put_fn(x, mesh, spec)
    return jax.tree_util.tree_map(put, batch)


def replicate_state(mesh: Mesh, state, min_model_dim: int = 128):
    """Place a pytree (train state) onto the mesh (multi-host aware:
    every process holds identical values — deterministic init/restore).

    Without a 'model' axis every leaf is replicated (reference DP parity).
    With one, any leaf whose trailing dim is >= `min_model_dim` and divides
    the axis shards that dim over 'model' — Megatron-style output-channel
    weight sharding, applied uniformly: conv kernels [kh,kw,cin,cout] split
    cout; their bias / BN scale / running stats [C] split the same channels;
    optimizer momentum mirrors its parameter leaf by the same rule. GSPMD
    derives all activation movement. `min_model_dim` keeps narrow leaves
    (head towers' 4-class outputs, scalars, step counters) replicated."""
    mp = _model_size(mesh)

    def put(x):
        x = np.asarray(x)
        spec = [None] * x.ndim
        if (mp > 1 and x.ndim >= 1 and x.shape[-1] >= min_model_dim
                and x.shape[-1] % mp == 0):
            spec[-1] = MODEL_AXIS
        return _put(x, mesh, spec)
    return jax.tree_util.tree_map(put, state)
