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
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(n_devices: int = -1, axis: str = DATA_AXIS,
              spatial: int = 1) -> Mesh:
    """Device mesh over the first `n_devices` devices.

    spatial=1 (default): 1-D data-parallel mesh (reference parity).
    spatial>1: 2-D ('data', 'spatial') mesh; images additionally shard
    their height across `spatial` devices.
    """
    devices = jax.devices()
    if n_devices in (-1, 0, None):
        n_devices = len(devices)
    if spatial <= 1:
        return Mesh(np.array(devices[:n_devices]), (axis,))
    assert n_devices % spatial == 0, (n_devices, spatial)
    arr = np.array(devices[:n_devices]).reshape(n_devices // spatial, spatial)
    return Mesh(arr, (axis, SPATIAL_AXIS))


def _spatial_size(mesh: Mesh) -> int:
    return mesh.shape.get(SPATIAL_AXIS, 1)


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
    batch and contributes its local slice of it)."""
    sharding = NamedSharding(mesh, P(*spec))
    if _spans_processes(mesh):
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])
    return jax.device_put(x, sharding)


def shard_batch(mesh: Mesh, batch: Dict[str, Any], axis: str = DATA_AXIS):
    """Place a host batch dict onto the mesh.

    Every array shards its leading (batch) dim over 'data'. On a 2-D mesh,
    arrays additionally shard over 'spatial':
      images [B, H, W, C]        -> P(data, spatial, None, None)   (H)
      per-anchor [B, N] / [B,P,N]-> P(data, spatial) / P(data, None, spatial)
        (N is (h, w, a)-flattened, h-major, so an H shard IS an N shard)
    Scalars-per-image ([B]) and matrices ([B, 4, 4]) stay data-sharded only.
    """
    sp = _spatial_size(mesh)
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
        return _put(x, mesh, spec)
    return jax.tree_util.tree_map(put, batch)


def replicate_state(mesh: Mesh, state):
    """Replicate a pytree (train state) across the mesh (multi-host aware:
    every process holds identical values — deterministic init/restore)."""
    def put(x):
        return _put(np.asarray(x), mesh, [])
    return jax.tree_util.tree_map(put, state)
