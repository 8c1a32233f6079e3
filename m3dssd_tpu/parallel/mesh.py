"""SPMD data parallelism over a device mesh.

The reference's parallelism story is single-process `torch.nn.DataParallel`
(ref:lib/core.py:73-74) — replicate, scatter, gather every step. The
TPU-native equivalent is GSPMD: one jitted train step, inputs sharded over a
1-D 'data' mesh axis, parameters replicated; XLA inserts the gradient
all-reduce over ICI. The same code spans hosts (DCN) when
`jax.distributed.initialize` has been called — no code changes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = -1, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` devices."""
    devices = jax.devices()
    if n_devices in (-1, 0, None):
        n_devices = len(devices)
    return Mesh(np.array(devices[:n_devices]), (axis,))


def shard_batch(mesh: Mesh, batch: Dict[str, Any], axis: str = "data"):
    """Place a host batch dict with leading batch dims onto the mesh,
    sharded along the batch dimension."""
    def put(x):
        x = np.asarray(x)
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batch)


def replicate_state(mesh: Mesh, state):
    """Replicate a pytree (train state) across the mesh."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(put, state)
