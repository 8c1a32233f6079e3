"""First-m stream compaction without sorting.

The shared TPU idiom behind sparse alignment (models/align.confident_topm)
and the sparse pre-NMS probe (inference/detect.py): a cumsum over boolean
flags assigns each passing element its output slot, and `searchsorted` on
the (monotone) cumsum inverts that map with log2(N) tiny gathers. A full
`lax.top_k` lowers through TPU sort machinery (~20 ms at 507k rows) and is
never needed when order-of-appearance is acceptable. See the CLAUDE.md
lowering rules for the measured costs (the cumsum itself is log2(N) full
passes — compact at the coarsest granularity available).
"""

from __future__ import annotations

import jax.numpy as jnp


def first_m_true(flags, m: int):
    """Indices of the first `m` True entries of a flat bool vector.

    flags [N] -> (idx [m] int32 with sentinel N in unused slots,
    ok: scalar bool, total True count <= m).
    """
    ranks = jnp.cumsum(flags.astype(jnp.int32))
    idx = jnp.searchsorted(ranks, jnp.arange(1, m + 1, dtype=jnp.int32),
                           side="left")
    return idx.astype(jnp.int32), ranks[-1] <= m
