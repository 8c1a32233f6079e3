"""Learning-rate policies: cos / poly / step with linear warmup.

Exact re-derivation of ref:lib/core.py:105-168 (`adjust_lr`), expressed as a
pure optax-style schedule `f(step) -> lr` so it lives inside the jitted
update instead of mutating optimizer state from Python each iteration.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def make_lr_schedule(conf, max_iter: int):
    """Build `f(step)->lr` for conf.lr_policy (cos | poly | step).

    `max_iter` is the total number of optimizer iterations (epochs *
    steps_per_epoch), as the reference computes it in the train script.
    """
    lr0 = float(conf.lr)
    lr_target = float(conf.lr_target)
    policy = conf.lr_policy.lower()
    warmup_iters = int(max_iter * conf.warmup)

    if conf.lr_steps:
        steps = jnp.asarray(np.array(conf.lr_steps) * max_iter)
        total_steps = len(conf.lr_steps)
    else:
        steps = None
        total_steps = max_iter

    def sched(it):
        it = jnp.asarray(it, jnp.float32)
        if steps is not None:
            step_count = jnp.sum((steps - it) <= 0).astype(jnp.float32)
        else:
            step_count = it

        if policy == "step":
            scale = (lr_target / lr0) ** (1.0 / total_steps)
            return lr0 * scale ** step_count

        if policy == "poly":
            power = 0.9
            denom = total_steps * conf.warmup
            warm = step_count / jnp.maximum(denom, 1.0) * lr0
            scale = total_steps / (1 - (lr_target / lr0) ** (1 / power))
            main = lr0 * jnp.maximum(1 - step_count / scale, 0.0) ** power
            return jnp.where(step_count < warmup_iters, warm, main)

        if policy == "cos":
            warm = step_count / jnp.maximum(warmup_iters, 1) * lr0
            sc = (step_count - warmup_iters) / max(max_iter - warmup_iters, 1)
            main = lr_target + 0.5 * (lr0 - lr_target) * (1 + jnp.cos(sc * jnp.pi))
            return jnp.where(step_count < warmup_iters, warm, main)

        raise ValueError(f"{policy} lr_policy not understood")

    return sched
