"""Tracing / profiling utilities.

The reference has no systematic profiling — only manual time() spans in the
accelerated detector (ref:lib/rpn_util.py:1569-1735). Here: a phase timer
with the same spirit plus `jax.profiler` trace capture for TPU timelines.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Optional


class PhaseTimer:
    """Accumulate wall-clock per named phase (ref's {'forward','pre','nms'}
    stat dict generalized)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def means(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}

    def report(self) -> str:
        return ", ".join(f"{k}={v * 1000:.2f}ms" for k, v in
                         sorted(self.means().items()))


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (viewable in TensorBoard / Perfetto)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logging.info("profiler trace written to %s", log_dir)


def make_tb_writer(log_dir: str):
    """TensorBoard scalar writer (reference uses tensorboardX:
    ref:scripts/train_rpn_3d.py:99). Returns None if unavailable."""
    try:
        from torch.utils.tensorboard import SummaryWriter
        return SummaryWriter(log_dir)
    except Exception:  # noqa: BLE001
        logging.warning("tensorboard writer unavailable")
        return None
