"""Smoke tests for the profiling utilities (A1 tracing/profiling subsystem;
the reference's closest analogue is the manual time() spans in
ref:lib/rpn_util.py:1569-1735)."""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from m3dssd_tpu.utils.profiling import PhaseTimer, device_trace, make_tb_writer


def test_phase_timer_accumulates():
    pt = PhaseTimer()
    for _ in range(3):
        with pt.phase("fwd"):
            time.sleep(0.01)
    with pt.phase("nms"):
        time.sleep(0.02)
    m = pt.means()
    assert 0.008 < m["fwd"] < 0.1
    assert m["nms"] > m["fwd"]
    assert pt.counts["fwd"] == 3 and pt.counts["nms"] == 1
    rep = pt.report()
    assert "fwd=" in rep and "nms=" in rep and "ms" in rep


def test_phase_timer_records_on_exception():
    pt = PhaseTimer()
    try:
        with pt.phase("boom"):
            raise ValueError("x")
    except ValueError:
        pass
    assert pt.counts["boom"] == 1


def test_device_trace_writes(tmp_path):
    import jax
    import jax.numpy as jnp

    d = str(tmp_path / "trace")
    with device_trace(d):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    # a perfetto/xplane trace file appears under the log dir
    files = glob.glob(os.path.join(d, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files)


def test_make_tb_writer(tmp_path):
    w = make_tb_writer(str(tmp_path / "tb"))
    if w is None:  # tensorboard genuinely unavailable -> documented fallback
        return
    w.add_scalar("Train/loss", 1.0, 0)
    w.flush()
    assert glob.glob(os.path.join(str(tmp_path / "tb"), "events.*"))
