"""Multi-host (multi-process) SPMD execution test.

Round-2 verdict item: `scripts/train.py --distributed` wires
`jax.distributed.initialize` but no multi-process run had ever executed.
This test actually runs one: two OS processes x 4 virtual CPU devices each,
joined into a global 8-device mesh (Gloo collectives — the CPU stand-in for
DCN between TPU hosts), and asserts the train-step loss equals the
single-process 8-device mesh value bit-for-bit in semantics (same global
batch, same init, same partitioning).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_step_matches_single_process(synthetic_kitti,
                                                       tmp_path):
    runner = os.path.join(os.path.dirname(__file__), "multihost_runner.py")
    port = _free_port()
    outs = [str(tmp_path / f"proc{i}.json") for i in range(2)]

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # runner sets its own device count (4)
    procs = [subprocess.Popen(
        [sys.executable, runner, str(i), "2", str(port), synthetic_kitti,
         outs[i]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = [p.communicate(timeout=1800)[0].decode() for p in procs]
    if any(p.returncode != 0 for p in procs):
        # show BOTH logs: with jax.distributed, the process that reports
        # the error is usually reacting to the OTHER process dying
        blob = "\n".join(f"--- proc {i} rc={p.returncode} ---\n{log[-3000:]}"
                         for i, (p, log) in enumerate(zip(procs, logs)))
        raise AssertionError(f"runner failed:\n{blob}")

    losses = []
    for o in outs:
        with open(o) as f:
            losses.append(json.load(f)["loss"])
    # both processes observe the same (replicated) loss
    assert losses[0] == losses[1]

    # single-process reference on the in-test 8-device mesh, same case
    sys.path.insert(0, os.path.dirname(__file__))
    from multihost_runner import build_case, run_train_step
    from m3dssd_tpu.parallel import make_mesh
    conf, ds, batch8 = build_case(synthetic_kitti)
    loss_single = run_train_step(conf, ds, batch8, make_mesh(8))

    np.testing.assert_allclose(losses[0], loss_single, rtol=1e-5)
