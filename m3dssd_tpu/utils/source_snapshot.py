"""Run-directory source snapshot for checkpoint/code reproducibility.

The reference copies the model's .py file into the run directory at training
start and re-imports the model from that copy at test time, so an old
checkpoint always runs with the code that trained it
(ref:lib/core.py:57-70 init_training_model copies the model file;
ref:scripts/test_rpn_3d.py:48 and test_m3d.py:45-48 rebuild from the copy).

Here the model is not a single file, so the whole `m3dssd_tpu` package tree
is snapshotted into `<run_dir>/model_src/m3dssd_tpu/`. `scripts/test.py`
prepends `<run_dir>/model_src` to sys.path before importing the package, so
evaluating an old run uses the training-time code even after the installed
package has been refactored. Only Python sources are copied — the native
eval kernels (repo-level `native/`) are host-side evaluation tooling, not
part of the model forward the checkpoint must reproduce.
"""

from __future__ import annotations

import logging
import os
import shutil
import time


def snapshot_source(run_dir: str) -> str:
    """Copy the live `m3dssd_tpu` package into `<run_dir>/model_src/`.

    Returns the directory to prepend to sys.path (`<run_dir>/model_src`).
    Overwrites a previous snapshot (resumed runs re-snapshot the code that
    is actually running now).
    """
    import m3dssd_tpu
    pkg_dir = os.path.dirname(os.path.abspath(m3dssd_tpu.__file__))
    dest_root = os.path.join(run_dir, "model_src")
    dest = os.path.join(dest_root, "m3dssd_tpu")
    if os.path.exists(dest):
        shutil.rmtree(dest)
    shutil.copytree(pkg_dir, dest,
                    ignore=shutil.ignore_patterns("__pycache__", "*.pyc",
                                                  "*.so", "*.o"))
    with open(os.path.join(dest_root, "SNAPSHOT.txt"), "w") as f:
        f.write(f"source: {pkg_dir}\n"
                f"time: {time.strftime('%Y-%m-%d %H:%M:%S')}\n")
    logging.info("model source snapshot: %s", dest_root)
    return dest_root


def snapshot_path(run_dir: str):
    """`<run_dir>/model_src` when a snapshot exists there, else None."""
    p = os.path.join(run_dir, "model_src")
    return p if os.path.isdir(os.path.join(p, "m3dssd_tpu")) else None
