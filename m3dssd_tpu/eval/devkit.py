"""Wrapper around the standalone devkit-protocol C++ oracle.

`native/devkit_eval.cpp` is an independent from-scratch implementation of the
official KITTI devkit protocol (ref:kitti_split1/devkit/cpp/
evaluate_object.cpp:41-944) — separate code path from `kitti_eval.py` /
`m3deval.cpp` (different polygon clipper, own parser and matching loop), so
it cross-checks the eval engine against something that is not the same
re-derivation. Built on demand with make; binary invoked as a subprocess.
"""

from __future__ import annotations

import logging
import os
import subprocess
from typing import Dict, List, Optional

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
# see eval/native.py: M3DSSD_NATIVE_DIR keeps the C++ tooling reachable
# when the package is imported from a run-dir source snapshot
_SRC_DIR = os.environ.get("M3DSSD_NATIVE_DIR") or os.path.join(_ROOT,
                                                               "native")
_BIN = os.path.join(_SRC_DIR, "build", "devkit_eval")


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _SRC_DIR], check=True,
                       capture_output=True, text=True)
        return True
    except Exception as e:  # noqa: BLE001
        logging.warning("devkit oracle build failed: %s", e)
        return False


def available() -> bool:
    if not os.path.exists(_BIN) or (
            os.path.getmtime(_BIN) <
            os.path.getmtime(os.path.join(_SRC_DIR, "devkit_eval.cpp"))):
        return _build()
    return True


def evaluate(gt_dir: str, dt_dir: str) -> Dict[str, List[float]]:
    """Run the oracle. Returns {'<Class>_<metric>': [e,m,h], ...} with
    metric in {image, ground, box3d, aos} and both AP11 ('' suffix) and
    AP-R40 ('_R40' suffix) entries — key style matches
    `kitti_eval.evaluate_kitti` (with 'ground'/'box3d' instead of
    'bev'/'3d')."""
    if not available():
        raise RuntimeError("devkit oracle unavailable (no C++ toolchain?)")
    proc = subprocess.run([_BIN, gt_dir, dt_dir], check=True,
                          capture_output=True, text=True)
    out: Dict[str, List[float]] = {}
    for line in proc.stdout.splitlines():
        parts = line.split()
        if len(parts) != 8:
            continue
        cname, metric = parts[0], parts[1]
        vals = [float(v) for v in parts[2:]]
        out[f"{cname}_{metric}"] = vals[0:3]
        out[f"{cname}_{metric}_R40"] = vals[3:6]
    return out
