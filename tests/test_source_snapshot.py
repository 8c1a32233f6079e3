"""Run-dir model-source snapshot (utils/source_snapshot.py).

Parity target: ref:lib/core.py:57-70 — the reference copies the model .py
into the run dir and test CLIs rebuild from the copy, so a checkpoint keeps
running with the code that trained it.
"""

import os
import subprocess
import sys

from m3dssd_tpu.utils.source_snapshot import snapshot_path, snapshot_source


def test_snapshot_copies_package(tmp_path):
    run = str(tmp_path / "run")
    os.makedirs(run)
    root = snapshot_source(run)
    assert root == os.path.join(run, "model_src")
    assert snapshot_path(run) == root
    import m3dssd_tpu
    live = os.path.dirname(os.path.abspath(m3dssd_tpu.__file__))
    for rel in ("__init__.py", "models/rpn.py", "ops/dcn.py", "config.py"):
        snap_f = os.path.join(root, "m3dssd_tpu", rel)
        assert os.path.exists(snap_f), rel
        with open(snap_f) as a, open(os.path.join(live, rel)) as b:
            assert a.read() == b.read(), rel
    # no bytecode caches in the snapshot
    for dirpath, dirnames, _ in os.walk(root):
        assert "__pycache__" not in dirnames or dirpath  # pruned by ignore
        assert "__pycache__" not in os.path.basename(dirpath)
    assert snapshot_path(str(tmp_path)) is None  # no snapshot there


def test_snapshot_import_wins_over_live_package(tmp_path):
    """Mutating the SNAPSHOT and importing through it must resolve to the
    snapshot's code — the mechanism scripts/test.py relies on to reproduce
    the training-time forward after a live-tree refactor."""
    run = str(tmp_path / "run")
    os.makedirs(run)
    root = snapshot_source(run)
    marker = os.path.join(root, "m3dssd_tpu", "__init__.py")
    with open(marker, "a") as f:
        f.write("\n__snapshot_marker__ = 'training-time-code'\n")
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import m3dssd_tpu\n"
        "assert m3dssd_tpu.__file__.startswith(%r), m3dssd_tpu.__file__\n"
        "assert m3dssd_tpu.__snapshot_marker__ == 'training-time-code'\n"
        "from m3dssd_tpu.geometry import convert_alpha_to_rot\n"
        "print('snapshot import ok')\n" % (root, root))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env,
                         cwd=str(tmp_path))   # away from the repo root
    assert out.returncode == 0, out.stderr
    assert "snapshot import ok" in out.stdout


def test_snapshot_import_keeps_native_eval(tmp_path):
    """A snapshot import must still reach the repo's native C++ eval
    kernels: the snapshot carries only the Python package, so eval/native
    honors M3DSSD_NATIVE_DIR (set by scripts/test.py) — without it the
    KITTI eval would silently drop to the pure-Python matcher."""
    import m3dssd_tpu
    repo = os.path.dirname(os.path.dirname(os.path.abspath(
        m3dssd_tpu.__file__)))
    native_dir = os.path.join(repo, "native")
    if not os.path.isdir(native_dir):
        import pytest
        pytest.skip("repo-level native/ not present")
    run = str(tmp_path / "run")
    os.makedirs(run)
    root = snapshot_source(run)
    code = (
        "import os, sys; sys.path.insert(0, %r)\n"
        "import m3dssd_tpu\n"
        "assert m3dssd_tpu.__file__.startswith(%r), m3dssd_tpu.__file__\n"
        "from m3dssd_tpu.eval import native\n"
        "assert native._SRC_DIR == %r, native._SRC_DIR\n"
        "print('native dir ok')\n" % (root, root, native_dir))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               M3DSSD_NATIVE_DIR=native_dir)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr
    assert "native dir ok" in out.stdout
