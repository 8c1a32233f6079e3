"""Tests for the small parity utilities: stats protocol (ref:lib/core.py:
514-668), logging/pretty-print/ETA (ref:lib/util.py:32-166), drawing
(ref:lib/util.py:293-345), and the split setup script
(ref:kitti_split1/setup_split.py:25-135)."""

import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from m3dssd_tpu.utils.logging_utils import (StatTracker, compute_eta,
                                            init_logging, pretty_print)


class _FakeWriter:
    def __init__(self):
        self.scalars = []

    def add_scalar(self, tag, value, step):
        self.scalars.append((tag, value, step))


def test_stat_tracker_means_and_flush():
    tr = StatTracker(writer=_FakeWriter(), prefix="Train")
    tr.update({"loss": 2.0, "acc": 0.5})
    tr.update({"loss": 4.0, "acc": 1.0})
    m = tr.means()
    assert m["loss"] == 3.0 and m["acc"] == 0.75

    msg = tr.flush(step=7, extra="epoch 1")
    assert "step 7" in msg and "loss=3.0000" in msg
    # flush writes the means to the writer and clears the accumulator
    assert ("Train/loss", 3.0, 7) in tr.writer.scalars
    assert tr.means() == {}


def test_stat_tracker_defers_float_conversion():
    """Values are held as-is until flush: float() on a device buffer every
    step would block the async dispatch pipeline (see StatTracker docstring).
    """

    class Lazy:
        converted = 0

        def __float__(self):
            Lazy.converted += 1
            return 1.5

    tr = StatTracker()
    tr.update({"loss": Lazy()})
    tr.update({"loss": Lazy()})
    assert Lazy.converted == 0          # nothing synced yet
    assert tr.means()["loss"] == 1.5
    assert Lazy.converted == 2


def test_pretty_print_truncation_and_arrays():
    d = {"lr": 0.004, "long": "x" * 200, "arr": np.zeros((3, 4), np.float32)}
    s = pretty_print("conf", d, val_width=40)
    lines = s.splitlines()
    assert lines[0] == lines[-1] and set(lines[0]) == {"-"}   # bar top+bottom
    body = lines[1:-1]
    assert len(body) == 3
    assert any("conf.lr" in l and "0.004" in l for l in body)
    assert any(l.endswith("...") for l in body)               # truncated
    assert any("ndarray(3, 4)" in l and "float32" in l for l in body)
    # keys are left-aligned to a common width: ':' column is shared
    cols = {l.index(" : ") for l in body}
    assert len(cols) == 1


def test_compute_eta():
    import time
    eta, dt = compute_eta(time.time() - 10.0, idx=10, total=20)
    assert dt > 0.9 and eta.endswith("s") and "h" in eta and "m" in eta


def test_init_logging_writes_file(tmp_path):
    log_file = str(tmp_path / "log" / "run.log")
    init_logging(log_file)
    logging.info("hello-parity")
    for h in logging.getLogger().handlers:
        h.flush()
    with open(log_file) as f:
        assert "hello-parity" in f.read()
    # restore a sane default for later tests
    init_logging(None)


def test_draw_2d_and_3d_box():
    from m3dssd_tpu.utils.drawing import draw_2d_box, draw_3d_box

    im = np.zeros((100, 120, 3), np.uint8)
    draw_2d_box(im, [10, 20, 30, 40], color=(0, 255, 0), thickness=1)
    assert im[20, 10:40, 1].all()        # top edge drawn
    assert im[20:60, 10, 1].all()        # left edge drawn
    assert not im[40, 25].any()          # interior untouched

    p2 = np.array([[700.0, 0, 60, 0],
                   [0, 700.0, 50, 0],
                   [0, 0, 1.0, 0],
                   [0, 0, 0, 1.0]])
    im3 = np.zeros((100, 120, 3), np.uint8)
    draw_3d_box(im3, p2, x3d=0.0, y3d=0.0, z3d=20.0, w3d=1.6, h3d=1.5,
                l3d=3.9, ry3d=0.3)
    assert im3.any()                     # wireframe landed on the canvas

    # a box behind the camera is skipped entirely
    im4 = np.zeros((100, 120, 3), np.uint8)
    draw_3d_box(im4, p2, x3d=0.0, y3d=0.0, z3d=-5.0, w3d=1.6, h3d=1.5,
                l3d=3.9, ry3d=0.3)
    assert not im4.any()


def test_draw_bev():
    from m3dssd_tpu.utils.drawing import draw_bev

    empty = draw_bev()
    box = draw_bev(boxes3d=[[0.0, 20.0, 1.6, 3.9, 0.4]])
    assert box.shape == (600, 600, 3) and box.dtype == np.uint8
    # the green box polyline adds pixels the empty canvas doesn't have
    assert (box[..., 1] > empty[..., 1]).sum() > 0


def _make_fake_kitti(root, ids):
    for sub, ext in (("calib", ".txt"), ("image_2", ".png"),
                     ("label_2", ".txt")):
        d = os.path.join(root, "training", sub)
        os.makedirs(d, exist_ok=True)
        for i in ids:
            with open(os.path.join(d, i + ext), "w") as f:
                f.write(f"{sub}:{i}\n")


def test_setup_split(tmp_path, monkeypatch):
    """End-to-end: ids are renumbered sequentially per split and symlink to
    the right source files (ref:kitti_split1/setup_split.py:25-135)."""
    kitti = str(tmp_path / "kitti")
    out = str(tmp_path / "data")
    ids = ["000003", "000007", "000010"]
    _make_fake_kitti(kitti, ids)

    with open(tmp_path / "train.txt", "w") as f:
        f.write("000007\n000003\n")
    with open(tmp_path / "val.txt", "w") as f:
        f.write("000010\n\n")            # blank lines are skipped

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "setup_split", os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "setup_split.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", [
        "setup_split.py", "--kitti", kitti, "--out", out,
        "--train_ids", str(tmp_path / "train.txt"),
        "--val_ids", str(tmp_path / "val.txt")])
    mod.main()

    tr = os.path.join(out, "kitti_split1", "training")
    va = os.path.join(out, "kitti_split1", "validation")
    # renumbered 000000/000001 in train-list order
    assert os.path.islink(os.path.join(tr, "calib", "000000.txt"))
    with open(os.path.join(tr, "calib", "000000.txt")) as f:
        assert f.read() == "calib:000007\n"
    with open(os.path.join(tr, "image_2", "000001.png")) as f:
        assert f.read() == "image_2:000003\n"
    assert sorted(os.listdir(os.path.join(tr, "label_2"))) == [
        "000000.txt", "000001.txt"]
    with open(os.path.join(va, "label_2", "000000.txt")) as f:
        assert f.read() == "label_2:000010\n"
    assert len(os.listdir(os.path.join(va, "calib"))) == 1

    # idempotent: re-linking over existing links succeeds
    mod.main()
    assert os.path.islink(os.path.join(tr, "calib", "000000.txt"))
