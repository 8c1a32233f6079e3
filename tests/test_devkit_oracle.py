"""Cross-check the eval engine against the independent devkit-protocol
C++ oracle (native/devkit_eval.cpp).

The oracle is a from-scratch implementation of the official KITTI devkit
protocol (separate parser, polygon clipper, and matching loop), so agreement
here validates `m3dssd_tpu/eval` against something that is NOT the same
re-derivation. Runs on the committed golden fixtures and on a randomized
multi-class scene with rotated boxes, ignores, DontCares and false
positives.
"""

import os

import numpy as np
import pytest

from m3dssd_tpu.eval import devkit
from m3dssd_tpu.eval.kitti_eval import evaluate_kitti

HERE = os.path.dirname(os.path.abspath(__file__))

pytestmark = pytest.mark.skipif(not devkit.available(),
                                reason="C++ toolchain unavailable")

# kitti_eval key -> devkit key metric name
METRIC_MAP = {"image": "image", "bev": "ground", "3d": "box3d", "aos": "aos"}


def _compare(gt_dir, dt_dir, classes=("Car",), atol=1e-6):
    ours = evaluate_kitti(gt_dir, dt_dir, classes=list(classes))
    oracle = devkit.evaluate(gt_dir, dt_dir)
    compared = 0
    for cname in classes:
        for m_ours, m_dk in METRIC_MAP.items():
            for suffix in ["", "_R40"]:
                k_ours = f"{cname}_{m_ours}{suffix}"
                k_dk = f"{cname}_{m_dk}{suffix}"
                if k_ours not in ours or k_dk not in oracle:
                    continue
                np.testing.assert_allclose(
                    ours[k_ours], oracle[k_dk], atol=atol,
                    err_msg=f"{k_ours} vs devkit {k_dk}")
                compared += 1
    assert compared > 0
    return compared


@pytest.mark.parametrize("case", ["perfect", "partial"])
def test_oracle_matches_on_golden(case):
    base = os.path.join(HERE, "golden_ap", case)
    n = _compare(os.path.join(base, "gt"), os.path.join(base, "dt"))
    assert n >= 8  # image/bev/3d/aos x AP11/R40


def _write_scene(tmp_path, seed=11, num_images=6):
    """Randomized KITTI scene: rotated 3D boxes, 3 classes + Van +
    DontCare, occlusion/truncation variety, jittered detections + FPs."""
    rng = np.random.default_rng(seed)
    gt_dir = tmp_path / "gt"
    dt_dir = tmp_path / "dt"
    gt_dir.mkdir()
    dt_dir.mkdir()
    names = ["Car", "Pedestrian", "Cyclist", "Van"]

    def line(name, trunc, occ, alpha, box, hwl, loc, ry, score=None):
        s = (f"{name} {trunc:.2f} {occ} {alpha:.4f} "
             f"{box[0]:.2f} {box[1]:.2f} {box[2]:.2f} {box[3]:.2f} "
             f"{hwl[0]:.2f} {hwl[1]:.2f} {hwl[2]:.2f} "
             f"{loc[0]:.2f} {loc[1]:.2f} {loc[2]:.2f} {ry:.4f}")
        if score is not None:
            s += f" {score:.6f}"
        return s

    for i in range(num_images):
        gts, dts = [], []
        for j in range(rng.integers(2, 7)):
            name = names[rng.integers(0, len(names))]
            h2d = float(rng.uniform(20, 120))
            x0 = float(rng.uniform(0, 1100))
            y0 = float(rng.uniform(0, 250))
            box = [x0, y0, x0 + h2d * rng.uniform(0.8, 2.5), y0 + h2d]
            occ = int(rng.integers(0, 3))
            trunc = float(rng.uniform(0, 0.4))
            hwl = [float(rng.uniform(1.2, 2.0)), float(rng.uniform(0.5, 1.9)),
                   float(rng.uniform(1.0, 4.5))]
            loc = [float(rng.uniform(-20, 20)), float(rng.uniform(1.0, 2.2)),
                   float(rng.uniform(5, 60))]
            ry = float(rng.uniform(-np.pi, np.pi))
            alpha = float(rng.uniform(-np.pi, np.pi))
            gts.append(line(name, trunc, occ, alpha, box, hwl, loc, ry))

            if rng.random() < 0.8:  # matched-ish detection (jittered)
                jbox = [b + float(rng.normal(0, 2.0)) for b in box]
                jloc = [l + float(rng.normal(0, 0.15)) for l in loc]
                jhwl = [max(d + float(rng.normal(0, 0.05)), 0.3) for d in hwl]
                jry = ry + float(rng.normal(0, 0.08))
                jalpha = alpha + float(rng.normal(0, 0.1))
                dts.append(line(name, 0.0, 0, jalpha, jbox, jhwl, jloc, jry,
                                score=float(rng.uniform(0.3, 1.0))))
        # DontCare region
        if rng.random() < 0.5:
            x0 = float(rng.uniform(0, 1100))
            gts.append(line("DontCare", -1, -1, -10,
                            [x0, 150, x0 + 80, 220], [-1, -1, -1],
                            [-1000, -1000, -1000], -10))
        # false positives
        for _ in range(rng.integers(0, 3)):
            h2d = float(rng.uniform(25, 90))
            x0 = float(rng.uniform(0, 1100))
            y0 = float(rng.uniform(0, 250))
            dts.append(line(names[rng.integers(0, 3)], 0.0, 0,
                            float(rng.uniform(-np.pi, np.pi)),
                            [x0, y0, x0 + h2d * 1.5, y0 + h2d],
                            [1.5, 1.6, 3.9],
                            [float(rng.uniform(-20, 20)), 1.6,
                             float(rng.uniform(5, 60))],
                            float(rng.uniform(-np.pi, np.pi)),
                            score=float(rng.uniform(0.3, 1.0))))
        (gt_dir / f"{i:06d}.txt").write_text("\n".join(gts) + "\n")
        (dt_dir / f"{i:06d}.txt").write_text("\n".join(dts) + "\n")
    return str(gt_dir), str(dt_dir)


@pytest.mark.parametrize("seed", [11, 29])
def test_oracle_matches_on_random_scene(tmp_path, seed):
    gt_dir, dt_dir = _write_scene(tmp_path, seed=seed)
    n = _compare(gt_dir, dt_dir, classes=("Car", "Pedestrian", "Cyclist"))
    assert n >= 12
