"""Golden AP fixtures: the eval engine pinned to hand-derived values.

The committed gt/dt txts in tests/golden_ap/ have ANALYTICALLY derivable
AP11 / AP-R40 under the KITTI protocol (derivation in
tests/golden_ap/make_fixture.py) — so AP correctness no longer rests on
python-vs-native self-consistency alone. Both the python path and the native
C++ path must reproduce the exact numbers.
"""

import os

import numpy as np
import pytest

from m3dssd_tpu.eval import kitti_eval
from m3dssd_tpu.eval import native as native_mod

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden_ap")

# partial/: thresholds [0.9, 0.8] -> precision envelope [1, 2/3, 0, ...]
AP11_PARTIAL = 100.0 / 11.0          # = prec[0] / 11 * 100
R40_PARTIAL = (2.0 / 3.0) / 40 * 100  # = prec[1] / 40 * 100

CASES = [
    ("perfect", 100.0, 100.0),
    ("partial", AP11_PARTIAL, R40_PARTIAL),
]


def _run(case, use_native, monkeypatch):
    if use_native and not native_mod.available():
        pytest.skip("native eval library not built")
    if not use_native:
        monkeypatch.setattr(native_mod, "available", lambda: False)
    gt = os.path.join(HERE, case, "gt")
    dt = os.path.join(HERE, case, "dt")
    return kitti_eval.evaluate_kitti(gt, dt, classes=["Car"])


@pytest.mark.parametrize("use_native", [False, True],
                         ids=["python", "native"])
@pytest.mark.parametrize("case,ap11,r40", CASES)
def test_golden_ap(case, ap11, r40, use_native, monkeypatch):
    res = _run(case, use_native, monkeypatch)
    # bbox / BEV / 3D identical by construction (exact-duplicate boxes);
    # AOS == bbox (dt alpha == gt alpha); easy == moderate == hard
    for metric in ["image", "bev", "3d", "aos"]:
        got11 = res[f"Car_{metric}"]
        got40 = res[f"Car_{metric}_R40"]
        np.testing.assert_allclose(got11, [ap11] * 3, atol=1e-9,
                                   err_msg=f"{case}/{metric}/AP11")
        np.testing.assert_allclose(got40, [r40] * 3, atol=1e-9,
                                   err_msg=f"{case}/{metric}/R40")


def test_fixture_is_regenerable(tmp_path):
    """The committed txts match their generator (provenance check)."""
    import shutil
    import subprocess
    import sys

    gen_dir = tmp_path / "golden_ap"
    os.makedirs(gen_dir, exist_ok=True)
    shutil.copy(os.path.join(HERE, "make_fixture.py"),
                str(gen_dir / "make_fixture.py"))
    subprocess.run([sys.executable, str(gen_dir / "make_fixture.py")],
                   check=True)
    for case in ["perfect", "partial"]:
        for kind in ["gt", "dt"]:
            a = os.path.join(HERE, case, kind, "000000.txt")
            b = gen_dir / case / kind / "000000.txt"
            assert open(a).read() == open(b).read(), (case, kind)
