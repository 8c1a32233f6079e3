"""Generate the committed golden AP fixtures (run once; outputs are committed).

Two scenarios with ANALYTICALLY derivable AP11 / AP-R40 values under the
KITTI protocol (ref:lib/eval/eval.py:448-566) so the eval engine is pinned
against hand-derived numbers, not self-consistency:

perfect/
    41 disjoint Car gts in one image; 41 detections identical to the gts
    with distinct descending scores. Every threshold pass has precision 1 at
    all 41 recall points => AP11 = AP-R40 = 100 exactly (bbox/BEV/3D/AOS).

partial/
    4 disjoint Car gts; detections:
        d1 == g1, score 0.9   (TP)
        d2 == g2, score 0.8   (TP)
        d3 disjoint,   0.85   (FP once thresh <= 0.85)
    Matched-TP scores -> thresholds [0.9, 0.8] (get_thresholds, num_gt=4):
        t=0.9: tp=1 fp=0 (d3,d2 below thresh) -> precision 1,   recall 1/4
        t=0.8: tp=2 fp=1 (d3 now counted)     -> precision 2/3, recall 1/2
    After the monotone envelope: prec = [1, 2/3, 0, ...].
        AP11  = prec[0]/11*100          = 100/11 = 9.0909...
        AP-R40 = prec[1]/40*100         = 5/3    = 1.6666...
    Same numbers for bbox, BEV, 3D (exact-duplicate boxes, IoU=1) and AOS
    (dt alpha == gt alpha -> per-TP similarity 1, AOS curve == precision).

All boxes are 100 px tall (>= MIN_HEIGHT for every difficulty), truncation 0,
occlusion 0 => easy == moderate == hard.
"""

import os

HERE = os.path.dirname(os.path.abspath(__file__))

ALPHA = 0.5
DIMS = (1.5, 1.6, 3.9)        # h, w, l
RY = 0.3


def box_line(x0, y0, loc, score=None):
    """One KITTI label line: 100x100 px 2D box at (x0, y0), 3D box at loc."""
    h, w, l = DIMS
    x, y, z = loc
    f = (f"Car 0.00 0 {ALPHA:.2f} "
         f"{x0:.2f} {y0:.2f} {x0 + 100:.2f} {y0 + 100:.2f} "
         f"{h:.2f} {w:.2f} {l:.2f} {x:.2f} {y:.2f} {z:.2f} {RY:.2f}")
    if score is not None:
        f += f" {score:.4f}"
    return f


def write(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + ("\n" if lines else ""))


def gt_slot(i):
    """Disjoint 2D + 3D placements per index."""
    x0 = (i % 8) * 150.0
    y0 = (i // 8) * 150.0
    loc = (float(i) * 10.0, 1.6, 8.0 + (i // 8) * 30.0)
    return x0, y0, loc


def main():
    # ---------------------------------------------------------------- perfect
    gts, dts = [], []
    for i in range(41):
        x0, y0, loc = gt_slot(i)
        gts.append(box_line(x0, y0, loc))
        dts.append(box_line(x0, y0, loc, score=0.99 - 0.01 * i))
    write(os.path.join(HERE, "perfect", "gt", "000000.txt"), gts)
    write(os.path.join(HERE, "perfect", "dt", "000000.txt"), dts)

    # ---------------------------------------------------------------- partial
    gts = []
    for i in range(4):
        x0, y0, loc = gt_slot(i)
        gts.append(box_line(x0, y0, loc))
    x0, y0, loc = gt_slot(0)
    d1 = box_line(x0, y0, loc, score=0.9)
    x0, y0, loc = gt_slot(1)
    d2 = box_line(x0, y0, loc, score=0.8)
    x0, y0, loc = gt_slot(20)     # far from every gt: 2D and 3D disjoint
    d3 = box_line(x0, y0 + 2000.0, (loc[0] + 500.0, loc[1], loc[2]), score=0.85)
    write(os.path.join(HERE, "partial", "gt", "000000.txt"), gts)
    write(os.path.join(HERE, "partial", "dt", "000000.txt"), [d1, d2, d3])


if __name__ == "__main__":
    main()
