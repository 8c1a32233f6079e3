"""KITTI test driver: run detection over a dataset, write result files,
optionally evaluate.

Re-derivation of ref:lib/rpn_util.py:1754-1960 (`test_kitti_3d`): per image,
detect -> score-threshold -> alpha->rotY via the back-projected ray ->
hill-climb refine -> back-project center -> KITTI result line; then the
AP11/AP-R40 evaluation.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import numpy as np

from .. import geometry as geo
from .hill_climb import hill_climb


def write_kitti_result(path, dets_rows):
    """dets_rows: list of dicts with KITTI fields."""
    lines = []
    for r in dets_rows:
        lines.append(
            ("{cls} -1 -1 {alpha:.6f} {x1:.6f} {y1:.6f} {x2:.6f} {y2:.6f} "
             "{h3d:.6f} {w3d:.6f} {l3d:.6f} {x3d:.6f} {y3d:.6f} {z3d:.6f} "
             "{ry3d:.6f} {score:.6f}").format(**r))
    with open(path, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))


def postprocess_dets(conf, dets: np.ndarray, p2: np.ndarray,
                     p2_inv: np.ndarray):
    """Host post-processing for one image's detection table [K,14]
    (columns per inference.detect.DET_COLS). Returns KITTI result rows."""
    dets = np.asarray(dets, dtype=np.float64)
    valid = dets[:, 4] >= conf.score_thres
    dets = dets[valid]
    if dets.shape[0] == 0:
        return []

    x1, y1, x2, y2 = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3]
    score, cls_ind = dets[:, 4], dets[:, 5].astype(int)
    x3d_2d, y3d_2d, z3d = dets[:, 6], dets[:, 7], dets[:, 8]
    w3d, h3d, l3d, alpha_dec = dets[:, 9], dets[:, 10], dets[:, 11], dets[:, 12]

    # the decoded rotation is alpha; convert to rotY on the back-projected
    # ray (ref:lib/rpn_util.py:1827-1828)
    coord3d = geo.backproject(p2_inv, x3d_2d, y3d_2d, z3d)
    ry3d = geo.convert_alpha_to_rot(alpha_dec, coord3d[:, 2], coord3d[:, 0])

    if conf.hill_climbing:
        box2d_xyxy = np.stack([x1, y1, x2, y2], axis=1)
        z3d, ry3d = hill_climb(p2, p2_inv, box2d_xyxy, x3d_2d, y3d_2d, z3d,
                               w3d, h3d, l3d, ry3d,
                               step_r_init=0.3 * np.pi, r_lim=0.01)

    # final back-projection and bottom-center restore (ref::1839-1846)
    coord3d = geo.backproject(p2_inv, x3d_2d, y3d_2d, z3d)
    alpha = geo.convert_rot_to_alpha(ry3d, coord3d[:, 2], coord3d[:, 0])
    x3d = coord3d[:, 0]
    y3d = coord3d[:, 1] + h3d / 2
    z3d_out = coord3d[:, 2]

    rows = []
    for i in range(dets.shape[0]):
        rows.append(dict(
            cls=conf.lbls[cls_ind[i] - 1], alpha=alpha[i],
            x1=x1[i], y1=y1[i], x2=x2[i], y2=y2[i],
            h3d=h3d[i], w3d=w3d[i], l3d=l3d[i],
            x3d=x3d[i], y3d=y3d[i], z3d=z3d_out[i],
            ry3d=ry3d[i], score=score[i]))
    return rows


def _run_batched(dataset, detect_fn, params, batch_stats, conf,
                 results_path: str, batch_size: int, pack=lambda im: im,
                 prefetch_workers: int = 8, write=write_kitti_result):
    """Batched eval loop: threaded per-image load+pack prefetch +
    double-buffered device dispatch (post-process batch k while batch k+1
    computes).

    The per-image host work — image decode/resize/normalize (~55 ms) and
    the space-to-depth pack (~15-50 ms, cache-hostile transpose) — runs in
    the worker pool; the main thread only concatenates, transfers
    (explicit device_put: ~1.3 GB/s) and dispatches. At 512x1760 this
    end-to-end loop measured 2.4 -> ~25 im/s vs the main-thread form.
    """
    from concurrent.futures import ThreadPoolExecutor

    import jax

    n = len(dataset)
    B = batch_size

    def _load(i):
        s = dataset[i]
        return (pack(s["input"][None]),
                np.float32(s["meta"]["scale_factor"]), s["meta"])

    def _flush(pending):
        out, metas = pending
        arr = np.asarray(out)          # blocks on the device result
        if write is None:              # non-primary multi-host process
            return
        for j, meta in enumerate(metas):
            rows = postprocess_dets(conf, arr[j], meta["p2"],
                                    np.linalg.inv(meta["p2"]))
            write(os.path.join(results_path, meta["id"] + ".txt"), rows)

    from collections import deque

    with ThreadPoolExecutor(max_workers=prefetch_workers) as pool:
        # bounded submit window: keep at most ~2 batches of futures in
        # flight so decoded+packed images never buffer unboundedly when the
        # workers outpace the device consumer (pool.map would submit all n
        # upfront -> multi-GB RSS on a full val split)
        window = max(2 * B, prefetch_workers + 1)
        futures = deque(pool.submit(_load, i) for i in range(min(window, n)))
        next_i = len(futures)

        def loaded():
            nonlocal next_i
            while futures:
                f = futures.popleft()
                if next_i < n:
                    futures.append(pool.submit(_load, next_i))
                    next_i += 1
                yield f.result()

        pending = None
        ims, sfs, metas = [], [], []
        for k, (im, sf, meta) in enumerate(loaded()):
            ims.append(im)
            sfs.append(sf)
            metas.append(meta)
            if len(ims) == B or k == n - 1:
                while len(ims) < B:            # pad the tail batch
                    ims.append(ims[-1])
                    sfs.append(sfs[-1])
                # mesh-sharded detectors publish their input shardings
                # (inference.detect.make_batch_detector(mesh=...));
                # put_global handles meshes that span processes
                from ..parallel.mesh import put_global
                imb = put_global(np.concatenate(ims, axis=0),
                                 getattr(detect_fn, "input_sharding", None))
                sfb = put_global(np.asarray(sfs, np.float32),
                                 getattr(detect_fn, "sf_sharding", None))
                out = detect_fn(params, batch_stats, imb, sfb)
                if pending is not None:
                    _flush(pending)
                pending = (out, metas)
                ims, sfs, metas = [], [], []
        if pending is not None:
            _flush(pending)


def test_kitti_3d(dataset, detect_fn, params, batch_stats, conf,
                  results_path: str, gt_path: Optional[str] = None,
                  evaluate: bool = True, batch_size: int = 1,
                  packed_input: bool = False):
    """Run detection over `dataset` (eval phase), write KITTI txts, and
    compute AP metrics against `gt_path` labels.

    With `batch_size > 1`, `detect_fn` must be a batch detector
    (`inference.detect.make_batch_detector`): images are batched (tail batch
    padded by repetition — AP-neutral, padded rows are dropped), host
    preprocessing is prefetched on threads, and host post-processing of batch
    k overlaps device compute of batch k+1 (JAX dispatch is async). The
    reference evaluates strictly bs=1 host-driven
    (ref:lib/dataloader.py:906) — this is the throughput weakness the
    rebuild removes.

    Returns (results dict or None, mean Car 3D AP-R40 selection metric).

    Multi-process (jax.process_count() > 1): every process runs the device
    work (a mesh-sharded detector's collectives need all of them), but ONLY
    process 0 writes result txts and computes AP — shared-filesystem pods
    would otherwise race on the same files. The selection metric is then
    BROADCAST from process 0 so every process returns the same value and
    the trainer's best-model branch (whose orbax save syncs globally) is
    taken uniformly; the results dict stays None off-primary.
    """
    import jax
    primary = jax.process_index() == 0
    write = write_kitti_result if primary else None
    if primary:
        os.makedirs(results_path, exist_ok=True)
    t0 = time.time()
    n = len(dataset)
    # packed_input: the detector was built with packed_input=True — feed
    # host-side space-to-depth packed images (free exact relayout).
    # bf16 models additionally upload images in bf16: the model casts its
    # input to bf16 anyway, so casting host-side is compute-identical and
    # halves the host->device bytes (the transfer is CPU-bound on
    # single-core tunnel hosts).
    if packed_input:
        from ..models.dla import space_to_depth_np
        base_pack = space_to_depth_np
    else:
        base_pack = lambda im: im
    if getattr(conf, "compute_dtype", "float32") == "bfloat16":
        import ml_dtypes
        pack = lambda im: base_pack(im).astype(ml_dtypes.bfloat16)
    else:
        pack = base_pack

    if batch_size <= 1:
        for i in range(n):
            sample = dataset[i]
            im = pack(sample["input"][None])
            meta = sample["meta"]
            dets = np.asarray(detect_fn(params, batch_stats, im,
                                        np.float32(meta["scale_factor"])))
            if write is not None:
                rows = postprocess_dets(conf, dets, meta["p2"],
                                        np.linalg.inv(meta["p2"]))
                write(os.path.join(results_path, meta["id"] + ".txt"), rows)
    else:
        _run_batched(dataset, detect_fn, params, batch_stats, conf,
                     results_path, batch_size, pack, write=write)
    dt = time.time() - t0
    logging.info("test_kitti_3d: %d images in %.1fs (%.2f im/s)", n, dt,
                 n / max(dt, 1e-9))

    multiproc = jax.process_count() > 1
    if multiproc:
        # step-align before the primary's host-side AP pass
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("test_kitti_3d_done")

    res, sel = None, 0.0
    if primary and evaluate and gt_path:
        from ..eval.kitti_eval import evaluate_kitti
        res = evaluate_kitti(gt_path, results_path, classes=conf.lbls)
        sel = float(np.mean(res.get("Car_3d_R40", [0.0, 0.0, 0.0])))
    if multiproc:
        from jax.experimental import multihost_utils
        sel = float(multihost_utils.broadcast_one_to_all(
            np.float32(sel)))
    return res, sel
