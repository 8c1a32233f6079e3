"""Single-image 3D detection: decode + top-k + NMS, fully on device.

Re-derivation of ref:lib/rpn_util.py:1416-1563 (`im_detect_3d`) as one jitted
function with static shapes: everything from the network forward through NMS
runs on the TPU; only the tiny [top_post, 14] detection table returns to host
(the reference round-trips 3000 boxes through numpy for its CUDA NMS).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import bbox_transform_inv_t, decode_bbox_3d_t
from ..ops.nms import nms_bitmask_select_t, nms_select_t


def _nms_cfg(conf):
    """(stop_below, use_bitmask) NMS-variant knobs (config.py).

    stop_below = conf.score_thres when nms_score_stop is on: the driver
    (test_driver.postprocess_dets) drops rows below score_thres before any
    downstream use, so ending the sequential selection there is exact.
    """
    thresh = float(getattr(conf, "score_thres", 0.0))
    stop = thresh if (getattr(conf, "nms_score_stop", False)
                      and thresh > 0.0) else None
    return stop, bool(getattr(conf, "nms_bitmask", False))

# detection table columns (matches ref aboxes layout :1550)
DET_COLS = ["x1", "y1", "x2", "y2", "score", "cls",
            "x3d", "y3d", "z3d", "w3d", "h3d", "l3d", "ry3d", "tracker"]


def _clip_dets_2d(box, scale_factor, test_scale):
    """Clamp post-NMS 2D boxes [4, K] (x1,y1,x2,y2 at ORIGINAL resolution)
    to the original image bounds (ref:lib/rpn_util.py:1556-1561 — the
    reference clips AFTER NMS, so suppression itself sees unclipped IoUs).
    Original dims derive from the network input size / scale_factor."""
    im_h = test_scale[0] / scale_factor - 1.0
    im_w = test_scale[1] / scale_factor - 1.0
    return jnp.stack([jnp.clip(box[0], 0.0, im_w),
                      jnp.clip(box[1], 0.0, im_h),
                      jnp.clip(box[2], 0.0, im_w),
                      jnp.clip(box[3], 0.0, im_h)])


def _compact_above(scores, thresh: float, m: int):
    """First-m compaction of candidate indices with score >= thresh
    (ops/compact.py:first_m_true — shared with models/align.confident_topm).
    scores [N] -> (idx [m] int32 with sentinel N in unused slots,
    ok: scalar bool, count <= m)."""
    from ..ops.compact import first_m_true
    return first_m_true(scores >= thresh, m)


def _compact_positions(scores, A: int, thresh: float, m_pos: int):
    """Position-level first-m compaction: candidate ANCHOR indices of every
    anchor at positions where max-over-anchors score >= thresh.

    A cumsum over per-anchor flags ([N] = 507k at the flagship eval shape)
    measured 2.45 ms/step at bs=8 (19 log-passes); reducing over the A
    anchors first shrinks it 36x, and anchor expansion is index arithmetic.
    Positions below threshold contain ONLY sub-threshold anchors, so
    dropping them is exact under the same suppression-order argument as
    `_compact_above` (retained positions keep ALL their anchors, including
    sub-threshold ones — also harmless).

    scores [N] ((h,w,a) flat) -> (cand [m_pos*A] int32 anchor indices with
    sentinel N, ok: scalar bool)."""
    N = scores.shape[0]
    HW = N // A
    posmax = jnp.max(scores.reshape(HW, A), axis=-1)          # [HW]
    pos, ok = _compact_above(posmax, thresh, m_pos)           # sentinel HW
    cand = pos[:, None] * A + jnp.arange(A, dtype=jnp.int32)[None, :]
    cand = jnp.where(pos[:, None] < HW, cand, N)
    return cand.reshape(-1), ok


def _sparse_nms_cfg(conf, rois, use_topk_pre: bool = False):
    """(m_pos, A, thresh) for sparse pre-NMS compaction, or (0, _, _) when
    disabled. m_pos is the POSITION budget: conf.nms_sparse_topm candidate
    anchors / A anchors per position.

    Sound only when downstream consumers drop rows below conf.score_thres
    (the framework's test driver does — postprocess_dets): greedy NMS
    processes boxes in descending score order, so a sub-threshold candidate
    can never suppress an above-threshold one, and removing all of them
    leaves the surviving above-threshold set EXACTLY unchanged
    (config.py:nms_sparse_topm). Disabled under use_topk_pre (strict
    reference mode) and for non-positive thresholds."""
    m = int(getattr(conf, "nms_sparse_topm", 0))
    thresh = float(getattr(conf, "score_thres", 0.0))
    A = int(np.asarray(conf.anchors).shape[0])
    if use_topk_pre or thresh <= 0.0 or m <= 0:
        return 0, A, thresh
    m_pos = min(max(m // A, 16), rois.shape[0] // A)
    return m_pos, A, thresh


def packed_input_eligible(conf) -> bool:
    """True when eval images can be fed space-to-depth packed host-side
    (stem_s2d enabled and even eval dimensions)."""
    h, w = conf.test_scale
    return bool(getattr(conf, "stem_s2d", False) and h % 2 == 0
                and w % 2 == 0)


def make_detector(conf, rois: np.ndarray, model=None,
                  use_topk_pre: bool = False, packed_input: bool = False):
    """Build `detect(params, batch_stats, image, scale_factor) -> dets`.

    dets is a [nms_topN_post, 14] float32 array (DET_COLS); rows with
    score <= 0 are padding. `image` is [1, H, W, 3] preprocessed — or, with
    `packed_input`, its host-side space-to-depth relayout [1, H/2, W/2, 12]
    (models/dla.py:space_to_depth_np; saves the on-device pack copy).

    `use_topk_pre=False` (default) decodes ALL anchors and runs the
    select-style NMS directly — no pre-NMS top-k cutoff. The reference's
    top-3000 pre-filter (ref::1541-1544) is a GPU-memory optimization, not a
    semantic choice: skipping it considers a superset of candidates (equal or
    better recall) and avoids a full TPU sort (~20 ms + minutes of compile).
    Set True for strict reference behavior.
    """
    rois_t = jnp.asarray(rois[:, :5].T, jnp.float32)        # [5, N]
    means_c = jnp.asarray(conf.bbox_means, jnp.float32).reshape(-1)
    stds_c = jnp.asarray(conf.bbox_stds, jnp.float32).reshape(-1)
    top_pre = int(min(conf.nms_topN_pre, rois.shape[0]))
    top_post = int(conf.nms_topN_post)
    nms_thres = float(conf.nms_thres)
    clip_boxes = bool(getattr(conf, "clip_boxes", False))
    test_scale = tuple(int(s) for s in conf.test_scale)
    apply_fn = model.apply

    # per-roi anchor 3D priors are constants: fold the gather now
    tracker_np = rois[:, 4].astype(np.int32)
    src3d_t = jnp.asarray(np.asarray(conf.anchors)[tracker_np, 4:9].T,
                          jnp.float32)                      # [5, N]

    sparse_mpos, A, sparse_thresh = _sparse_nms_cfg(conf, rois, use_topk_pre)
    nms_stop, use_bitmask = _nms_cfg(conf)

    def _finish(top_scores, rk, sk, cls_k, d2, d3, scale_factor,
                bitmask: bool = False):
        coords_2d = bbox_transform_inv_t(rk, d2, means_c[0:4], stds_c[0:4])
        coords_3d = decode_bbox_3d_t(rk, d3, sk, means_c, stds_c)
        # rescale image-plane quantities to the original resolution
        coords_2d = coords_2d / scale_factor
        coords_3d = coords_3d.at[0:2].divide(scale_factor)

        # greedy NMS, keeping only the top_post survivors (exact: the first
        # `top_post` kept boxes of full greedy NMS)
        if bitmask:
            fi, valid = nms_bitmask_select_t(coords_2d, top_scores,
                                             nms_thres, top_post)
        else:
            fi, valid = nms_select_t(coords_2d, top_scores, nms_thres,
                                     top_post, stop_below=nms_stop)
        final_scores = jnp.where(valid, top_scores[fi], -1.0)
        final_2d = coords_2d[:, fi]
        if clip_boxes:
            final_2d = _clip_dets_2d(final_2d, scale_factor, test_scale)
        return jnp.concatenate([
            final_2d.T,
            final_scores[:, None],
            cls_k[fi].astype(jnp.float32)[:, None],
            coords_3d[:, fi].T,
            rk[4][fi][:, None],
        ], axis=1)

    @jax.jit
    def detect(params, batch_stats, image, scale_factor):
        out = apply_fn({"params": params, "batch_stats": batch_stats},
                       image, train=False, packed=packed_input)
        d2 = out["bbox_2d"][0].astype(jnp.float32)         # [4, N]
        d3 = out["bbox_3d"][0].astype(jnp.float32)         # [7, N]

        # score/class are computed inside the model in the conv-native
        # layout (models/rpn.py); reducing prob [N, C] here costs ~2 ms/img
        scores = out["scores"][0]
        cls_pred = out["cls_pred"][0]

        if use_topk_pre:
            top_scores, top_idx = jax.lax.top_k(scores, top_pre)
            rk = rois_t[:, top_idx]
            sk = src3d_t[:, top_idx]
            d2, d3 = d2[:, top_idx], d3[:, top_idx]
            cls_k = cls_pred[top_idx]
            return _finish(top_scores, rk, sk, cls_k, d2, d3, scale_factor)

        if sparse_mpos:
            idx, ok = _compact_positions(scores, A, sparse_thresh,
                                         sparse_mpos)

            def _sparse():
                sc = jnp.take(scores, idx, mode="fill", fill_value=-1.0)
                ck = jnp.take(cls_pred, idx, mode="fill", fill_value=0)
                rk = jnp.take(rois_t, idx, axis=1, mode="fill",
                              fill_value=0.0)
                sk = jnp.take(src3d_t, idx, axis=1, mode="fill",
                              fill_value=0.0)
                d2k = jnp.take(d2, idx, axis=1, mode="fill", fill_value=0.0)
                d3k = jnp.take(d3, idx, axis=1, mode="fill", fill_value=0.0)
                return _finish(sc, rk, sk, ck, d2k, d3k, scale_factor,
                               bitmask=use_bitmask)

            return jax.lax.cond(
                ok, _sparse,
                lambda: _finish(scores, rois_t, src3d_t, cls_pred, d2, d3,
                                scale_factor))

        return _finish(scores, rois_t, src3d_t, cls_pred, d2, d3,
                       scale_factor)

    return detect


def make_batch_detector(conf, rois: np.ndarray, model=None,
                        packed_input: bool = False, mesh=None,
                        follow_params_sharding: bool = False):
    """Batched variant: `detect(params, batch_stats, images [B,H,W,3],
    scale_factors [B]) -> dets [B, top_post, 14]`.

    The reference tests at batch 1 (ref:lib/dataloader.py:906); batching the
    eval forward is AP-neutral throughput (decode + NMS vmap across images).
    `packed_input`: images arrive space-to-depth packed [B, H/2, W/2, 12].

    `mesh`: a `jax.sharding.Mesh` (parallel.make_mesh) for multi-chip
    inference — the batch shards over the 'data' axis (B must divide by its
    size) and, on a 2-D ('data', 'spatial') mesh, each image's height
    additionally shards over 'spatial' (XLA inserts the conv halo
    exchanges; the per-image decode+NMS runs data-sharded). Params/stats
    are replicated; host inputs are placed automatically by the jit
    shardings (single-process meshes — multi-process callers should
    pre-place with parallel.shard_batch/replicate_state).

    `follow_params_sharding`: leave the params/batch_stats in_shardings
    unspecified so already-committed device arrays keep their placement —
    used when eval rides a tensor-parallel ('model'-axis) training mesh,
    where wide params are channel-sharded and forcing P() would all-gather
    them every call.
    """
    rois_t = jnp.asarray(rois[:, :5].T, jnp.float32)
    means_c = jnp.asarray(conf.bbox_means, jnp.float32).reshape(-1)
    stds_c = jnp.asarray(conf.bbox_stds, jnp.float32).reshape(-1)
    top_post = int(conf.nms_topN_post)
    nms_thres = float(conf.nms_thres)
    clip_boxes = bool(getattr(conf, "clip_boxes", False))
    test_scale = tuple(int(s) for s in conf.test_scale)
    apply_fn = model.apply

    tracker_np = rois[:, 4].astype(np.int32)
    src3d_t = jnp.asarray(np.asarray(conf.anchors)[tracker_np, 4:9].T,
                          jnp.float32)

    sparse_mpos, A, sparse_thresh = _sparse_nms_cfg(conf, rois)
    nms_stop, use_bitmask = _nms_cfg(conf)

    def _one(scores, cls_pred, rk, sk, d2, d3, scale_factor,
             bitmask: bool = False):
        coords_2d = bbox_transform_inv_t(rk, d2, means_c[0:4],
                                         stds_c[0:4]) / scale_factor
        coords_3d = decode_bbox_3d_t(rk, d3, sk, means_c, stds_c)
        coords_3d = coords_3d.at[0:2].divide(scale_factor)
        if bitmask:
            fi, valid = nms_bitmask_select_t(coords_2d, scores, nms_thres,
                                             top_post)
        else:
            fi, valid = nms_select_t(coords_2d, scores, nms_thres, top_post,
                                     stop_below=nms_stop)
        final_scores = jnp.where(valid, scores[fi], -1.0)
        final_2d = coords_2d[:, fi]
        if clip_boxes:
            final_2d = _clip_dets_2d(final_2d, scale_factor, test_scale)
        return jnp.concatenate([
            final_2d.T, final_scores[:, None],
            cls_pred[fi].astype(jnp.float32)[:, None],
            coords_3d[:, fi].T, rk[4][fi][:, None]], axis=1)

    def detect(params, batch_stats, images, scale_factors):
        out = apply_fn({"params": params, "batch_stats": batch_stats},
                       images, train=False, packed=packed_input)
        scores = out["scores"]                             # [B, N]
        cls_pred = out["cls_pred"]
        d2 = out["bbox_2d"].astype(jnp.float32)            # [B, 4, N]
        d3 = out["bbox_3d"].astype(jnp.float32)            # [B, 7, N]
        sfs = scale_factors.astype(jnp.float32)

        def _dense():
            return jax.vmap(_one, in_axes=(0, 0, None, None, 0, 0, 0))(
                scores, cls_pred, rois_t, src3d_t, d2, d3, sfs)

        if not sparse_mpos:
            return _dense()

        B, N = scores.shape
        M = sparse_mpos * A
        idx, oks = jax.vmap(
            lambda s: _compact_positions(s, A, sparse_thresh,
                                         sparse_mpos))(scores)

        def _sparse():
            # flat gathers with the batch offset folded in (sentinel idx N
            # maps OUT of the whole flat range -> mode="fill"); the batched
            # gather form is ~2.7x slower per row (ops/dcn.py)
            bi = jnp.arange(B, dtype=jnp.int32)[:, None]
            ch = lambda P: jnp.arange(P, dtype=jnp.int32)[None, :, None]
            valid_idx = idx < N

            def g1(a, fv):                                # [B, N] -> [B, M]
                flat = jnp.where(valid_idx, idx + bi * N, B * N)
                return jnp.take(a.reshape(-1), flat.reshape(-1), mode="fill",
                                fill_value=fv).reshape(B, M)

            def gp(a, P):                            # [B, P, N] -> [B, P, M]
                flat = jnp.where(valid_idx[:, None, :],
                                 idx[:, None, :] + (bi[..., None] * P
                                                    + ch(P)) * N, B * P * N)
                return jnp.take(a.reshape(-1), flat.reshape(-1), mode="fill",
                                fill_value=0.0).reshape(B, P, M)

            sc = g1(scores, -1.0)
            ck = g1(cls_pred.astype(scores.dtype), 0.0)
            d2k, d3k = gp(d2, 4), gp(d3, 7)
            # constants: per-image column gather, sentinel filled
            rk = jnp.take(rois_t, idx.reshape(-1), axis=1, mode="fill",
                          fill_value=0.0).reshape(5, B, M)
            sk = jnp.take(src3d_t, idx.reshape(-1), axis=1, mode="fill",
                          fill_value=0.0).reshape(5, B, M)
            one = functools.partial(_one, bitmask=use_bitmask)
            return jax.vmap(one, in_axes=(0, 0, 1, 1, 0, 0, 0))(
                sc, ck, rk, sk, d2k, d3k, sfs)

        return jax.lax.cond(jnp.all(oks), _sparse, _dense)

    if mesh is None:
        return jax.jit(detect)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, SPATIAL_AXIS, _spatial_size

    sp = _spatial_size(mesh)
    h_in = int(conf.test_scale[0]) // (2 if packed_input else 1)
    img_sharding = NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS)
                                 if sp > 1 and h_in % sp == 0
                                 else P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    # None = "infer from the committed argument" (TP-sharded params pass
    # through); explicit P() replication otherwise (host numpy params)
    param_shd = None if follow_params_sharding else repl
    # multi-host: replicate the (tiny [B, top_post, 14]) output so EVERY
    # process can read the full detection table (a data-sharded result is
    # not fully addressable off-host); single-process keeps the sharded form
    me = jax.process_index()
    spans = any(d.process_index != me for d in mesh.devices.flat)
    sf_sharding = NamedSharding(mesh, P(DATA_AXIS))
    jitted = jax.jit(
        detect,
        in_shardings=(param_shd, param_shd, img_sharding, sf_sharding),
        out_shardings=repl if spans else NamedSharding(mesh, P(DATA_AXIS)))

    # thin wrapper so callers (test_driver._run_batched) can discover the
    # image sharding for their explicit device_put (a default device_put
    # would commit the batch to one device and clash with in_shardings)
    def detect_sharded(params, batch_stats, images, scale_factors):
        return jitted(params, batch_stats, images, scale_factors)

    detect_sharded.input_sharding = img_sharding
    detect_sharded.sf_sharding = sf_sharding
    detect_sharded.jitted = jitted
    return detect_sharded
