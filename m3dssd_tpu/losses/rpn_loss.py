"""The M3DSSD detection loss, fully masked for jit (static shapes).

Re-derivation of ref:lib/loss/rpn_3d.py:659-1360 (`RPN_3D_loss_smp`, the
active loss under `pre_compute_target=True`). Semantics preserved:

  * per-image box sampling with budgets fg = round(N * box_samples *
    fg_fraction), bg = round(N * box_samples) - fg, taking the LOWEST-scoring
    candidates first (hard-negative/hard-positive mining by predicted
    probability ascending, ref::844-858);
  * batch-global fg/bg class re-weighting
    fg_w = fg_fraction/(1-fg_fraction) * bg_total/fg_total (ref::1141-1150);
  * cross-entropy with per-element clamp to [0, 2000] ("gradient clipping",
    ref::1196-1200), mean over active samples;
  * SmoothL1 on the 7 whitened 3D params, mean over sampled fg (ref::1283-1300);
  * -log(IoU) between decoded predicted and decoded target 2D boxes
    (ref::1347-1353);
  * optional focal-style down-weighting by (1-p)^gamma (ref::1157-1173) and
    the 2D SmoothL1 branch (ref::1225-1249 — latently broken upstream, fixed
    here), both off in the stock configs.

The reference's per-image Python loop + dynamic index lists become a fixed
shape rank-and-threshold selection: candidates are sorted by score, and a roi
is selected iff its rank among its pool is below the (traced scalar) budget.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import (bbox_transform_inv_t, convert_alpha_to_rot,
                         decode_bbox_3d_t, iou_list_t, masked_mean, smooth_l1)

IGN_FLAG = 3000


@dataclasses.dataclass(frozen=True)
class RPNLossConfig:
    box_samples: float = 0.20
    fg_fraction: float = 0.20
    hard_negatives: bool = True
    focal_loss: float = 0.0
    cls_2d_lambda: float = 1.0
    iou_2d_lambda: float = 1.0
    bbox_2d_lambda: float = 0.0
    bbox_3d_lambda: float = 1.0
    bbox_3d_proj_lambda: float = 0.0
    bbox_3d_iou_lambda: float = 0.0
    # skip the logging-only stats (acc_fg/acc_bg argmax pass + the two full
    # 3D decodes behind err_z/err_ry) — training math identical, the stats
    # dict just omits those keys. The reference computes them every
    # iteration (ref:lib/loss/rpn_3d.py:1099-1105), so the default matches.
    light_stats: bool = False
    # consume the model's channel-major class maps (cls_t/prob_t/lse,
    # [B,C,N]) instead of the flattened [B,N,C] forms: every class-dim
    # reduction/broadcast becomes C ops over lane-perfect [B,N] slices
    # (C=4 in the 128-lane minor dim wastes 97% of the vector lanes)
    channel_major: bool = True
    # find the hard-mining pool thresholds by bit-bisection instead of a
    # stable [B,N] sort (_rank_select_pools_bisect — exact-equality tested)
    mining_bisect: bool = False

    @staticmethod
    def from_conf(conf) -> "RPNLossConfig":
        return RPNLossConfig(
            box_samples=conf.box_samples, fg_fraction=conf.fg_fraction,
            hard_negatives=conf.hard_negatives, focal_loss=conf.focal_loss,
            cls_2d_lambda=conf.cls_2d_lambda, iou_2d_lambda=conf.iou_2d_lambda,
            bbox_2d_lambda=conf.bbox_2d_lambda,
            bbox_3d_lambda=conf.bbox_3d_lambda,
            bbox_3d_proj_lambda=conf.bbox_3d_proj_lambda,
            bbox_3d_iou_lambda=conf.bbox_3d_iou_lambda,
            light_stats=bool(getattr(conf, "loss_light_stats", False)),
            channel_major=bool(getattr(conf, "loss_channel_major", True)),
            mining_bisect=bool(getattr(conf, "loss_mining_bisect", False)))


def _rank_select(score, pool_mask, budget, key):
    """Select up to `budget` pool members with the smallest `score`.

    Static-shape replacement for the reference's sort-and-slice
    (ref::844-858). `budget` may be a traced scalar. When hard mining is off,
    callers pass random scores. Returns a boolean mask.
    """
    masked = jnp.where(pool_mask, score, jnp.inf)
    order = jnp.argsort(masked)                 # ascending
    rank = jnp.argsort(order)                   # rank of each element
    return pool_mask & (rank < budget)


def _rank_select_pools(score, pools, budgets):
    """`_rank_select` for several pools sharing one score: ONE two-operand sort.

    A stable ascending sort restricted to a pool's members preserves their
    relative order, so per-pool ranks are cumsums of pool membership in the
    globally sorted order — identical masks to per-pool `_rank_select`, at
    one `lax.sort` instead of two argsorts per pool (each ~6.6 ms at
    [4, 506880]). The sort carries exactly TWO operands (the f32 score key
    + all pool flags bit-packed into one int32): sort cost scales with the
    bytes moved per pass, and the earlier 4-operand form (per-pool flags +
    an iota payload for tie-breaking) measured ~10.8 ms/step at [4, 506880].
    The iota payload is replaced by an original-order cumsum: stability
    means the selected tied-at-threshold members are exactly the FIRST
    (budget - #strictly-below) ties in original index order. No scatter
    back to original order either (a [B*N] bool scatter measured ~11 ms).

    score [B,N]; pools: list of [B,N] bool; budgets: list of [B] int.
    """
    flags = sum((p.astype(jnp.int32) << i) for i, p in enumerate(pools))
    s_sorted, f_sorted = jax.lax.sort([score, flags], dimension=1,
                                      is_stable=True, num_keys=1)
    keeps = []
    for i, (pool, budget) in enumerate(zip(pools, budgets)):
        p_sorted = (f_sorted >> i) & 1
        # threshold score s_t = score of the pool member at in-pool rank
        # b_eff-1 (b_eff = min(budget, pool size)) in the sorted order
        rank = jnp.cumsum(p_sorted, axis=1) - 1
        b_eff = jnp.minimum(budget, rank[:, -1] + 1)          # [B]
        at_last = (p_sorted > 0) & (rank == b_eff[:, None] - 1)
        j = jnp.argmax(at_last, axis=1)                       # [B]
        s_t = jnp.take_along_axis(s_sorted, j[:, None], axis=1)
        # keep: strictly below the threshold, plus the first
        # (b_eff - #below) score==s_t ties in original order (== what the
        # stable sort selects)
        below = pool & (score < s_t)
        ties = pool & (score == s_t)
        n_below = jnp.sum(below, axis=1, keepdims=True)
        tie_rank = jnp.cumsum(ties.astype(jnp.int32), axis=1)
        keep = below | (ties & (tie_rank <= b_eff[:, None] - n_below))
        keeps.append(keep & (b_eff > 0)[:, None])
    return keeps


def _sortable_key_u32(score):
    """Monotone f32 -> uint32 bijection: unsigned compare == float compare
    (sign-flip trick; exact for all finite floats, NaN maps above +inf).

    -0.0 is normalized to +0.0 first (IEEE: -0.0 + 0.0 == +0.0) so the key
    order matches float ``==``/``<`` exactly — otherwise -0.0 < +0.0 under
    the bit order while the sort path's tie logic treats them equal, and a
    mixed ±0.0 tie at the threshold could select different members."""
    bits = jax.lax.bitcast_convert_type(
        score.astype(jnp.float32) + jnp.float32(0.0), jnp.uint32)
    neg = (bits >> 31) != 0
    return jnp.where(neg, ~bits, bits | jnp.uint32(0x80000000))


def _rank_select_pools_bisect(score, pools, budgets):
    """`_rank_select_pools` without the sort: find each pool's threshold
    score (the b_eff-th smallest among pool members, b_eff = min(budget,
    pool size)) by a 32-step binary search over monotone float BITS, then
    rebuild the keep mask with the same below/ties logic.

    Rationale: the sorted arrays are only ever used to locate that one
    per-row scalar — the keep mask itself is already reconstructed in
    original order. A stable [B,N] 2-operand `lax.sort` moves ~8 bytes/elem
    through O(log^2 N) merge passes; the bisection reads the key tensor 32
    times with perfect streaming locality and no permutation traffic, and
    its count-reduces for BOTH pools fuse into one loop-body pass.
    Exact-equality with `_rank_select_pools` (incl. score ties and
    zero/overfull budgets) is pinned by tests/test_loss_train.py.

    score [B,N]; pools: list of [B,N] bool; budgets: list of [B] int.
    """
    key = _sortable_key_u32(score)
    b_effs = [jnp.minimum(budget, jnp.sum(pool, axis=1))
              for pool, budget in zip(pools, budgets)]

    def body(_, carry):
        new = []
        for (lo, hi), pool, b_eff in zip(carry, pools, b_effs):
            mid = lo + (hi - lo) // 2
            # pool members with key <= mid (rows where the k-th smallest
            # is <= mid keep searching the lower half)
            cnt = jnp.sum((pool & (key <= mid[:, None])).astype(jnp.int32),
                          axis=1)
            ok = cnt >= b_eff
            new.append((jnp.where(ok, lo, mid + 1), jnp.where(ok, mid, hi)))
        return tuple(new)

    B, N = score.shape
    init = tuple((jnp.zeros((B,), jnp.uint32),
                  jnp.full((B,), 0xFFFFFFFF, jnp.uint32)) for _ in pools)
    final = jax.lax.fori_loop(0, 32, body, init)

    # Tie resolution, also by bisection: the kept ties are the FIRST
    # k2 = b_eff - #strictly-below in original index order (what the stable
    # sort selects), i.e. ties up to the smallest index t with
    # count(ties & idx <= t) >= k2. A [B,N] cumsum would lower to ~log2(N)
    # full read+write passes (CLAUDE.md: 2.45 ms at [8,507k]); this count
    # bisection reads only the bool tie masks.
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    belows, tiess, k2s = [], [], []
    for (lo, _), pool, b_eff in zip(final, pools, b_effs):
        kth = lo[:, None]               # lo == hi == b_eff-th smallest key
        below = pool & (key < kth)
        ties = pool & (key == kth)
        k2 = b_eff - jnp.sum(below, axis=1)
        belows.append(below)
        tiess.append(ties)
        k2s.append(k2)

    def body2(_, carry):
        new = []
        for (lo2, hi2), ties, k2 in zip(carry, tiess, k2s):
            mid = (lo2 + hi2) // 2
            cnt = jnp.sum((ties & (iota <= mid[:, None])).astype(jnp.int32),
                          axis=1)
            ok = cnt >= k2
            new.append((jnp.where(ok, lo2, mid + 1), jnp.where(ok, mid, hi2)))
        return tuple(new)

    steps = max(1, int(np.ceil(np.log2(N)))) if N > 1 else 1
    init2 = tuple((jnp.zeros((B,), jnp.int32),
                   jnp.full((B,), N - 1, jnp.int32)) for _ in pools)
    final2 = jax.lax.fori_loop(0, steps, body2, init2)

    keeps = []
    for (t, _), below, ties, k2, b_eff in zip(final2, belows, tiess, k2s,
                                              b_effs):
        keep = below | (ties & (iota <= t[:, None]) & (k2 > 0)[:, None])
        keeps.append(keep & (b_eff > 0)[:, None])
    return keeps


def _take_class(v, lbl):
    """v[..., lbl] per element: one-hot contraction over the tiny class dim.

    `take_along_axis` on [B,N,C] with [B,N] indices lowers to a batched
    gather (~31 ms at [4, 506880, 4] — and its backward is a scatter);
    the one-hot multiply-sum fuses into one streaming pass.
    """
    C = v.shape[-1]
    oh = jax.nn.one_hot(lbl, C, dtype=v.dtype)
    return jnp.sum(v * oh, axis=-1)


def _take_class_t(v_t, lbl):
    """`_take_class` on a channel-major [B, C, N] tensor: C compare+selects
    over [B, N] lane-perfect slices — the class dim never enters a layout
    (a [B,N,4] minor dim tiles T(4,128): 97% lane waste, and its softmax
    broadcasts alone cost ~2.4 ms/step at [8,276k,4] — PERF.md round 4)."""
    C = v_t.shape[1]
    return sum(jnp.where(lbl == c, v_t[:, c], 0.0) for c in range(C))


def _argmax_class_t(v_t):
    """argmax over the class dim of [B, C, N] by a compare chain (first-max
    ties like jnp.argmax)."""
    best = v_t[:, 0]
    pred = jnp.zeros(best.shape, jnp.int32)
    for c in range(1, v_t.shape[1]):
        take = v_t[:, c] > best
        pred = jnp.where(take, c, pred)
        best = jnp.maximum(best, v_t[:, c])
    return pred


def rpn_3d_loss(outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray],
                rois: jnp.ndarray, anchors: jnp.ndarray,
                bbox_means: jnp.ndarray, bbox_stds: jnp.ndarray,
                cfg: RPNLossConfig, rng: jax.Array | None = None
                ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Compute the total detection loss and a stats dict.

    outputs: model forward dict (cls/prob [B,N,C]; bbox_2d [B,4,N],
             bbox_3d [B,7,N] channel-major).
    batch: labels [B,N] (IGN_FLAG for ignored), labels_fg/bg/ign [B,N],
           bbox_2d [B,4,N], bbox_3d [B,7,N] (whitened targets, channel-
           major — the loader transposes host-side), any_val [B].
    rois [N,5]; anchors [A,9]; bbox_means/stds [1,11] or [11].
    """
    # channel-major fast path (cls_t/prob_t/lse [B,C,N]/[B,N], emitted by
    # models/rpn.py): every class-dim op becomes C ops over lane-perfect
    # [B,N] slices. The [B,N,C] path remains for hand-built output dicts.
    use_t = cfg.channel_major and "cls_t" in outputs
    if use_t:
        cls_t = outputs["cls_t"].astype(jnp.float32)          # [B,C,N]
        prob_t = jax.lax.stop_gradient(
            outputs["prob_t"].astype(jnp.float32))
        lse = outputs["lse"].astype(jnp.float32)              # [B,N]
        B, C, N = cls_t.shape
    else:
        cls = outputs["cls"].astype(jnp.float32)
        prob = jax.lax.stop_gradient(outputs["prob"].astype(jnp.float32))
        B, N, C = cls.shape
    bbox_2d = outputs["bbox_2d"].astype(jnp.float32)
    bbox_3d = outputs["bbox_3d"].astype(jnp.float32)
    means = jnp.asarray(bbox_means, jnp.float32).reshape(-1)
    stds = jnp.asarray(bbox_stds, jnp.float32).reshape(-1)
    rois = jnp.asarray(rois, jnp.float32)
    anchors = jnp.asarray(anchors, jnp.float32)

    labels = batch["labels"].astype(jnp.int32)
    is_fg = batch["labels_fg"].astype(bool)
    is_bg = batch["labels_bg"].astype(bool)
    is_ign = batch["labels_ign"].astype(bool)
    any_val = batch["any_val"].astype(bool)          # [B]

    # ---------------------------------------------------------- box sampling
    fg_budget = round(N * cfg.box_samples * cfg.fg_fraction)
    total_budget = round(N * cfg.box_samples)

    n_fg = jnp.sum(is_fg, axis=1)                    # [B]
    n_ign = jnp.sum(is_ign, axis=1)
    # image participates iff it has valid gts AND (fg or ign anchors exist)
    # (ref::815-829; otherwise the bg-only branch budget rounds to 0 with the
    # stock box_samples=0.2, so the image contributes nothing)
    participates = any_val & ((n_fg > 0) | (n_ign > 0))

    fg_num = jnp.minimum(fg_budget, n_fg)            # [B] traced scalars
    bg_num = total_budget - fg_num

    # score of the *labeled* class (bg anchors have label 0)
    lbl_for_score = jnp.where(labels == IGN_FLAG, 0, labels)
    score = _take_class_t(prob_t, lbl_for_score) if use_t \
        else _take_class(prob, lbl_for_score)

    if cfg.hard_negatives:
        sel_score = score
    else:
        assert rng is not None, "random sampling requires an rng"
        sel_score = jax.random.uniform(rng, score.shape)

    select = (_rank_select_pools_bisect if cfg.mining_bisect
              else _rank_select_pools)
    sel_fg, sel_bg = select(sel_score, [is_fg, is_bg], [fg_num, bg_num])
    sel_fg = sel_fg & participates[:, None]
    sel_bg = sel_bg & participates[:, None]

    fg_total = jnp.sum(sel_fg)
    bg_total = jnp.sum(sel_bg)

    # batch-global class weighting (ref::1141-1150)
    fg_w = jnp.where(fg_total > 0,
                     (cfg.fg_fraction / (1 - cfg.fg_fraction))
                     * (bg_total / jnp.maximum(fg_total, 1)), 0.0)
    labels_weight = sel_fg * fg_w + sel_bg * 1.0
    if cfg.focal_loss:
        labels_weight = labels_weight * (1.0 - score) ** cfg.focal_loss

    active = sel_fg | sel_bg
    stats: Dict[str, jnp.ndarray] = {}
    loss = jnp.float32(0.0)

    # ------------------------------------------------------------- cls loss
    if cfg.cls_2d_lambda:
        if use_t:
            # -log_softmax[lbl] == lse - logit[lbl], all in [B,N] space
            ce = lse - _take_class_t(cls_t, lbl_for_score)
        else:
            logp = jax.nn.log_softmax(cls, axis=-1)
            ce = -_take_class(logp, lbl_for_score)
        ce = jnp.clip(ce * labels_weight, 0.0, 2000.0)
        loss_cls = masked_mean(ce, active) * cfg.cls_2d_lambda
        loss = loss + loss_cls
        stats["loss_cls"] = loss_cls

    # accuracy stats over *all* labeled anchors (ref::1099-1105)
    if not cfg.light_stats:
        cls_pred = _argmax_class_t(cls_t) if use_t \
            else jnp.argmax(cls, axis=-1)
        lab_fg_all = (labels > 0) & (labels != IGN_FLAG)
        lab_bg_all = labels == 0
        stats["acc_fg"] = masked_mean(
            (cls_pred == labels).astype(jnp.float32), lab_fg_all)
        stats["acc_bg"] = masked_mean(
            (cls_pred == 0).astype(jnp.float32), lab_bg_all)

    # --------------------------------------------------------- 3D bbox loss
    # bbox tensors are channel-major [B, P, N] (lane-friendly; see PERF.md)
    bbox_weights = sel_fg.astype(jnp.float32)
    if cfg.bbox_3d_lambda:
        l3d = smooth_l1(bbox_3d, batch["bbox_3d"].astype(jnp.float32))
        # per-param masked mean over sampled fg, summed over the 7 params
        per_param = jax.vmap(lambda p: masked_mean(p, bbox_weights),
                             in_axes=1)(l3d)
        loss_3d = jnp.sum(per_param) * cfg.bbox_3d_lambda
        loss = loss + loss_3d
        stats["loss_bbox3d"] = loss_3d

    if cfg.bbox_2d_lambda:
        l2d = smooth_l1(bbox_2d, batch["bbox_2d"].astype(jnp.float32))
        per_param = jax.vmap(lambda p: masked_mean(p, bbox_weights),
                             in_axes=1)(l2d)
        loss_2d = jnp.sum(per_param) * cfg.bbox_2d_lambda
        loss = loss + loss_2d
        stats["loss_bbox2d"] = loss_2d

    # ------------------------------------------------- decoded IoU loss/stats
    rois_t = rois.T                                   # [5, N] channel-major
    coords = bbox_transform_inv_t(rois_t, bbox_2d, means[0:4], stds[0:4])
    coords_tar = bbox_transform_inv_t(rois_t,
                                      batch["bbox_2d"].astype(jnp.float32),
                                      means[0:4], stds[0:4])
    ious = iou_list_t(coords, coords_tar)
    stats["iou"] = masked_mean(ious, bbox_weights)

    if cfg.iou_2d_lambda:
        # clamp for -log stability (the reference relies on fg IoU > 0, which
        # holds after a few steps but not at init)
        iou_loss = -jnp.log(jnp.clip(ious, 1e-7, 1.0))
        # mean over sampled fg only (ref::1334,1347-1353: active=bbox_weights>0)
        loss_iou = masked_mean(iou_loss, bbox_weights) * cfg.iou_2d_lambda
        loss = loss + loss_iou
        stats["loss_iou"] = loss_iou

    # --------------------------------------------- z / rotation error stats
    # (the decode is also the input of the proj/3D-IoU loss branches below)
    need_decode = (not cfg.light_stats or cfg.bbox_3d_proj_lambda
                   or cfg.bbox_3d_iou_lambda)
    if need_decode:
        tracker = rois[:, 4].astype(jnp.int32)
        src3d_t = anchors[tracker][:, 4:9].T             # [5, N]
        dec = decode_bbox_3d_t(rois_t, bbox_3d, src3d_t, means, stds)
        dec_tar = decode_bbox_3d_t(rois_t,
                                   batch["bbox_3d"].astype(jnp.float32),
                                   src3d_t, means, stds)
    if not cfg.light_stats:
        stats["err_z"] = masked_mean(jnp.abs(dec[:, 2] - dec_tar[:, 2]),
                                     bbox_weights)
        stats["err_ry"] = masked_mean(jnp.abs(dec[:, 6] - dec_tar[:, 6]),
                                      bbox_weights)

    # ------------------------- 3D projection / rotated-IoU loss capabilities
    # (ref:lib/loss/rpn_3d.py:606-630 bbox_3d_proj branch; the 3D-IoU lambda
    # backed by ref:lib/utils/iou3d — both zero in stock configs)
    if (cfg.bbox_3d_proj_lambda or cfg.bbox_3d_iou_lambda) \
            and "p2_inv" in batch:
        p2_inv = batch["p2_inv"].astype(jnp.float32)     # [B,4,4]

        def cam_boxes_t(d):
            # d [B,7,N] -> camera-frame [B,7,N]: [x, y(bottom), z, h, w, l, ry]
            x2d, y2d, z = d[:, 0], d[:, 1], d[:, 2]
            pts = jnp.stack([x2d * z, y2d * z, z, jnp.ones_like(z)], axis=1)
            c3 = jnp.einsum("bij,bjn->bin", p2_inv, pts)  # [B,4,N]
            ry = convert_alpha_to_rot(d[:, 6], c3[:, 2], c3[:, 0])
            return jnp.stack([c3[:, 0], c3[:, 1] + d[:, 4] / 2, c3[:, 2],
                              d[:, 4], d[:, 3], d[:, 5], ry], axis=1)

        cams = cam_boxes_t(dec)
        cams_tar = jax.lax.stop_gradient(cam_boxes_t(dec_tar))

        if cfg.bbox_3d_proj_lambda:
            proj_l1 = smooth_l1(cams[:, 0:3], cams_tar[:, 0:3]).sum(1)
            loss_proj = masked_mean(proj_l1, bbox_weights) \
                * cfg.bbox_3d_proj_lambda
            loss = loss + loss_proj
            stats["loss_bbox3d_proj"] = loss_proj

        if cfg.bbox_3d_iou_lambda:
            from ..ops.iou3d import giou_3d
            flat = cams.transpose(0, 2, 1).reshape(-1, 7)
            flat_tar = cams_tar.transpose(0, 2, 1).reshape(-1, 7)
            g, _ = giou_3d(flat, flat_tar)
            loss_giou = masked_mean((1.0 - g).reshape(B, N), bbox_weights) \
                * cfg.bbox_3d_iou_lambda
            loss = loss + loss_giou
            stats["loss_bbox3d_iou"] = loss_giou

    stats["loss"] = loss
    stats["fg_count"] = fg_total.astype(jnp.float32)
    stats["bg_count"] = bg_total.astype(jnp.float32)
    return loss, stats
