"""2D NMS: on-device greedy suppression + a pure-python oracle.

TPU-native replacement for the reference's CUDA bitmask NMS
(ref:lib/nms/nms_kernel.cu:35-144) and its python oracle
(ref:lib/nms/py_cpu_nms.py:10-38). The device version computes the pairwise
IoU matrix in one shot (VPU) and resolves the greedy keep order with a
`lax.fori_loop` — exact greedy NMS, static shapes, jit-safe.

IoU convention matches the reference NMS kernels: areas use the +1 pixel
convention (ref:nms_kernel.cu:25-33, py_cpu_nms.py:15-18) — note this differs
from the training-time IoU in `ops.boxes`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _iou_matrix_plus1(boxes):
    """Pairwise IoU with the +1 area convention, [N,4] -> [N,N]."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.clip(xx2 - xx1 + 1.0, 0.0, None)
    h = jnp.clip(yy2 - yy1 + 1.0, 0.0, None)
    inter = w * h
    return inter / (area[:, None] + area[None, :] - inter)


@functools.partial(jax.jit, static_argnames=("already_sorted",))
def nms(boxes, scores, iou_thresh, already_sorted: bool = False):
    """Greedy NMS. boxes [N,4], scores [N] -> keep mask [N] (original order).

    Boxes are processed in descending score order; a box is kept iff no
    higher-scoring kept box overlaps it above `iou_thresh`.
    """
    N = boxes.shape[0]
    if already_sorted:
        order = jnp.arange(N)
    else:
        order = jnp.argsort(-scores)
    b = boxes[order]
    iou = _iou_matrix_plus1(b)
    over = iou > iou_thresh

    def body(i, keep):
        # suppress all later boxes overlapped by box i, iff i is still kept
        row = over[i] & (jnp.arange(N) > i) & keep[i]
        return keep & ~row

    keep_sorted = jax.lax.fori_loop(0, N, body, jnp.ones(N, bool))
    # scatter back to original order
    keep = jnp.zeros(N, bool).at[order].set(keep_sorted)
    return keep


@functools.partial(jax.jit, static_argnames=("num_out", "stop_below"))
def nms_select(boxes, scores, iou_thresh, num_out: int,
               stop_below=None):
    """Greedy NMS returning only the first `num_out` survivors.

    Exactly equivalent to full greedy NMS followed by keeping the top
    `num_out` kept boxes, but runs `num_out` sequential steps instead of N:
    each step picks the highest-scoring active box and suppresses its
    overlaps (the IoU row is computed on the fly — no NxN matrix).

    Returns (indices [num_out] int32, valid [num_out] bool).
    """
    return nms_select_t(boxes.T, scores, iou_thresh, num_out,
                        stop_below=stop_below)


@functools.partial(jax.jit, static_argnames=("num_out", "stop_below"))
def nms_select_t(boxes_t, scores, iou_thresh, num_out: int,
                 stop_below=None):
    """`nms_select` taking channel-major boxes [4, N] (lane-friendly).

    stop_below (static float, optional): stop the sequential selection as
    soon as the best remaining score drops below it — survivors ABOVE the
    threshold are exactly those of full greedy NMS (a sub-threshold box can
    never suppress a higher-scoring one); sub-threshold slots come back
    valid=False instead of filled. Sound whenever the consumer drops rows
    below the same threshold (the framework's test driver always does —
    inference/test_driver.postprocess_dets with conf.score_thres). The
    sequential rounds are the NMS cost (~6 ms/step of 40 rounds at bs=8,
    PERF.md); real images rarely carry more than a handful of
    above-threshold detections, so this typically runs 1-10 rounds.
    """
    N = boxes_t.shape[1]
    x1, y1, x2, y2 = boxes_t[0], boxes_t[1], boxes_t[2], boxes_t[3]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    neg_inf = jnp.asarray(-jnp.inf, jnp.float32)

    def suppress_row(i, active_scores, ok):
        # IoU of box i against all boxes (+1 convention)
        xx1 = jnp.maximum(x1[i], x1)
        yy1 = jnp.maximum(y1[i], y1)
        xx2 = jnp.minimum(x2[i], x2)
        yy2 = jnp.minimum(y2[i], y2)
        inter = jnp.clip(xx2 - xx1 + 1.0, 0.0, None) \
            * jnp.clip(yy2 - yy1 + 1.0, 0.0, None)
        iou = inter / (area[i] + area - inter)
        suppress = (iou > iou_thresh) | (jnp.arange(N) == i)
        return jnp.where(ok & suppress, neg_inf, active_scores)

    if stop_below is None:
        def body(k, carry):
            active_scores, idxs, valid = carry
            i = jnp.argmax(active_scores)
            ok = active_scores[i] > neg_inf
            idxs = idxs.at[k].set(i.astype(jnp.int32))
            valid = valid.at[k].set(ok)
            return suppress_row(i, active_scores, ok), idxs, valid

        init = (scores.astype(jnp.float32),
                jnp.zeros(num_out, jnp.int32),
                jnp.zeros(num_out, bool))
        _, idxs, valid = jax.lax.fori_loop(0, num_out, body, init)
        return idxs, valid

    stop = jnp.asarray(float(stop_below), jnp.float32)

    def cond(carry):
        k, _, _, _, cur_s = carry
        return (k < num_out) & (cur_s >= stop)

    def body(carry):
        k, active_scores, idxs, valid, _ = carry
        i = jnp.argmax(active_scores)          # recompute: cheap vs carrying
        idxs = idxs.at[k].set(i.astype(jnp.int32))
        valid = valid.at[k].set(True)
        active_scores = suppress_row(i, active_scores, jnp.bool_(True))
        return (k + 1, active_scores, idxs, valid,
                jnp.max(active_scores))

    active0 = scores.astype(jnp.float32)
    init = (jnp.zeros((), jnp.int32), active0,
            jnp.zeros(num_out, jnp.int32), jnp.zeros(num_out, bool),
            jnp.max(active0))
    _, _, idxs, valid, _ = jax.lax.while_loop(cond, body, init)
    return idxs, valid


@functools.partial(jax.jit, static_argnames=("num_out",))
def nms_bitmask_select_t(boxes_t, scores, iou_thresh, num_out: int):
    """Parallel-greedy NMS for a SMALL candidate set (boxes_t [4, C]).

    The TPU reformulation of the reference's CUDA bitmask kernel
    (ref:lib/nms/nms_kernel.cu:35-144): sort the C candidates by score once,
    build the pairwise overlap matrix (upper triangle = "j could suppress
    i"), and resolve the greedy keep vector by Jacobi fixpoint iteration —
    keep <- active & ~(overᵀ @ keep) — instead of `num_out` strictly
    sequential argmax rounds. The fixpoint is unique (it is the greedy
    solution) and the iteration converges in suppression-chain-depth steps
    (2-6 in practice); each step is one [C, C] masked matvec on the VPU.

    EXACT vs `nms_select_t` on the same candidates (equivalence tested,
    including score ties: the stable argsort commits earlier-index boxes
    first, like sequential argmax). Intended for compacted above-threshold
    candidates (C in the hundreds/low thousands — the [C, C] matrix is the
    memory cost); `nms_select_t` remains the full-N path.

    Returns (indices [num_out] int32 into the ORIGINAL order,
    valid [num_out] bool).
    """
    C = boxes_t.shape[1]
    order = jnp.argsort(-scores.astype(jnp.float32), stable=True)
    b = boxes_t[:, order]
    sc = scores[order].astype(jnp.float32)
    active = sc > -jnp.inf

    x1, y1, x2, y2 = b[0], b[1], b[2], b[3]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.clip(xx2 - xx1 + 1.0, 0.0, None) \
        * jnp.clip(yy2 - yy1 + 1.0, 0.0, None)
    iou = inter / (area[:, None] + area[None, :] - inter)
    # over[j, i]: an earlier (higher-score) KEPT j suppresses i
    tri = jnp.arange(C)[:, None] < jnp.arange(C)[None, :]
    over = (iou > iou_thresh) & tri & active[None, :] & active[:, None]
    overf = over.astype(jnp.float32)

    def cond(carry):
        keep, prev, it = carry
        return jnp.any(keep != prev) & (it < C)

    def body(carry):
        keep, _, it = carry
        suppressed = (overf.T @ keep.astype(jnp.float32)) > 0.0
        return active & ~suppressed, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (active, jnp.zeros_like(active), jnp.zeros((), jnp.int32)))

    from .compact import first_m_true
    pos, _ = first_m_true(keep, num_out)        # sentinel C when unused
    valid = pos < C
    idxs = jnp.where(valid, order[jnp.clip(pos, 0, C - 1)], 0) \
        .astype(jnp.int32)
    return idxs, valid


def py_cpu_nms(dets, thresh):
    """Pure-python greedy NMS oracle (ref:lib/nms/py_cpu_nms.py:10-38).

    dets [N,5] with score column 4; returns kept indices (descending score).
    """
    x1, y1, x2, y2 = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3]
    scores = dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]

    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][ovr <= thresh]
    return keep
