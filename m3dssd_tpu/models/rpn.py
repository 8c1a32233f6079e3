"""The M3DSSD RPN head and model builder.

Re-derivation of ref:model/M3d_inference_align.py:31-331. One shared stride-8
feature map feeds 12 regression towers + 1 classification tower; optional
shape/center alignment and ANAB depth attention sit between them.

Output contract (both train and eval):
    dict(cls [B,N,Ncls], prob [B,N,Ncls],
         bbox_2d [B,4,N], bbox_3d [B,7,N]  — CHANNEL-MAJOR)
with N = H*W*A flattened in (row, col, anchor) order to match
`anchors.locate_anchors` — a pure reshape of the NHWC head outputs (no
relayout on the hot path). Anchor rois are host-side constants — the
reference caches them as module state (ref::62-64,308-313); under jit they
are simply arrays passed to the decode step.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .align import CenterAlign, ShapeAlign, confident_topm
from .attention import ANAB
from .layers import BN_MOMENTUM, leaky_relu
from .necks import DLASeg


def flatten_anchor_map(x):
    """[B, H, W, A(, C)] -> [B, H*W*A(, C)] in (h, w, a) order.

    A pure reshape — no relayout. The matching roi order comes from
    `anchors.locate_anchors` (see its docstring for why this differs from the
    reference's anchor-major unroll)."""
    if x.ndim == 4:
        B, H, W, A = x.shape
        return x.reshape(B, H * W * A)
    B, H, W, A, C = x.shape
    return x.reshape(B, H * W * A, C)


def unflatten_anchor_map(x, feat_size, num_anchors):
    """Inverse of `flatten_anchor_map` (role of ref:lib/rpn_util.py:904-918)."""
    H, W = int(feat_size[0]), int(feat_size[1])
    A = num_anchors
    B = x.shape[0]
    if x.ndim == 2:
        return x.reshape(B, H, W, A)
    return x.reshape(B, H, W, A, x.shape[-1])


class Tower(nn.Module):
    """conv(first_kernel) -> BN -> LReLU -> conv1x1 -> BN -> LReLU -> conv1x1
    (ref:model/M3d_inference_align.py:66-210)."""
    out_features: int
    hidden: int = 256
    first_kernel: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        k = self.first_kernel
        x = nn.Conv(self.hidden, (k, k), padding=[(k // 2, k // 2)] * 2,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         dtype=self.dtype)(x)
        x = leaky_relu(x)
        x = nn.Conv(self.hidden, (1, 1), dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         dtype=self.dtype)(x)
        x = leaky_relu(x)
        return nn.Conv(self.out_features, (1, 1), dtype=self.dtype)(x)


class M3DRPN(nn.Module):
    """Backbone + 13 towers + alignment + ANAB (see module docstring)."""
    num_classes: int
    num_anchors: int
    anchors: np.ndarray                    # [A, 9] host constant
    bbox_means: Optional[np.ndarray]       # [11]
    bbox_stds: Optional[np.ndarray]
    back_bone: str = "dla102"
    feat_stride: int = 8
    attention: Optional[str] = None
    center_align: bool = False
    shape_align: bool = False
    ida_dcnv2: bool = True
    dcn_shift_clamp: Any = 1.0
    stem_s2d: bool = True
    head_hidden: int = 256
    # top-M sparse alignment (models/align.py:SparseSel): per-image budget
    # of confident positions corrected by the deformable gather; 0 = always
    # dense. Exact either way (dense fallback via lax.cond on overflow).
    sparse_align_topm: int = 0
    sparse_align_train: bool = False   # apply the sparse path in training too
    align_thresh: float = 0.5
    remat_dcn: bool = False            # backward-pass remat knobs (config.py)
    remat_towers: bool = False
    dcn_custom_vjp: bool = False       # hand-written shift-DCN transpose (HBM knob)
    dtype: Any = jnp.float32

    def setup(self):
        self.base = DLASeg(base_name=self.back_bone,
                           down_ratio=self.feat_stride,
                           use_dcn=self.ida_dcnv2,
                           shift_clamp=self.dcn_shift_clamp,
                           remat=self.remat_dcn,
                           custom_vjp=self.dcn_custom_vjp,
                           stem_s2d=self.stem_s2d,
                           dtype=self.dtype)
        A = self.num_anchors
        tower_cls = nn.remat(Tower, static_argnums=(2,)) \
            if self.remat_towers else Tower
        t = lambda out, k=1: tower_cls(out, self.head_hidden, k,
                                       dtype=self.dtype)
        self.cls_tower = t(A * self.num_classes, k=3)
        self.bbox_x = t(A)
        self.bbox_y = t(A)
        self.bbox_w = t(A)
        self.bbox_h = t(A)
        self.bbox_x3d = t(A)
        self.bbox_y3d = t(A)
        self.bbox_z3d = t(A)
        self.bbox_w3d = t(A)
        self.bbox_h3d = t(A)
        self.bbox_l3d = t(A)
        self.bbox_rY3d = t(A)

        ch = self.base.out_channels
        if self.shape_align:
            self.shape_align_mod = ShapeAlign(
                ch, self.anchors, self.feat_stride, kernel=3,
                thresh=self.align_thresh, dtype=self.dtype)
        if self.center_align:
            self.center_align2d = CenterAlign(
                ch, self.anchors, self.bbox_means[0:2], self.bbox_stds[0:2],
                self.feat_stride, thresh=self.align_thresh, dtype=self.dtype)
            self.center_align3d = CenterAlign(
                ch, self.anchors, self.bbox_means[4:6], self.bbox_stds[4:6],
                self.feat_stride, thresh=self.align_thresh, dtype=self.dtype)
        if self.attention == "ANAB":
            self.anab = ANAB(dtype=self.dtype)
            self.anab_bn = nn.BatchNorm(momentum=BN_MOMENTUM, dtype=self.dtype)

    def __call__(self, x, train: bool = True, packed: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        """packed=True: input images are space-to-depth packed host-side
        ([B, H/2, W/2, 12]; models/dla.py:space_to_depth_np) — a free exact
        relayout of the [B, H, W, 3] contract."""
        B = x.shape[0]
        A = self.num_anchors
        x = self.base(x, train, packed=packed)
        H, W = x.shape[1], x.shape[2]

        cls = self.cls_tower(x, train).reshape(B, H, W, A, self.num_classes)

        # ALL classification-derived quantities (softmax, logsumexp, fg
        # confidence, detection scores) are computed from per-class
        # lane-slices of the conv-native map: any reduction/broadcast over
        # the flattened [B*N, C] layout puts C=4 classes in the 128-lane
        # minor dim (97% lane waste — ~2 ms/img at 512x1760 eval-side and
        # ~5 ms/step of poisoned softmax/CE layouts train-side, PERF.md).
        # Ops below are elementwise on [B,H,W,A] slices; consumers that
        # don't touch an output (either direction) DCE it.
        sl = [cls[..., c].astype(jnp.float32) for c in
              range(self.num_classes)]
        m_all = functools.reduce(jnp.maximum, sl)
        z = sum(jnp.exp(s - m_all) for s in sl)
        lse = m_all + jnp.log(z)                           # [B,H,W,A]
        prob_sl = [jnp.exp(s - m_all) / z for s in sl]     # softmax slices
        prob = jnp.stack(prob_sl, axis=-1)                 # [B,H,W,A,C]
        # per-anchor foreground confidence (1 - P(bg)), detached
        fg_prob = (1.0 - prob_sl[0]).astype(x.dtype)       # [B,H,W,A]

        m_fg = functools.reduce(jnp.maximum, sl[1:])
        det_scores = jnp.exp(m_fg - m_all) / z             # max fg softmax
        det_cls = jnp.zeros(m_fg.shape, jnp.float32)
        best = sl[1]
        for c in range(2, self.num_classes):
            take = sl[c] > best
            det_cls = jnp.where(take, float(c - 1), det_cls)
            best = jnp.maximum(best, sl[c])
        det_cls = det_cls + 1.0                            # class ids 1..C-1

        # shared top-M confident-position selection for all three alignment
        # modules (same fg_prob, same threshold) — see align.SparseSel
        sel = None
        if (self.sparse_align_topm > 0
                and (self.shape_align or self.center_align)
                and (not train or self.sparse_align_train)):
            sel = confident_topm(fg_prob, self.align_thresh,
                                 self.sparse_align_topm)

        feats = self.shape_align_mod(x, fg_prob, sparse_sel=sel) \
            if self.shape_align else x

        bbox_x = self.bbox_x(feats, train)                 # [B,H,W,A]
        bbox_y = self.bbox_y(feats, train)

        if self.center_align:
            feats2d = self.center_align2d(feats, bbox_x, bbox_y, fg_prob,
                                          sparse_sel=sel)
        else:
            feats2d = feats
        bbox_w = self.bbox_w(feats2d, train)
        bbox_h = self.bbox_h(feats2d, train)

        bbox_x3d = self.bbox_x3d(feats, train)
        bbox_y3d = self.bbox_y3d(feats, train)
        if self.center_align:
            feats3d = self.center_align3d(feats, bbox_x3d, bbox_y3d, fg_prob,
                                          sparse_sel=sel)
        else:
            feats3d = feats
        bbox_w3d = self.bbox_w3d(feats3d, train)
        bbox_h3d = self.bbox_h3d(feats3d, train)
        bbox_l3d = self.bbox_l3d(feats3d, train)
        bbox_rY3d = self.bbox_rY3d(feats3d, train)

        feats_z = feats3d
        if self.attention == "ANAB":
            feats_z = self.anab(feats_z)
            feats_z = self.anab_bn(feats_z, use_running_average=not train)
            feats_z = leaky_relu(feats_z)
        bbox_z3d = self.bbox_z3d(feats_z, train)

        # channel-major stacks [B, P, N]: N stays on the lane dimension.
        # a [B, N, P] layout would pad P=4/7 -> 128 lanes and multiply HBM
        # traffic in every downstream op (PERF.md)
        f32 = lambda v: flatten_anchor_map(v).astype(jnp.float32)
        bbox_2d = jnp.stack([f32(bbox_x), f32(bbox_y),
                             f32(bbox_w), f32(bbox_h)], axis=1)
        bbox_3d = jnp.stack([f32(bbox_x3d), f32(bbox_y3d), f32(bbox_z3d),
                             f32(bbox_w3d), f32(bbox_h3d), f32(bbox_l3d),
                             f32(bbox_rY3d)], axis=1)

        return {
            "cls": flatten_anchor_map(cls).astype(jnp.float32),
            "prob": flatten_anchor_map(prob),
            # channel-major twins + logsumexp for the loss (losses/rpn_loss
            # consumes THESE; the [B,N,C] forms above are kept for API
            # parity and DCE away in the train step): N stays on the lane
            # dim, C=4 never touches a layout
            "cls_t": jnp.stack([f32(s) for s in sl], axis=1),     # [B,C,N]
            "prob_t": jnp.stack([f32(p) for p in prob_sl], axis=1),
            "lse": flatten_anchor_map(lse),                # [B, N]
            "scores": flatten_anchor_map(det_scores),      # [B, N]
            "cls_pred": flatten_anchor_map(det_cls),       # [B, N]
            "bbox_2d": bbox_2d,
            "bbox_3d": bbox_3d,
            "feat_size": (H, W),
        }


def bias_background(params, num_classes: int, bias: float = 4.0):
    """Return `params` with the classification tower's background-logit bias
    raised by `bias` (benchmark/profiling helper).

    A freshly initialized softmax puts P(bg) ~= 1/num_classes at every
    position; every trained detector instead has P(bg) -> ~1 almost
    everywhere, which is the regime the sparse alignment path (align.py)
    and any confidence-dependent cost sees in deployment. bias=4.0 gives
    P(bg) ~= e^4/(e^4 + C-1) ~= 0.95.
    """
    import jax.numpy as jnp
    b = np.array(params["cls_tower"]["Conv_2"]["bias"])
    b[0::num_classes] += bias           # channel layout (a, c): bg is c == 0
    out = dict(params)
    out["cls_tower"] = dict(params["cls_tower"])
    out["cls_tower"]["Conv_2"] = dict(params["cls_tower"]["Conv_2"])
    out["cls_tower"]["Conv_2"]["bias"] = jnp.asarray(
        b, dtype=params["cls_tower"]["Conv_2"]["bias"].dtype)
    return out


def build(conf, phase: str = "train") -> M3DRPN:
    """Model factory (ref:model/M3d_inference_align.py:316-331).

    `phase` is accepted for API parity; train/eval is a call-time argument
    under the functional paradigm.
    """
    if not conf.back_bone.startswith("dla"):
        raise NotImplementedError(f"backbone {conf.back_bone}")
    dtype = jnp.bfloat16 if conf.compute_dtype == "bfloat16" else jnp.float32
    means = None if conf.bbox_means is None else np.asarray(conf.bbox_means)[0]
    stds = None if conf.bbox_stds is None else np.asarray(conf.bbox_stds)[0]
    return M3DRPN(
        num_classes=conf.num_classes,
        num_anchors=conf.anchors.shape[0],
        anchors=np.asarray(conf.anchors),
        bbox_means=means,
        bbox_stds=stds,
        back_bone=conf.back_bone,
        feat_stride=conf.feat_stride,
        attention=conf.attention,
        center_align=conf.center_align,
        shape_align=conf.shape_align,
        ida_dcnv2=conf.ida_dcnv2,
        dcn_shift_clamp=getattr(conf, "dcn_shift_clamp", 1.0),
        stem_s2d=getattr(conf, "stem_s2d", True),
        sparse_align_topm=int(getattr(conf, "sparse_align_topm", 0)),
        sparse_align_train=bool(getattr(conf, "sparse_align_train", False)),
        remat_dcn=bool(getattr(conf, "remat_dcn", False)),
        remat_towers=bool(getattr(conf, "remat_towers", False)),
        dcn_custom_vjp=bool(getattr(conf, "dcn_custom_vjp", False)),
        dtype=dtype,
    )
