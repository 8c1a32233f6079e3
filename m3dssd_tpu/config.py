"""Typed experiment configuration.

The reference framework uses `easydict` modules mutated at runtime
(ref:scripts/config/kitti_3d_base.py, ref:lib/core.py:36-46). Here the same
knobs — same names, same defaults — live on a dataclass so they are
introspectable and serializable, while still allowing the runtime injection
the reference relies on (anchors / bbox whitening stats are computed from the
training set and written back onto the config: ref:lib/rpn_util.py:164,888-889).
"""

from __future__ import annotations

import dataclasses
import pickle
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np


@dataclass
class Config:
    # ---------------------------------------------------------------- general
    model: str = "m3d_rpn_align"
    ida_dcnv2: bool = True            # deformable proj/node convs in IDAUp
    # clamp for learned DCN offsets enabling the gather-free shifted-MAC
    # implementation (ops/dcn.py:dcn_v2_shift); None = unbounded gather path
    dcn_shift_clamp: Optional[float] = 1.0
    # exact space-to-depth stem: full-res 16-ch stem convs run phase-packed
    # at half resolution (identical math + param tree; models/dla.py)
    stem_s2d: bool = True
    attention: Optional[str] = None   # None | "ANAB"

    # feature alignment (ref:model/module/feturealign_mgpu.py)
    center_align: bool = False
    shape_align: bool = False
    # top-M sparse alignment: the align DCNs only deviate from
    # `mask*conv(x)+b` at positions whose max anchor confidence exceeds the
    # align threshold; with a per-image budget M the deformable gather runs
    # only there (exact — lax.cond falls back to the dense DCN if more than
    # M positions are confident). 0 disables. sparse_align_train applies the
    # same path in training (models/align.py:SparseSel); exact in both
    # regimes (equality + grad-equality tested) and the measured win, so it
    # defaults ON — the TRAINBENCH.json headline is this configuration.
    sparse_align_topm: int = 1024
    sparse_align_train: bool = True

    # rematerialization knobs (train-step HBM-traffic probes; exact math —
    # they only change what XLA saves for the backward pass):
    #   remat_dcn    — jax.checkpoint around each neck shift-DCN: recompute
    #                  the 9 per-tap column tensors in backward instead of
    #                  saving ~9x[B,H,W,C] per layer
    #   remat_towers — flax remat around each head tower (recompute the two
    #                  256-wide hidden activations per tower in backward)
    remat_dcn: bool = False
    remat_towers: bool = False
    # hand-written transpose for the shifted-MAC DCN backward
    # (ops/dcn.py:_dcn_shift_core_bwd): input-only residuals (no stored
    # im2col columns) + a shared C-dot table for the offset/mask grads.
    # Grad-equality vs autodiff is tested. Default OFF by measurement
    # (2026-08-19 controlled A/B, flagship 384x1280 bs=8: autodiff 195.3
    # ms/step vs custom 209.6 — the dW column recompute costs real FLOPs
    # while XLA's stored-column transpose fits HBM at bs<=8). Turn ON as an
    # HBM-headroom knob: input-only residuals won 6.4% at bs=12 (PERF.md).
    dcn_custom_vjp: bool = False
    # skip the logging-only per-step loss stats (class-accuracy argmax +
    # the two full 3D decodes behind err_z/err_ry). Training math is
    # identical and every loss component + the fg IoU stat is still
    # emitted; only the four diagnostic scalars acc_fg/acc_bg/err_z/err_ry
    # disappear from the logs. Default True by measurement (the pinned
    # TRAINBENCH.json headline is this configuration); set False for the
    # reference's full stats protocol, which computes them every iteration
    # (ref:lib/loss/rpn_3d.py:1099-1105).
    loss_light_stats: bool = True
    # loss consumes the model's channel-major class maps (cls_t/prob_t/lse
    # [B,C,N]): class-dim softmax/CE/argmax run as C lane-perfect [B,N]
    # slice ops instead of reductions over a C=4 minor dim (97% lane
    # waste). Math identical (equality-tested incl. gradients); False
    # falls back to the [B,N,C] path.
    loss_channel_major: bool = True
    # hard-mining pool selection finds the per-pool k-th smallest score by a
    # 32-step binary search on monotone float bits (two masked count-reduces
    # per step) instead of one [B,N] stable lax.sort
    # (losses/rpn_loss.py:_rank_select_pools_bisect). Exact-equality tested
    # vs the sort form incl. ties/budget edges. Default on by measurement:
    # flagship bs=8 173.2/173.5 vs 179.9/179.9 ms/step alternated same-
    # process (2026-08-20, PERF.md).
    loss_mining_bisect: bool = True

    # ----------------------------------------------------------------- solver
    solver_type: str = "sgd"          # sgd | adam | adamax
    # reference recipe: bs=4 @ lr 0.004 (ref:scripts/config/kitti_3d_base.py
    # :21-35). When raising batch_size, scale lr AND lr_target linearly —
    # validated by the round-5 convergence A/B (PERF.md): bs=8 @ lr 0.008
    # matches or beats the bs=4 recipe per epoch; bs=8 is the measured
    # throughput sweet spot (TRAINBENCH.json).
    lr: float = 0.004
    momentum: float = 0.9
    weight_decay: float = 0.0005
    max_epoch: int = 70
    warmup: float = 1.0 / 70          # fraction of total iters for linear warmup
    eval_epoch: int = 10
    snapshot_epoch: int = 5
    display_iter: int = 25            # ref divides 100 by batch_size=4
    do_test: bool = True

    lr_policy: str = "cos"            # cos | poly | step
    lr_steps: Optional[List[float]] = None
    lr_target: float = 0.004 * 1e-5
    # optional global-norm gradient clipping (None = off, matching the
    # reference, which only clamps the CE loss elementwise — rpn_loss.py).
    # A stability knob for from-scratch/bf16 runs: one bad batch early in
    # training (before BN settles) can otherwise blow up the 3D regression.
    grad_clip_norm: Optional[float] = None

    # gradient accumulation: apply optimizer update every `batch_skip` steps
    # (ref:lib/core.py:116, scripts/train_rpn_3d.py:216-218)
    batch_skip: int = 1

    # ----------------------------------------------------------------- random
    rng_seed: int = 2

    # ----------------------------------------------------------------- network
    image_means: List[float] = field(default_factory=lambda: [0.485, 0.456, 0.406])
    image_stds: List[float] = field(default_factory=lambda: [0.229, 0.224, 0.225])
    feat_stride: int = 8
    back_bone: str = "dla102"
    pre_train: bool = True
    has_3d: bool = True

    # compute dtype for the network under jit ("bfloat16" | "float32")
    compute_dtype: str = "bfloat16"

    # ------------------------------------------------------- sampling/dataset
    test_scale: List[int] = field(default_factory=lambda: [384, 1280])
    crop_size: List[int] = field(default_factory=lambda: [384, 1280])
    mirror_prob: float = 0.50
    trans_prob: float = 0.7
    distort_prob: float = -1.0
    shift: float = 0.1
    scale_trans: float = 0.4

    datasets_train: List[Dict[str, Any]] = field(default_factory=lambda: [
        {"name": "kitti_split1", "anno_fmt": "kitti_det", "im_ext": ".png", "scale": 1}])
    datasets_validation: List[Dict[str, Any]] = field(default_factory=lambda: [
        {"name": "kitti_split1", "anno_fmt": "kitti_det", "im_ext": ".png", "scale": 1}])
    datasets_test: List[Dict[str, Any]] = field(default_factory=lambda: [
        {"name": "kitti_split1", "anno_fmt": "kitti_det", "im_ext": ".png", "scale": 1}])
    use_3d_for_2d: bool = True
    num_workers: int = 8

    # multi-frame input ("video_det", ref:lib/imdb_util.py:224-266): stack
    # `video_count` previous frames (<id>_01.png ...) as extra channel groups
    video_det: bool = False
    video_count: int = 1

    percent_anc_h: List[float] = field(default_factory=lambda: [0.0625, 0.75])

    min_gt_vis: float = 0.65
    ilbls: List[str] = field(default_factory=lambda: ["Van", "ignore"])
    lbls: List[str] = field(default_factory=lambda: ["Car", "Pedestrian", "Cyclist"])

    # --------------------------------------------------------------- det sampling
    batch_size: int = 4
    fg_image_ratio: float = 1.0
    box_samples: float = 0.20
    fg_fraction: float = 0.20
    bg_thresh_lo: float = 0.0
    bg_thresh_hi: float = 0.5
    fg_thresh: float = 0.5
    ign_thresh: float = 0.5
    best_thresh: float = 0.35

    # --------------------------------------------------------------- inference
    nms_topN_pre: int = 3000
    nms_topN_post: int = 40
    nms_thres: float = 0.4
    clip_boxes: bool = False
    score_thres: float = 0.75
    # sparse pre-NMS compaction budget (0 = off): decode + NMS run on the
    # (up to) top-M candidates with score >= score_thres instead of all
    # ~500k anchors, with a lax.cond dense fallback when more than M clear
    # the threshold. EXACT for every detection the framework emits: the
    # test driver drops rows below score_thres anyway
    # (inference/test_driver.py postprocess_dets), and greedy NMS
    # suppression only ever flows from higher- to lower-scored boxes, so
    # removing sub-threshold candidates cannot change the surviving
    # above-threshold set. Padding rows carry score -1.
    # DEFAULT OFF by measurement (2026-08-18, PERF.md): the dense
    # decode+NMS is already cheap on TPU — flagship 512x1760 measured
    # 103.2 -> 97.1 im/s at bs=8 with this on (compaction + cond
    # materialization outweigh the savings) and only noise-level change at
    # bs=1 (10.86 -> 10.79 ms). Kept as an equality-tested probe
    # (tests/test_sparse_nms.py), like ops/dcn_pallas.py.
    nms_sparse_topm: int = 0
    # stop the sequential NMS selection once the best remaining score drops
    # below score_thres (ops/nms.py nms_select_t stop_below). Exact for
    # every detection the framework emits — same argument as
    # nms_sparse_topm above: the driver drops sub-threshold rows, and a
    # sub-threshold box can never suppress a higher-scoring one. Real
    # images carry a handful of above-threshold detections, so the 40
    # sequential rounds (~6 ms/step at bs=8, PERF.md) shrink to 1-10.
    nms_score_stop: bool = True
    # resolve greedy NMS over COMPACTED candidates by parallel bitmask
    # fixpoint rounds (ops/nms.py nms_bitmask_select_t — the TPU twin of the
    # reference's CUDA bitmask kernel) instead of sequential argmax rounds.
    # ONLY ENGAGES on the sparse pre-NMS path (nms_sparse_topm > 0, off by
    # default): the [C, C] overlap matrix needs a compacted candidate set.
    # On the default dense path the NMS engine is nms_select_t with the
    # score early-stop above — the 2026-08-19 sweep's "bitmask" row
    # compiled the IDENTICAL dense graph as "stop" (74.6 vs 75.2 ms/step at
    # bs=8 is run noise, not a bitmask win; the real measured win was
    # early-stop vs plain sequential, 75.2 vs 77.5). Equality vs sequential
    # greedy incl. score ties is tested (tests/test_nms_eval.py).
    nms_bitmask: bool = True

    test_protocol: str = "kitti"
    test_db: str = "kitti"

    # eval-time inference batch size (the reference is hardwired bs=1,
    # ref:lib/dataloader.py:906; batching is AP-neutral throughput here)
    eval_batch_size: int = 8
    # byte cap (MB) for caching decoded+preprocessed eval images across
    # repeated evals of the same split (0 = off). Eval preprocessing is
    # deterministic, so the cache is exact; sized for periodic val evals
    # during training on hosts where PNG decode dominates (PERF.md).
    eval_image_cache_mb: int = 512

    # ----------------------------------------------------------------- anchors
    # cluster_anchors > 0 enables IoU k-means refinement; even_anchors seeds
    # clusters from height-sorted gt slices; expand_anchors (> A) grows the
    # anchor count while mean IoU improves (anchors.cluster_anchors,
    # ref:lib/rpn_util.py:186-427)
    cluster_anchors: int = 0
    even_anchors: int = 0
    expand_anchors: int = 0

    anchor_ratios: List[float] = field(default_factory=lambda: [0.5, 1.0, 1.5])
    num_anchor_scales: int = 12

    # runtime-injected (computed from the training imdb, cached with the run)
    anchors: Optional[np.ndarray] = None          # [A, 9]: x1,y1,x2,y2,z,w3,h3,l3,ry
    bbox_means: Optional[np.ndarray] = None       # [1, 11]
    bbox_stds: Optional[np.ndarray] = None        # [1, 11]

    # ------------------------------------------------------------------- loss
    hard_negatives: bool = True
    focal_loss: float = 0.0
    cls_2d_lambda: float = 1.0
    iou_2d_lambda: float = 1.0
    bbox_2d_lambda: float = 0.0
    bbox_3d_lambda: float = 1.0
    bbox_3d_proj_lambda: float = 0.0
    bbox_3d_iou_lambda: float = 0.0
    pre_compute_target: bool = True
    # padded gt capacity per image for the on-device target path
    # (pre_compute_target=False; ops/targets_device.py). KITTI maxes out
    # around ~25 labels/image incl. DontCare.
    max_gts: int = 32

    hill_climbing: bool = True
    bins: int = 32

    pretrained: Optional[str] = None

    # layer freezing (ref:lib/core.py:444-474): params whose path contains a
    # blacklist substring (or, with a whitelist, does NOT contain any
    # whitelist substring) receive no optimizer updates
    freeze_blacklist: Optional[List[str]] = None
    freeze_whitelist: Optional[List[str]] = None

    # ---------------------------------------------------------------- parallel
    # data-parallel mesh size; -1 means "all local devices"
    dp_devices: int = -1
    # extra mesh axes (beyond the reference's DP-only story; parallel/mesh.py):
    # mesh_spatial > 1 shards image height (+ h-major anchor targets) over a
    # 'spatial' axis; mesh_model > 1 shards wide parameters' output channels
    # over a 'model' axis (Megatron-style TP — param+optimizer memory/device
    # drops ~1/mp). dp x spatial x model must divide the device count.
    mesh_spatial: int = 1
    mesh_model: int = 1

    # ------------------------------------------------------------- derived
    @property
    def min_gt_h(self) -> float:
        return self.test_scale[0] * self.percent_anc_h[0]

    @property
    def max_gt_h(self) -> float:
        return self.test_scale[0] * self.percent_anc_h[1]

    @property
    def anchor_scales(self) -> np.ndarray:
        """Geometric anchor height ladder (ref:scripts/config/kitti_3d_base.py:130-131)."""
        n = self.num_anchor_scales
        base = (self.max_gt_h / self.min_gt_h) ** (1.0 / (n - 1))
        return np.array([self.min_gt_h * (base ** i) for i in range(n)])

    @property
    def num_classes(self) -> int:
        return len(self.lbls) + 1

    @property
    def feat_size(self) -> List[int]:
        return [int(np.ceil(s / self.feat_stride)) for s in self.crop_size]

    # ------------------------------------------------------------- (de)serialize
    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @staticmethod
    def load(path: str) -> "Config":
        with open(path, "rb") as f:
            return pickle.load(f)


# ----------------------------------------------------------------------------
# Named configs mirroring the reference's three experiment files.
# ----------------------------------------------------------------------------

def kitti_3d_base(**kw) -> Config:
    """ref:scripts/config/kitti_3d_base.py — no attention, no alignment."""
    return Config(**kw)


def kitti_3d_anab(**kw) -> Config:
    """ref:scripts/config/kitti_3d_anab.py — ANAB depth attention, lr 0.002."""
    cfg = Config(attention="ANAB", lr=0.002, lr_target=0.002 * 1e-5, eval_epoch=20)
    return cfg.replace(**kw) if kw else cfg


def kitti_3d_anab_fullalign(**kw) -> Config:
    """ref:scripts/config/kitti_3d_anab_fullalign.py — ANAB + shape/center align."""
    cfg = Config(attention="ANAB", center_align=True, shape_align=True,
                 lr=0.002, lr_target=0.002 * 1e-5, eval_epoch=20)
    return cfg.replace(**kw) if kw else cfg


CONFIGS = {
    "kitti_3d_base": kitti_3d_base,
    "kitti_3d_anab": kitti_3d_anab,
    "kitti_3d_anab_fullalign": kitti_3d_anab_fullalign,
}


def load_config(name: str, **kw) -> Config:
    """Load a named config (ref:lib/core.py:36-46 loads via importlib)."""
    if name not in CONFIGS:
        raise KeyError(f"unknown config '{name}'; have {sorted(CONFIGS)}")
    return CONFIGS[name](**kw)
