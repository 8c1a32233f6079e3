"""Import reference PyTorch checkpoints (and ImageNet DLA weights).

Translates the reference model's state_dict naming
(ref:model/M3d_inference_align.py attribute names / ref:model/pose_dla_dcn.py
module structure / official dl.yf.io DLA checkpoints) into this framework's
flax parameter tree, with the layout conversions:

  * conv weights   [O, I, kh, kw]  -> HWIO [kh, kw, I, O]
  * batchnorm      weight/bias/running_mean/running_var ->
                   scale/bias + batch_stats mean/var
  * grouped ConvTranspose upsampling [O, 1, 2f, 2f] -> [2f, 2f, 1, O],
    spatially flipped (transposed conv applies the flipped kernel)
  * DCN offset-mask conv: the reference CUDA kernel reads tap k's (dy, dx)
    from channels (2k, 2k+1) of cat(o1, o2) and mask from o3
    (ref:model/DCNv2/dcn_v2.py:64-70 + dcn_v2_im2col_cuda.cu); this
    framework uses thirds [dy x KK | dx x KK | mask x KK] -> permute output
    channels accordingly
  * cls tower final conv: torch channel = class * A + anchor (implied by the
    reshape at ref:model/M3d_inference_align.py:229); here channel =
    anchor * C + class -> permute

Entry point: `load_reference_checkpoint(variables, state_dict, num_anchors,
num_classes)` returns updated (params, batch_stats). Keys that fail to match
are reported, not fatal (partial loading semantics of ref:lib/core.py:477-511).
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


# --------------------------------------------------------------------------
# converters
# --------------------------------------------------------------------------

def _conv_w(t):
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def _convT_w(t):
    t = np.asarray(t)              # [O, 1, 2f, 2f]
    t = t[:, :, ::-1, ::-1]        # flip spatially
    return np.transpose(t, (2, 3, 1, 0))


def _ident(t):
    return np.asarray(t)


def _dcn_offset_mask_w(t, KK):
    """Permute the offset-mask conv output channels (see module docstring)."""
    t = np.asarray(t)              # [3KK, I, k, k]
    perm = ([2 * k for k in range(KK)] + [2 * k + 1 for k in range(KK)]
            + list(range(2 * KK, 3 * KK)))
    return _conv_w(t[perm])


def _dcn_offset_mask_b(t, KK):
    t = np.asarray(t)
    perm = ([2 * k for k in range(KK)] + [2 * k + 1 for k in range(KK)]
            + list(range(2 * KK, 3 * KK)))
    return t[perm]


def _cls_conv_w(t, A, C):
    """torch out-channel c*A+a -> ours a*C+c."""
    t = np.asarray(t)
    perm = [c * A + a for a in range(A) for c in range(C)]
    return _conv_w(t[perm])


def _cls_conv_b(t, A, C):
    t = np.asarray(t)
    perm = [c * A + a for a in range(A) for c in range(C)]
    return t[perm]


# --------------------------------------------------------------------------
# name translation
# --------------------------------------------------------------------------

_HEAD_SEQ = {"Conv_0": "0", "BatchNorm_0": "1", "Conv_1": "3",
             "BatchNorm_1": "4", "Conv_2": "6"}
_HEAD_NAMES = {"cls_tower": "cls", "bbox_x": "bbox_x", "bbox_y": "bbox_y",
               "bbox_w": "bbox_w", "bbox_h": "bbox_h", "bbox_x3d": "bbox_x3d",
               "bbox_y3d": "bbox_y3d", "bbox_z3d": "bbox_z3d",
               "bbox_w3d": "bbox_w3d", "bbox_h3d": "bbox_h3d",
               "bbox_l3d": "bbox_l3d", "bbox_rY3d": "bbox_rY3d"}


def _bn_key(torch_prefix, leaf):
    return {
        "scale": f"{torch_prefix}.weight",
        "bias": f"{torch_prefix}.bias",
        "mean": f"{torch_prefix}.running_mean",
        "var": f"{torch_prefix}.running_var",
    }[leaf], _ident


def _block_child(rest_parts, torch_prefix, leaf, block):
    """Map block-internal paths for BasicBlock ('basic') / Bottleneck."""
    head, rest = rest_parts[0], rest_parts[1:]
    if block == "basic":
        m = {"ConvBNAct_0": ("conv1", "bn1"), "ConvBNAct_1": ("conv2", "bn2")}
        conv_name, bn_name = m[head]
        if rest[0] == "Conv_0":
            if leaf == "kernel":
                return f"{torch_prefix}.{conv_name}.weight", _conv_w
            return f"{torch_prefix}.{conv_name}.bias", _ident
        return _bn_key(f"{torch_prefix}.{bn_name}", leaf)
    # bottleneck: ConvBNAct_0 -> conv1/bn1, direct Conv_0/BatchNorm_0 ->
    # conv2/bn2, ConvBNAct_1 -> conv3/bn3
    if head == "ConvBNAct_0":
        if rest[0] == "Conv_0":
            return (f"{torch_prefix}.conv1.weight", _conv_w) if leaf == "kernel" \
                else (f"{torch_prefix}.conv1.bias", _ident)
        return _bn_key(f"{torch_prefix}.bn1", leaf)
    if head == "Conv_0":
        return (f"{torch_prefix}.conv2.weight", _conv_w) if leaf == "kernel" \
            else (f"{torch_prefix}.conv2.bias", _ident)
    if head == "BatchNorm_0":
        return _bn_key(f"{torch_prefix}.bn2", leaf)
    if head == "ConvBNAct_1":
        if rest[0] == "Conv_0":
            return (f"{torch_prefix}.conv3.weight", _conv_w) if leaf == "kernel" \
                else (f"{torch_prefix}.conv3.bias", _ident)
        return _bn_key(f"{torch_prefix}.bn3", leaf)
    raise KeyError(head)


def leaf_to_torch(leaf):
    # flax nn.Conv uses 'kernel'; our custom modules (DCN/Shape/CenterAlign)
    # name their HWIO conv weight 'weight'
    return {"kernel": "weight", "weight": "weight", "bias": "bias"}[leaf]


def flax_to_torch_key(path_parts, leaf, *, num_anchors, num_classes,
                      block="basic", dcn_kk=9):
    """Translate one flax param path (tuple of names) + leaf name into
    (torch_key, converter). Raises KeyError for untranslatable paths."""
    p = list(path_parts)
    A, C = num_anchors, num_classes

    # ------------------------------------------------ heads (Tower)
    if p[0] in _HEAD_NAMES:
        tname = _HEAD_NAMES[p[0]]
        idx = _HEAD_SEQ[p[1]]
        if p[1].startswith("Conv"):
            conv = (f"{tname}.{idx}.{leaf_to_torch(leaf)}")
            if tname == "cls" and p[1] == "Conv_2":
                return conv, (lambda t: _cls_conv_w(t, A, C)) \
                    if leaf == "kernel" else (lambda t: _cls_conv_b(t, A, C))
            return conv, _conv_w if leaf == "kernel" else _ident
        return _bn_key(f"{tname}.{idx}", leaf)

    # ------------------------------------------------ alignment / ANAB
    if p[0] == "shape_align_mod":
        return f"shape_align.align.{leaf_to_torch(leaf)}", \
            _conv_w if leaf in ("kernel", "weight") else _ident
    if p[0] in ("center_align2d", "center_align3d"):
        return f"{p[0]}.align.{leaf_to_torch(leaf)}", \
            _conv_w if leaf in ("kernel", "weight") else _ident
    if p[0] == "anab":
        return f"bbox_z3d_gl.0.{p[1]}.weight", _conv_w
    if p[0] == "anab_bn":
        return _bn_key("bbox_z3d_gl.1", leaf)

    # ------------------------------------------------ backbone / necks
    assert p[0] == "base", p
    p = p[1:]
    if p[0] == "base":   # DLA trunk
        p = p[1:]
        if p[0] == "base_conv":
            return "base.base.base_layer.0.weight", _conv_w
        if p[0] == "base_bn":
            return _bn_key("base.base.base_layer.1", leaf)
        m = re.match(r"ConvBNAct_(\d+)", p[0])
        if m:
            # level0 / level1 plain conv stacks; ConvBNAct index maps to
            # (level, conv-within-level) by construction order
            i = int(m.group(1))
            lvl = 0 if i == 0 else 1  # dla(34|102): one conv per level
            seq = 0
            base = f"base.base.level{lvl}"
            if p[1] == "Conv_0":
                return f"{base}.{seq * 3}.weight", _conv_w
            return _bn_key(f"{base}.{seq * 3 + 1}", leaf)
        m = re.match(r"Tree_(\d+)", p[0])
        if m:
            lvl = int(m.group(1)) + 2
            prefix = f"base.base.level{lvl}"
            rest = p[1:]
            # walk tree1/tree2 nesting
            while rest and rest[0] in ("tree1", "tree2"):
                prefix += f".{rest[0]}"
                rest = rest[1:]
            if rest[0] == "root":
                if rest[1] == "Conv_0":
                    return f"{prefix}.root.conv.weight", _conv_w
                return _bn_key(f"{prefix}.root.bn", leaf)
            if rest[0] == "project":
                if rest[1] == "Conv_0":
                    return f"{prefix}.project.0.weight", _conv_w
                return _bn_key(f"{prefix}.project.1", leaf)
            # block internals
            return _block_child(rest, prefix, leaf, block)

    # dla_up / ida_up
    if p[0] in ("dla_up", "ida_up"):
        if p[0] == "dla_up":
            m = re.match(r"idas_(\d+)", p[1])
            tprefix = f"base.dla_up.ida_{m.group(1)}"
            rest = p[2:]
        else:
            tprefix = "base.ida_up"
            rest = p[1:]
        m = re.match(r"(projs|nodes|ups)_(\d+)", rest[0])
        kind, j = m.group(1), int(m.group(2)) + 1
        if kind == "ups":
            return f"{tprefix}.up_{j}.weight", _convT_w
        tname = {"projs": "proj", "nodes": "node"}[kind]
        mod = f"{tprefix}.{tname}_{j}"
        sub = rest[1:]
        if sub[0] == "DCN_0":
            if len(sub) > 1 and sub[1] == "conv_offset_mask":
                conv = f"{mod}.conv.conv_offset_mask.{leaf_to_torch(leaf)}"
                return conv, (lambda t: _dcn_offset_mask_w(t, dcn_kk)) \
                    if leaf == "kernel" else (lambda t: _dcn_offset_mask_b(t, dcn_kk))
            # DCN main weight/bias (HWIO 'weight' param on our side)
            return f"{mod}.conv.{leaf_to_torch(leaf)}", \
                _conv_w if leaf in ("kernel", "weight") else _ident
        if sub[0] == "BatchNorm_0":
            return _bn_key(f"{mod}.actf.0", leaf)
        # plain-conv variant (ida_dcnv2=False)
        return f"{mod}.{leaf_to_torch(leaf)}", \
            _conv_w if leaf == "kernel" else _ident

    raise KeyError("/".join(path_parts) + ":" + leaf)


# --------------------------------------------------------------------------
# tree application
# --------------------------------------------------------------------------

def _walk_assign(tree, sd, translate, collection, stats):
    import jax.tree_util as jtu

    flat = jtu.tree_flatten_with_path(tree)[0]
    out = {}
    for path, val in flat:
        parts = tuple(str(k.key) for k in path)
        leaf = parts[-1]
        try:
            key, conv = translate(parts[:-1], leaf)
        except (KeyError, AssertionError, AttributeError, IndexError):
            stats["unmapped"].append("/".join(parts))
            out[path] = val
            continue
        if key not in sd:
            stats["missing"].append(key)
            out[path] = val
            continue
        new = conv(sd[key])
        if tuple(new.shape) != tuple(val.shape):
            stats["shape_mismatch"].append(
                f"{key}: {new.shape} vs {val.shape}")
            out[path] = val
            continue
        out[path] = np.asarray(new, dtype=np.asarray(val).dtype)
        stats["loaded"] += 1
    treedef = jtu.tree_structure(tree)
    return jtu.tree_unflatten(treedef, [out[p] for p, _ in flat])


def load_reference_checkpoint(variables, state_dict: Dict[str, Any],
                              num_anchors: int, num_classes: int,
                              block: str = "basic", strip_module=True):
    """Map a torch state_dict into (params, batch_stats).

    `block`: 'basic' for dla34-family, 'bottleneck' for dla60/102.
    Returns (params, batch_stats, stats) — stats reports loaded / unmapped /
    missing keys (partial-load semantics of ref:lib/core.py:477-511).
    """
    sd = {}
    for k, v in state_dict.items():
        if strip_module and k.startswith("module."):
            k = k[len("module."):]
        sd[k] = np.asarray(v)

    stats = {"loaded": 0, "unmapped": [], "missing": [], "shape_mismatch": []}

    def tr(parts, leaf):
        return flax_to_torch_key(parts, leaf, num_anchors=num_anchors,
                                 num_classes=num_classes, block=block)

    params = _walk_assign(variables["params"], sd, tr, "params", stats)
    batch_stats = _walk_assign(variables.get("batch_stats", {}), sd, tr,
                               "batch_stats", stats)
    logging.info("torch import: %d loaded, %d unmapped, %d missing, "
                 "%d shape mismatches", stats["loaded"],
                 len(stats["unmapped"]), len(stats["missing"]),
                 len(stats["shape_mismatch"]))
    return params, batch_stats, stats


def has_learned_dcn_offsets(state_dict: Dict[str, Any]) -> bool:
    """True if the checkpoint carries learned DCN offset predictors
    (ref:model/DCNv2/dcn_v2.py:44-70 `conv_offset_mask`)."""
    return any("conv_offset_mask" in k for k in state_dict)


def pin_parity_conf(conf, state_dict: Dict[str, Any]):
    """Force the exact gather-path DCN when importing reference weights.

    The shift-decomposed DCN (`ops/dcn.py:dcn_v2_shift`, enabled by
    `conf.dcn_shift_clamp`) is exact only for |offset| <= clamp. Reference
    checkpoints have *unbounded* learned neck offsets
    (ref:model/DCNv2/dcn_v2.py:44-70), so any checkpoint containing
    `conv_offset_mask` weights must run through the unbounded gather path
    (`dcn_v2`) or its forward silently diverges from the reference.
    ImageNet-DLA trunk checkpoints have no offset predictors and keep the
    fast shift path (offsets are then zero-init and stay within the clamp
    early in training by construction).
    """
    if getattr(conf, "dcn_shift_clamp", None) is not None \
            and has_learned_dcn_offsets(state_dict):
        logging.info(
            "torch import: checkpoint has learned DCN offsets -> pinning "
            "dcn_shift_clamp=None (exact gather path, parity configuration)")
        return conf.replace(dcn_shift_clamp=None)
    return conf


def load_torch_file(path: str) -> Dict[str, Any]:
    """Load a .pth/.pkl torch checkpoint on CPU."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}
