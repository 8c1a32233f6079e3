"""Eval-time BatchNorm folding (constant-fold BN into the preceding conv).

For a frozen (eval/export) graph, BN with running stats is an affine
per-channel transform of a linear op's output:

    BN(conv(x)) = s * (W x + b - mean) + beta,   s = scale / sqrt(var + eps)
                = (s*W) x + (s*(b - mean) + beta)

so the multiply folds into the conv kernel and the additive constant into a
bias, deleting the BN math from the graph. XLA typically fuses the BN
scale/shift into the conv epilogue anyway — this utility exists to MEASURE
that claim (PERF.md) and to shrink the exported artifact's op count
(inference/export.py `fold_bn=True`).

Folding is applied only at module scopes whose conv->BN adjacency is known
by construction (folding at the wrong pair would be silently wrong — e.g.
the ANAB scope interleaves gate convs, so its two BNs stay unfolded):

  * `ConvBNAct` (models/layers.py): keys {Conv_0, BatchNorm_0}
  * `DeformConv` (models/necks.py): keys {DCN_0, BatchNorm_0} — the DCN
    output is linear in its `weight`/`bias`, so BN folds the same way
  * RPN head towers (models/rpn.py Tower): keys {Conv_0, BatchNorm_0,
    Conv_1, BatchNorm_1, Conv_2}

After folding, each affected BN is left as an EXACT identity-plus-bias:
scale=1, mean=0, var=1-eps (so 1/sqrt(var+eps) == 1.0), with any residual
additive constant in its bias leaf — the param tree shape is unchanged, so
folded weights load anywhere the originals do.

The transform is exact up to float rounding; tests/test_export.py asserts
output equality on the full flagship model.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np


def _is_bn(node) -> bool:
    return isinstance(node, dict) and {"scale", "bias"} <= set(node)


def _fold_pair(lin_p: Dict[str, Any], kernel_key: str, bn_p: Dict[str, Any],
               bn_s: Dict[str, Any], eps: float):
    """Fold one (linear-op params, BN params, BN stats) triple in place
    (on copies made by the caller)."""
    s = np.asarray(bn_p["scale"], np.float64) / np.sqrt(
        np.asarray(bn_s["var"], np.float64) + eps)
    kernel = np.asarray(lin_p[kernel_key], np.float64)
    lin_p[kernel_key] = jnp.asarray(kernel * s, dtype=_dtype(lin_p[kernel_key]))

    add = np.asarray(bn_p["bias"], np.float64) \
        - np.asarray(bn_s["mean"], np.float64) * s
    if "bias" in lin_p:
        # conv's own bias scales too; move everything into the conv bias and
        # make the BN a pure identity
        b = np.asarray(lin_p["bias"], np.float64)
        lin_p["bias"] = jnp.asarray(b * s + add, dtype=_dtype(lin_p["bias"]))
        add = np.zeros_like(add)
    bn_p["scale"] = jnp.ones_like(jnp.asarray(bn_p["scale"]))
    bn_p["bias"] = jnp.asarray(add, dtype=_dtype(bn_p["bias"]))
    bn_s["mean"] = jnp.zeros_like(jnp.asarray(bn_s["mean"]))
    bn_s["var"] = jnp.full_like(jnp.asarray(bn_s["var"]), 1.0 - eps)


def _dtype(x):
    return jnp.asarray(x).dtype


def _copy_tree(t):
    if isinstance(t, dict):
        return {k: _copy_tree(v) for k, v in t.items()}
    return t


def _walk(p: Dict[str, Any], s: Dict[str, Any], eps: float) -> int:
    n = 0
    keys = set(p)
    # ConvBNAct / tower patterns: Conv_i immediately feeds BatchNorm_i
    safe_tower = keys in ({"Conv_0", "BatchNorm_0"},
                          {"Conv_0", "BatchNorm_0", "Conv_1", "BatchNorm_1",
                           "Conv_2"})
    if safe_tower:
        for i in (0, 1):
            ck, bk = f"Conv_{i}", f"BatchNorm_{i}"
            if ck in p and bk in p and _is_bn(p[bk]) and bk in s:
                _fold_pair(p[ck], "kernel", p[bk], s[bk], eps)
                n += 1
    elif keys == {"DCN_0", "BatchNorm_0"} and _is_bn(p["BatchNorm_0"]) \
            and "weight" in p["DCN_0"]:
        _fold_pair(p["DCN_0"], "weight", p["BatchNorm_0"],
                   s["BatchNorm_0"], eps)
        n += 1
    for k, v in p.items():
        if isinstance(v, dict) and not _is_bn(v) and k not in ("DCN_0",):
            n += _walk(v, s.get(k, {}) if isinstance(s, dict) else {}, eps)
    return n


def fold_bn_eval(params, batch_stats, eps: float = 1e-5
                 ) -> Tuple[Dict[str, Any], Dict[str, Any], int]:
    """Return (params', batch_stats', n_folded) with BN constant-folded into
    the preceding conv at every known-safe scope. Exact for eval graphs
    (running-stats BN); do NOT train on the folded tree."""
    p = _copy_tree(params)
    s = _copy_tree(batch_stats)
    n = _walk(p, s, eps)
    return p, s, n
