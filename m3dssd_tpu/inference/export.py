"""AOT export of the detector as a portable StableHLO artifact.

Extra beyond the reference (which deploys by unpickling torch modules):
`jax.export` serializes the FULL jitted detect graph — forward, decode and
NMS, with the trained weights baked in as constants — into one
self-contained blob. A serving process deserializes and calls it without
the model-building code, the config, or the checkpoint machinery; the
artifact is lowered for an explicit platform list (e.g. tpu + cpu), so the
same file runs on a TPU server and on a CPU fallback host.

The exported signature is `(image, scale_factor) -> dets [top_post, 14]`
(batched: `(images [B,...], scale_factors [B]) -> [B, top_post, 14]`),
with rows in `detect.DET_COLS` order and score <= 0 marking padding.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from .detect import DET_COLS, make_batch_detector, make_detector

# sidecar metadata written next to the artifact
_META_SUFFIX = ".json"


def _input_specs(conf, batch_size: int, packed_input: bool, image_dtype):
    h, w = (int(s) for s in conf.test_scale)
    if packed_input:
        img_shape = (h // 2, w // 2, 12)
    else:
        img_shape = (h, w, 3)
    if batch_size:
        img = jax.ShapeDtypeStruct((batch_size,) + img_shape, image_dtype)
        sf = jax.ShapeDtypeStruct((batch_size,), jnp.float32)
    else:
        img = jax.ShapeDtypeStruct((1,) + img_shape, image_dtype)
        sf = jax.ShapeDtypeStruct((), jnp.float32)
    return img, sf


def export_detector(conf, rois: np.ndarray, model, params, batch_stats, *,
                    batch_size: int = 0, packed_input: bool = False,
                    platforms=("tpu", "cpu"), fold_bn: bool = False,
                    image_dtype=jnp.float32) -> jexport.Exported:
    """Export `(image, scale_factor) -> dets` with weights as constants.

    `batch_size=0` exports the single-image detector ([1, H, W, C] input,
    scalar scale factor); `batch_size=B` exports the batched one. With
    `packed_input` the image arrives space-to-depth packed
    ([B, H/2, W/2, 12], models/dla.py:space_to_depth_np). `fold_bn`
    constant-folds BatchNorm into the preceding convs before lowering
    (utils/fold_bn.py — exact for the frozen eval graph).
    """
    if fold_bn:
        from ..utils.fold_bn import fold_bn_eval
        params, batch_stats, _ = fold_bn_eval(params, batch_stats)
    if batch_size:
        det = make_batch_detector(conf, rois, model,
                                  packed_input=packed_input)
    else:
        det = make_detector(conf, rois, model, packed_input=packed_input)
    # Close over the weights: they lower into the module as constants, so
    # the artifact is self-contained (no checkpoint needed at serving time).
    fn = jax.jit(lambda image, sf: det(params, batch_stats, image, sf))
    img, sf = _input_specs(conf, batch_size, packed_input, image_dtype)
    return jexport.export(fn, platforms=list(platforms))(img, sf)


def save_exported(exp: jexport.Exported, path: str, conf=None,
                  batch_size: int = 0, packed_input: bool = False) -> None:
    """Write the serialized artifact + a human-readable JSON sidecar."""
    data = exp.serialize()
    with open(path, "wb") as f:
        f.write(data)
    meta = {
        "det_cols": DET_COLS,
        "platforms": list(exp.platforms),
        "in_avals": [str(a) for a in exp.in_avals],
        "out_avals": [str(a) for a in exp.out_avals],
        "batch_size": batch_size,
        "packed_input": packed_input,
        "bytes": len(data),
    }
    if conf is not None:
        meta["test_scale"] = [int(s) for s in conf.test_scale]
        meta["score_thres"] = float(getattr(conf, "score_thres", 0.0))
    with open(path + _META_SUFFIX, "w") as f:
        json.dump(meta, f, indent=2)


def load_detector(path: str):
    """Deserialize an exported detector; returns a jitted callable
    `(image, scale_factor) -> dets` (plus `.exported` / `.meta`)."""
    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    call = jax.jit(exp.call)

    def detect(image, scale_factor):
        return call(image, scale_factor)

    detect.exported = exp
    detect.meta = None
    if os.path.exists(path + _META_SUFFIX):
        with open(path + _META_SUFFIX) as f:
            detect.meta = json.load(f)
    return detect
