"""Import shim for executing the LIVE reference code (differential parity).

The upstream reference at /root/reference is torch-0.4-era CUDA code, but its
host-side numpy/torch logic (anchors, targets, box transforms, augmentations,
the `RPN_3D_loss_smp` loss on CPU tensors, and the plain-conv DLA forward)
runs fine under the installed torch 2.x CPU build once its unbuildable /
uninstalled dependencies are stubbed out of ``sys.modules``:

- ``easydict`` / ``shapely`` (not installed here),
- ``lib.nms.gpu_nms`` (Cython+CUDA extension, never built),
- ``lib.eval.*`` (numba / numba.cuda, numba not installed),
- ``model.DCNv2.dcn_v2`` (CUDA extension; the parity gates only exercise the
  ``ida_dcnv2=False`` plain-conv paths so the class is never instantiated).

Every stub is inert: tests only call code paths that never touch them, so a
stub being *hit* is itself a failure signal (each raises on use).

This module deliberately lives under tests/ — the framework itself has no
dependency on the reference tree.
"""

from __future__ import annotations

import sys
import types

REF_ROOT = "/root/reference"


class _EasyDict(dict):
    """Minimal easydict twin: attribute access over a dict, recursive on
    construction (enough for the reference conf objects the tests build)."""

    def __init__(self, d=None, **kw):
        super().__init__()
        if d:
            for k, v in d.items():
                self[k] = v
        for k, v in kw.items():
            self[k] = v

    def __setitem__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, _EasyDict):
            v = _EasyDict(v)
        super().__setitem__(k, v)

    __setattr__ = __setitem__

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def _raising(name):
    def fn(*a, **kw):
        raise AssertionError(
            f"reference parity test unexpectedly reached stubbed '{name}'")
    return fn


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


_installed = False


def install():
    """Idempotently make the reference importable; returns nothing.

    After this, ``import lib.rpn_util`` etc. resolve against /root/reference.
    """
    global _installed
    if _installed:
        return
    import matplotlib
    matplotlib.use("Agg")
    sys.dont_write_bytecode = True  # never write pycache into /root/reference

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)

    # --- uninstalled third-party deps -----------------------------------
    if "easydict" not in sys.modules:
        _stub_module("easydict", EasyDict=_EasyDict)
    if "torchvision" not in sys.modules:
        # `from torchvision import models` at M3d_inference_align.py:2 is a
        # dead import (nothing references `models`)
        tv = _stub_module("torchvision")
        tv.models = _stub_module("torchvision.models")
    if "shapely" not in sys.modules:
        shp = _stub_module("shapely")
        geom = _stub_module("shapely.geometry", Polygon=_raising("shapely.Polygon"))
        shp.geometry = geom

    # --- unbuilt native extensions --------------------------------------
    # Import the real parent (namespace) packages first, then register each
    # stub under its full dotted name AND as the parent's attribute — a bare
    # sys.modules entry short-circuits `import a.b.c` without binding
    # `a.b`, which breaks the reference's `import lib.eval.kitti_common as
    # kitti` form (observed: "cannot import name 'eval' from 'lib'").
    import importlib

    def _stub_child(parent_name, child, **attrs):
        full = f"{parent_name}.{child}"
        if full in sys.modules:
            return sys.modules[full]
        parent = importlib.import_module(parent_name)
        mod = _stub_module(full, **attrs)
        setattr(parent, child, mod)
        return mod

    _stub_child("lib.nms", "gpu_nms", gpu_nms=_raising("gpu_nms"))
    _stub_child("lib.eval", "kitti_common",
                get_label_annos=_raising("get_label_annos"))
    _stub_child("lib.eval", "eval",
                get_official_eval_result=_raising("get_official_eval_result"))

    class _NoDCN:  # instantiating = reaching CUDA DCN = parity test bug
        def __init__(self, *a, **kw):
            raise AssertionError("reference parity test instantiated DCN")
    _stub_child("model.DCNv2", "dcn_v2", DCN=_NoDCN, DCNv2=_NoDCN)

    _installed = True


def ref_import(name):
    """install() + importlib.import_module(name)."""
    install()
    import importlib
    return importlib.import_module(name)
