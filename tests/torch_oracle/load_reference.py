"""Import the reference's own model code (from /root/reference, read-only,
executed in place) against the vendored compressai/timm stubs.

This gives an end-to-end oracle whose forward semantics are literally the
reference's (models/reference/tcm.py) rather than a reimplementation —
the strongest feasible stand-in for the unreachable released checkpoints.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

REF_SRC = "/root/reference/src"


def reference_available() -> bool:
    return os.path.isfile(os.path.join(REF_SRC, "models", "reference", "tcm.py"))


def _install_stubs():
    if "compressai" in sys.modules:
        return
    from . import compressai_stub as S

    compressai = types.ModuleType("compressai")
    em = types.ModuleType("compressai.entropy_models")
    em.EntropyBottleneck = S.EntropyBottleneck
    em.GaussianConditional = S.GaussianConditional
    ans = types.ModuleType("compressai.ans")
    ans.BufferedRansEncoder = S.BufferedRansEncoder
    ans.RansDecoder = S.RansDecoder
    layers = types.ModuleType("compressai.layers")
    for name in ("AttentionBlock", "ResidualBlock", "ResidualBlockUpsample",
                 "ResidualBlockWithStride", "conv3x3", "conv1x1",
                 "subpel_conv3x3", "GDN"):
        setattr(layers, name, getattr(S, name))
    cmodels = types.ModuleType("compressai.models")
    cutils = types.ModuleType("compressai.models.utils")
    cutils.update_registered_buffers = S.update_registered_buffers
    cmodels.utils = cutils
    compressai.entropy_models = em
    compressai.ans = ans
    compressai.layers = layers
    compressai.models = cmodels
    sys.modules["compressai"] = compressai
    sys.modules["compressai.entropy_models"] = em
    sys.modules["compressai.ans"] = ans
    sys.modules["compressai.layers"] = layers
    sys.modules["compressai.models"] = cmodels
    sys.modules["compressai.models.utils"] = cutils

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        tmodels = types.ModuleType("timm.models")
        tlayers = types.ModuleType("timm.models.layers")
        tlayers.trunc_normal_ = S.trunc_normal_
        tlayers.DropPath = S.DropPath
        tmodels.layers = tlayers
        timm.models = tmodels
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = tmodels
        sys.modules["timm.models.layers"] = tlayers


def _load_module(name: str, path: str):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_tcm():
    """Returns the reference TCM class, imported from /root/reference with
    relative imports resolved against a synthetic package (so
    src/models/__init__.py — which pulls the whole zoo — never runs)."""
    _install_stubs()
    for pkg_name, pkg_path in (
        ("refsrc", REF_SRC),
        ("refsrc.models", os.path.join(REF_SRC, "models")),
        ("refsrc.models.reference", os.path.join(REF_SRC, "models", "reference")),
    ):
        if pkg_name not in sys.modules:
            pkg = types.ModuleType(pkg_name)
            pkg.__path__ = [pkg_path]
            sys.modules[pkg_name] = pkg
    _load_module("refsrc.models.base", os.path.join(REF_SRC, "models", "base.py"))
    tcm_mod = _load_module(
        "refsrc.models.reference.tcm",
        os.path.join(REF_SRC, "models", "reference", "tcm.py"),
    )
    return tcm_mod.TCM
