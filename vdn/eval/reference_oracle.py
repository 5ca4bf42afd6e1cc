"""Oracle access to the read-only torch reference checkout.

The reference implementation is the behavioral spec: tests and the
weight-parity runner (vdn.cli.parity_run) EXECUTE it to generate
expectations — vdn never imports implementation code from it.

This module installs tiny import shims for packages the reference
expects but this image lacks (torchvision.transforms.Compose,
easydict.EasyDict) and exposes the reference root on sys.path.
"""

from __future__ import annotations

import os
import sys
import types

DEFAULT_REFERENCE_PATH = os.environ.get("VDN_REFERENCE_PATH",
                                        "/root/reference")


def _install_shims():
    if "torchvision" not in sys.modules:
        import importlib.machinery
        tv = types.ModuleType("torchvision")
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        tvt = types.ModuleType("torchvision.transforms")
        tvt.__spec__ = importlib.machinery.ModuleSpec(
            "torchvision.transforms", None)

        class Compose:
            def __init__(self, fns):
                self.fns = fns

            def __call__(self, x):
                for f in self.fns:
                    x = f(x)
                return x

        tvt.Compose = Compose
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    try:
        import easydict  # noqa: F401
    except ImportError:
        ed = types.ModuleType("easydict")

        class EasyDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed


def add_reference_to_path(path: str = None):
    path = path or DEFAULT_REFERENCE_PATH
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"reference checkout not found at {path}; set "
            "VDN_REFERENCE_PATH or pass --reference-path")
    _install_shims()
    if path not in sys.path:
        sys.path.insert(0, path)


def state_dict_numpy(module):
    """torch module state_dict as {name: np.ndarray}."""
    return {k: v.detach().cpu().numpy()
            for k, v in module.state_dict().items()}
