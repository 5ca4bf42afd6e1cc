"""Oracle access to the read-only torch reference at /root/reference.

Used ONLY to generate parity expectations inside tests — the vdn
implementation never imports from here.  Installs tiny shims for
torchvision/easydict (not in this image), then exposes the reference
packages on sys.path.
"""

import sys
import types

_REFERENCE_PATH = "/root/reference"


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


def add_reference_to_path():
    _install_shims()
    if _REFERENCE_PATH not in sys.path:
        sys.path.insert(0, _REFERENCE_PATH)


def state_dict_numpy(module):
    """torch module state_dict as {name: np.ndarray}."""
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
