"""Hiera backbone parity vs reference sam2 hieradet."""

import sys
import types

import numpy as np
import torch

from tests import _reference

_reference.add_reference_to_path()

# hieradet imports iopath for checkpoint loading only; shim if absent
try:
    import iopath  # noqa: F401
except ImportError:
    io_mod = types.ModuleType("iopath")
    common = types.ModuleType("iopath.common")
    file_io = types.ModuleType("iopath.common.file_io")
    file_io.g_pathmgr = None
    io_mod.common = common
    common.file_io = file_io
    sys.modules["iopath"] = io_mod
    sys.modules["iopath.common"] = common
    sys.modules["iopath.common.file_io"] = file_io

from sam2.modeling.backbones.hieradet import Hiera as RefHiera  # noqa: E402

from vdn.core.convert import convert_torch_state  # noqa: E402
from vdn.nn.hiera import Hiera  # noqa: E402

CFG = dict(embed_dim=32, num_heads=1, stages=(1, 1, 2, 1),
           global_att_blocks=(3,), window_spec=(8, 4, 14, 7),
           window_pos_embed_bkg_spatial_size=(14, 14))


def test_hiera_forward_matches():
    torch.manual_seed(0)
    ref = RefHiera(**CFG).eval()
    params = {"params": convert_torch_state(_reference.state_dict_numpy(ref))}
    model = Hiera(**CFG)

    rng = np.random.default_rng(0)
    # grid (H/4) must be divisible by window_spec[0]=8: the reference's
    # windowed pos-embed tiling asserts otherwise (hieradet.py:276-279)
    x = rng.standard_normal((2, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    got = model.apply(params, x)
    assert len(got) == len(ref_outs) == 4
    for i, (g, r) in enumerate(zip(got, ref_outs)):
        # reference returns NCHW
        np.testing.assert_allclose(np.moveaxis(np.asarray(g), -1, 1),
                                   r.numpy(), rtol=1e-4, atol=1e-4,
                                   err_msg=f"stage {i}")
    # pyramid strides 4/8/16/32
    assert [g.shape[1] for g in got] == [32, 16, 8, 4]
    assert [g.shape[-1] for g in got] == [32, 64, 128, 256]
