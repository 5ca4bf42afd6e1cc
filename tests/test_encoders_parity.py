"""DINOv2Encoder adapter parity: CLS-drop / last_hidden_state semantics.

The reference wrapper (models/dinov2_encoder.py:44-60) returns the HF
AutoModel's ``last_hidden_state[:, 1:]`` — final-layernormed patch tokens
with the CLS token dropped.  The oracle here is the reference's own
torch DINOv2 (identical weights modulo naming): its
``forward_features(...)['x_norm_patchtokens']`` is exactly that tensor
(depth_anything_v2/dinov2.py:253-266).
"""

import numpy as np
import torch

from tests import _reference

_reference.add_reference_to_path()

from depth_anything_v2.dinov2 import DINOv2  # noqa: E402  (oracle)

from vdn.core.convert import convert_torch_state  # noqa: E402
from vdn.nn.encoders import DINOv2Encoder  # noqa: E402


def test_dinov2_encoder_last_hidden_state_semantics():
    torch.manual_seed(0)
    ref = DINOv2("vits").eval()
    params = {"params": {
        "model": convert_torch_state(_reference.state_dict_numpy(ref))}}
    enc = DINOv2Encoder(model_name="dinov2_vits14")

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 140, 154, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref.forward_features(
            torch.from_numpy(np.moveaxis(x, -1, 1).copy())
        )["x_norm_patchtokens"].numpy()

    got = np.asarray(enc.apply(params, x))
    assert got.shape == (2, (140 // 14) * (154 // 14), 384) == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
