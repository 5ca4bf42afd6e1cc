"""Record golden activations from the torch reference into tests/goldens/.

Each golden is one npz: seeded small-config reference module weights
(fp32), a seeded structured input, and the fp64 reference output.  The
committed files make module parity checkable forever without importing the
live reference (and at better-than-fp32 reference precision).

Run from the repo root:  python tools/make_goldens.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import torch

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "tests", "goldens")

from tests import _reference  # noqa: E402

_reference.add_reference_to_path()


def save(name: str, module: torch.nn.Module, inputs, output):
    state = {f"w::{k}": v.detach().numpy().astype(np.float32)
             for k, v in module.state_dict().items()}
    arrays = dict(state)
    for i, x in enumerate(inputs):
        arrays[f"in::{i}"] = np.asarray(x)
    if isinstance(output, (tuple, list)):
        for i, o in enumerate(output):
            arrays[f"out::{i}"] = o.detach().numpy().astype(np.float64)
    else:
        arrays["out::0"] = output.detach().numpy().astype(np.float64)
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, f"{name}.npz")
    np.savez_compressed(path, **arrays)
    print(f"{name}: {os.path.getsize(path) / 1e6:.2f} MB")


def golden_vit_block():
    from depth_anything_v2.dinov2 import DinoVisionTransformer
    torch.manual_seed(10)
    ref = DinoVisionTransformer(img_size=518, patch_size=14, embed_dim=64,
                                depth=3, num_heads=4, mlp_ratio=4,
                                block_chunks=0, init_values=1.0,
                                interpolate_antialias=False,
                                interpolate_offset=0.1).double().eval()
    rng = np.random.default_rng(10)
    x = rng.standard_normal((1, 3, 70, 84)).astype(np.float64)
    with torch.no_grad():
        outs = ref.get_intermediate_layers(
            torch.from_numpy(x), [0, 2], return_class_token=True)
    flat = [t for pair in outs for t in pair]
    save("vit_tiny_d3", ref, [x.astype(np.float32)], flat)


def golden_dpt_head():
    from depth_anything_v2.dpt import DPTHead
    torch.manual_seed(11)
    ref = DPTHead(in_channels=64, features=32,
                  out_channels=[24, 48, 96, 96],
                  use_clstoken=False).double().eval()
    rng = np.random.default_rng(11)
    feats = [rng.standard_normal((1, 36, 64)).astype(np.float64)
             for _ in range(4)]
    with torch.no_grad():
        depth, feat = ref([[torch.from_numpy(f), None] for f in feats],
                          6, 6)
    save("dpt_head", ref, [np.stack(feats).astype(np.float32)],
         [depth, feat])


def golden_temporal_module():
    from video_depth_anything.motion_module.motion_module import (
        TemporalModule)
    torch.manual_seed(12)
    ref = TemporalModule(in_channels=32, num_attention_heads=4,
                         num_transformer_block=1,
                         num_attention_blocks=2,
                         temporal_max_len=8).double().eval()
    rng = np.random.default_rng(12)
    x = rng.standard_normal((1, 32, 4, 6, 6)).astype(np.float64)  # b c s h w
    with torch.no_grad():
        out, caches = ref(torch.from_numpy(x), None)
    save("temporal_module", ref, [x.astype(np.float32)],
         [out] + list(caches))


def golden_memory_attention():
    from sam2.modeling.memory_attention import (MemoryAttention,
                                                MemoryAttentionLayer)
    from sam2.modeling.sam.transformer import RoPEAttention
    torch.manual_seed(13)
    layer = MemoryAttentionLayer(
        activation="relu", d_model=32, dim_feedforward=64, dropout=0.0,
        pos_enc_at_attn=False, pos_enc_at_cross_attn_keys=True,
        pos_enc_at_cross_attn_queries=False,
        self_attention=RoPEAttention(embedding_dim=32, num_heads=2,
                                     dropout=0.0, feat_sizes=(6, 6)),
        cross_attention=RoPEAttention(embedding_dim=32, num_heads=2,
                                      dropout=0.0, rope_k_repeat=True,
                                      kv_in_dim=16, feat_sizes=(6, 6)))
    ref = MemoryAttention(d_model=32, pos_enc_at_input=True, layer=layer,
                          num_layers=2, batch_first=True).double().eval()
    rng = np.random.default_rng(13)
    curr = rng.standard_normal((1, 36, 32)).astype(np.float64)
    curr_pos = rng.standard_normal((1, 36, 32)).astype(np.float64)
    memory = rng.standard_normal((1, 72, 16)).astype(np.float64)
    memory_pos = rng.standard_normal((1, 72, 16)).astype(np.float64)
    with torch.no_grad():
        out = ref(torch.from_numpy(curr), torch.from_numpy(memory),
                  torch.from_numpy(curr_pos), torch.from_numpy(memory_pos),
                  num_obj_ptr_tokens=0)
    save("memory_attention", ref,
         [a.astype(np.float32) for a in (curr, memory, curr_pos,
                                         memory_pos)], out)


def golden_losses():
    import types
    if "pytorch_msssim" not in sys.modules:
        mod = types.ModuleType("pytorch_msssim")
        mod.MS_SSIM = type("MS_SSIM", (), {"__init__":
                                           lambda self, **kw: None})
        sys.modules["pytorch_msssim"] = mod
    from loss.loss import VideoDepthLoss
    torch.manual_seed(14)
    # the reference loss hardcodes fp32 buffers (loss.py:59-61) - run fp32
    crit = VideoDepthLoss(alpha=0.5, stable_scale=10.0, ssim_loss_scale=0.0)
    rng = np.random.default_rng(14)
    pred = (rng.random((1, 4, 48, 48)) + 0.1).astype(np.float32)
    gt = (rng.random((1, 4, 48, 48)) + 0.1).astype(np.float32)
    mask = (rng.random((1, 4, 48, 48)) > 0.15)
    with torch.no_grad():
        out = crit(torch.from_numpy(pred), torch.from_numpy(gt),
                   torch.from_numpy(mask))
    keys = sorted(out)  # dict of scalar tensors
    vals = np.array([float(out[k]) for k in keys], np.float64)
    arrays = {"in::pred": pred.astype(np.float32),
              "in::gt": gt.astype(np.float32),
              "in::mask": mask,
              "out::logkeys": np.array(keys),
              "out::logvals": vals}
    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "video_depth_loss.npz"), **arrays)
    print("video_depth_loss saved")


def main():
    golden_vit_block()
    golden_dpt_head()
    golden_temporal_module()
    golden_memory_attention()
    golden_losses()


if __name__ == "__main__":
    main()
