"""Parity: vdn.nn.hiera_mae (plain MAE Hiera) vs transformers HieraModel.

The reference's v1 encoder is the torch-hub MAE Hiera
(reference models/hiera_image_encoder.py:35), which needs network access.
The transformers ``HieraModel`` is a faithful offline port of the same
architecture (weights convert 1:1 from the hub release), so it serves as
the parity oracle: random-init HF weights are mapped onto the vdn module
and the per-stage intermediates + pooled output must agree.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vdn.nn.hiera_mae import HieraMae, make_hiera_mae  # noqa: E402


def _hf_to_vdn(hf_model, depths):
    """Map HF HieraModel weights onto the vdn HieraMae param tree via the
    hub-layout keys (flat ``blocks.{i}``) + the generic converter."""
    from vdn.core.convert import convert_torch_state

    cum = [0]
    for d in depths:
        cum.append(cum[-1] + d)

    state = {}
    for key, value in hf_model.state_dict().items():
        value = value.detach().cpu().numpy()
        if key == "embeddings.position_embeddings":
            state["pos_embed"] = value
        elif key.startswith("embeddings.patch_embeddings.projection."):
            leaf = key.rsplit(".", 1)[1]
            state[f"patch_embed.proj.{leaf}"] = value
        elif key.startswith("encoder.stages."):
            parts = key.split(".")
            s, j = int(parts[2]), int(parts[4])
            i = cum[s] + j
            rest = ".".join(parts[5:])
            rest = (rest.replace("layernorm_before", "norm1")
                        .replace("layernorm_after", "norm2"))
            state[f"blocks.{i}.{rest}"] = value
        elif key.startswith("pooler.layernorm."):
            state[f"norm.{key.rsplit('.', 1)[1]}"] = value
        else:
            raise AssertionError(f"unmapped HF key {key}")
    return {"params": convert_torch_state(state)}


def _run_pair(hf_config, vdn_model, img_hw, seed=0):
    hf = transformers.HieraModel(hf_config, add_pooling_layer=True)
    hf.eval()
    params = _hf_to_vdn(hf, hf_config.depths)

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((2, img_hw, img_hw, 3)).astype(np.float32)

    with torch.no_grad():
        out = hf(torch.from_numpy(x).permute(0, 3, 1, 2),
                 output_hidden_states=True)
    # reshaped_hidden_states: embedding + one entry per stage, NHWC
    ref_inter = [t.numpy() for t in out.reshaped_hidden_states[1:]]
    ref_pooled = out.pooler_output.numpy()

    pooled, inter = jax.jit(vdn_model.apply)(params, jnp.asarray(x))

    def check(got, want):
        # fp32 accumulation-order noise concentrates on near-zero
        # elements, so element-wise rtol misfires; bound the error
        # against the feature's own scale instead (0.05% of peak)
        got = np.asarray(got)
        assert got.shape == want.shape
        err = np.abs(got - want).max()
        scale = np.abs(want).max()
        assert err <= 5e-4 * max(scale, 1.0), (err, scale)

    assert len(inter) == len(ref_inter)
    for got, want in zip(inter, ref_inter):
        check(got, want)
    check(pooled, ref_pooled)


def test_hiera_mae_small_config_parity():
    """Scaled-down config exercising every mechanism (pool transitions,
    window lag, dim changes) at low cost."""
    cfg = transformers.HieraConfig(
        embed_dim=32, num_heads=[1, 2, 4, 8], depths=[2, 2, 2, 2],
        image_size=[128, 128], initializer_range=0.5)
    model = HieraMae(embed_dim=32, num_heads=1, stages=(2, 2, 2, 2),
                     img_size=128)
    _run_pair(cfg, model, img_hw=128)


@pytest.mark.slow
def test_hiera_mae_base_224_parity():
    """The real hiera_base_224 architecture the reference hub-loads."""
    cfg = transformers.HieraConfig(initializer_range=0.2)  # base defaults
    model = make_hiera_mae("hiera_base_224")
    _run_pair(cfg, model, img_hw=224)


def test_hub_layout_conversion():
    """Hub-layout state dicts (``blocks.{i}.*`` flat keys — what reference
    v1 checkpoints embed) convert onto the module via the generic
    converter with no renames beyond the head skip."""
    from vdn.core.convert import convert_torch_state

    model = HieraMae(embed_dim=32, num_heads=1, stages=(1, 1, 1, 1),
                     img_size=64)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    # synthesize a hub-layout state dict from the flax tree's shapes
    def hub_state(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                out.update(hub_state(v, path))
                continue
            key = path.replace("blocks_", "blocks.").replace(
                "/", ".")
            v = np.asarray(v)
            if k == "kernel":
                base = key[: -len(".kernel")]
                if v.ndim == 4:  # HWIO -> OIHW
                    out[base + ".weight"] = np.transpose(v, (3, 2, 0, 1))
                else:
                    out[base + ".weight"] = v.T
            elif k == "scale":
                out[key[: -len(".scale")] + ".weight"] = v
            else:
                out[key] = v
        return out

    flat = hub_state(params["params"])
    converted = {"params": convert_torch_state(flat)}
    got = jax.tree.map(lambda a, b: np.allclose(a, b), params, converted)
    assert all(jax.tree.leaves(got))
