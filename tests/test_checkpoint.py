"""Checkpoint IO: torch .pth reader edge cases + orbax roundtrip."""

import numpy as np
import torch

from vdn.core.checkpoint import (load_torch_checkpoint, restore_pytree,
                                 save_pytree)


def test_torch_reader_wrapped_and_dtypes(tmp_path):
    sd = {
        "a.weight": torch.randn(4, 3, 2, 2),
        "b.bias": torch.arange(5).float(),
        "c.half": torch.randn(6).half(),
        "d.bf16": torch.randn(7).bfloat16(),
        "e.long": torch.arange(3),
    }
    # wrapped layout like metric_depth checkpoints (train.py:201-208)
    torch.save({"model": sd, "epoch": 3}, str(tmp_path / "wrapped.pth"))
    loaded = load_torch_checkpoint(str(tmp_path / "wrapped.pth"))
    assert set(loaded) == set(sd)
    np.testing.assert_allclose(loaded["a.weight"],
                               sd["a.weight"].numpy(), rtol=1e-6)
    np.testing.assert_allclose(loaded["d.bf16"],
                               sd["d.bf16"].float().numpy(), atol=1e-6)
    assert loaded["e.long"].dtype == np.int64


def test_orbax_roundtrip(tmp_path):
    tree = {"params": {"w": np.random.default_rng(0).standard_normal(
        (3, 4)).astype(np.float32), "b": np.zeros(4, np.float32)},
        "step": np.asarray(7, np.int32)}
    path = str(tmp_path / "ckpt")
    save_pytree(path, tree)
    restored = restore_pytree(path, tree)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  tree["params"]["w"])
    assert int(restored["step"]) == 7
