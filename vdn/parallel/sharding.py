"""Parameter sharding rules: tensor parallelism for the ViT encoder.

The reference has no TP (SURVEY §2.9); vdn shards the transformer's wide
matmuls over the 'model' mesh axis for the vitg (1.3B) encoder — the
pjit/GSPMD style: annotate parameter shardings, let XLA insert the
collectives over ICI.

Rules (classic Megatron split, applied by parameter path):
  attn qkv kernel   [C, 3C]   -> shard output dim   P(None, 'model')
  attn proj kernel  [C, C]    -> shard input dim    P('model', None)
  mlp fc1/w12       [C, H]    -> shard output dim   P(None, 'model')
  mlp fc2/w3        [H, C]    -> shard input dim    P('model', None)
  biases of row-sharded layers shard on their only dim; everything else
  replicates.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vdn.parallel.mesh import MODEL_AXIS

__all__ = ["vit_tp_rules", "shard_params"]

_COL_PARALLEL = ("qkv", "fc1", "w12")   # kernel [in, out]: shard out
_ROW_PARALLEL = ("proj", "fc2", "w3")   # kernel [in, out]: shard in


def _spec_for_path(path, value) -> P:
    names = [getattr(p, "key", "") for p in path]
    leaf = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    if getattr(value, "ndim", 0) == 2 and leaf == "kernel":
        # rank-2 only: conv kernels (e.g. patch_embed "proj") replicate
        if parent in _COL_PARALLEL:
            return P(None, MODEL_AXIS)
        if parent in _ROW_PARALLEL:
            return P(MODEL_AXIS, None)
    if leaf == "bias" and parent in _COL_PARALLEL and getattr(
            value, "ndim", 0) == 1:
        return P(MODEL_AXIS)
    return P()


def vit_tp_rules(params: Any) -> Any:
    """PartitionSpec pytree for a param tree containing a ViT encoder."""
    return jax.tree_util.tree_map_with_path(_spec_for_path, params)


def shard_params(params: Any, mesh: Mesh, rules: Any = None) -> Any:
    """device_put the params with NamedShardings derived from the rules."""
    if rules is None:
        rules = vit_tp_rules(params)
    return jax.tree_util.tree_map(
        lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec)),
        params, rules)
