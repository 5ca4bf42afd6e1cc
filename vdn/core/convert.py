"""torch state_dict -> flax params conversion.

The flax module trees in vdn.nn are named so that reference checkpoint keys
map mechanically:

- dotted numeric components merge into the parent name
  (``blocks.0.attn.qkv.weight`` -> ``blocks_0/attn/qkv/kernel``)
- leaf rules by tensor rank:
    rank-2 ``weight``      -> ``kernel`` transposed (Linear)
    rank-4 ``weight``      -> ``kernel`` OIHW->HWIO (Conv2d), or
                              flipped IOHW->HWIO for ConvTranspose2d keys
    rank-1 ``weight``      -> ``scale`` (LayerNorm/GroupNorm)
    ``bias``               -> ``bias``
- whole-tensor params (cls_token/pos_embed/mask_token/ls gamma/pos encodings)
  copy as-is; registered buffers that vdn recomputes (sinusoidal ``pe``)
  are dropped.

This keeps weight parity with the reference (the rename-map concept from
reference scripts/train_v4.py:475-489 becomes these explicit tables).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Iterable, Mapping, Optional, Sequence

import numpy as np

__all__ = ["convert_torch_state", "DEFAULT_CONVT_PATTERNS", "DEFAULT_SKIP"]

# torch modules that are ConvTranspose2d in every reference model family
DEFAULT_CONVT_PATTERNS: Sequence[str] = (
    r"resize_layers\.0\.",
    r"resize_layers\.1\.",
    r"output_upscaling\.0\.",
    r"output_upscaling\.3\.",
)

# registered buffers vdn recomputes on the fly
DEFAULT_SKIP: Sequence[str] = (
    r"\.pe$",                # sinusoidal temporal positional encoding
    r"num_batches_tracked",  # torch BN bookkeeping
)

# torch nn.Embedding weights: lookup tables, stored verbatim (no transpose)
DEFAULT_EMBEDDING_PATTERNS: Sequence[str] = (
    r"(^|\.)iou_token\.weight$",
    r"(^|\.)mask_tokens\.weight$",
    r"(^|\.)obj_score_token\.weight$",
    r"(^|\.)not_a_point_embed\.weight$",
    r"(^|\.)no_mask_embed\.weight$",
    r"(^|\.)point_embeddings\.\d+\.weight$",
)


def _assign(tree: dict, path: Sequence[str], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _flax_path(torch_key: str) -> list:
    """Merge numeric components: a.b.0.c -> [a, b_0, c]."""
    parts = []
    for comp in torch_key.split("."):
        if comp.isdigit() and parts:
            parts[-1] = f"{parts[-1]}_{comp}"
        else:
            parts.append(comp)
    return parts


def convert_torch_state(
        state: Mapping[str, np.ndarray],
        convt_patterns: Iterable[str] = DEFAULT_CONVT_PATTERNS,
        skip_patterns: Iterable[str] = DEFAULT_SKIP,
        embedding_patterns: Iterable[str] = DEFAULT_EMBEDDING_PATTERNS,
        rename: Optional[Callable[[str], Optional[str]]] = None,
        dtype=np.float32) -> Dict:
    """Convert a torch state_dict (as numpy arrays) into a flax params tree.

    Args:
      state: mapping of torch parameter names to numpy arrays.
      convt_patterns: regexes marking ConvTranspose2d weights.
      skip_patterns: regexes for keys to drop.
      embedding_patterns: regexes for nn.Embedding weights (kept verbatim
        under the flax leaf name 'embedding').
      rename: optional key rewriter applied first; return None to drop a key.
    """
    convt_re = [re.compile(p) for p in convt_patterns]
    skip_re = [re.compile(p) for p in skip_patterns]
    embed_re = [re.compile(p) for p in embedding_patterns]
    tree: Dict = {}
    for key, value in state.items():
        if rename is not None:
            key = rename(key)
            if key is None:
                continue
        if any(p.search(key) for p in skip_re):
            continue
        value = np.asarray(value)
        if dtype is not None and np.issubdtype(value.dtype, np.floating):
            value = value.astype(dtype)
        path = _flax_path(key)
        leaf = path[-1]
        if leaf == "weight" and any(p.search(key) for p in embed_re):
            path[-1] = "embedding"
        elif leaf == "in_proj_weight":
            # torch nn.MultiheadAttention packed qkv [3C, C]
            path[-1:] = ["in_proj", "kernel"]
            value = value.T
        elif leaf == "in_proj_bias":
            path[-1:] = ["in_proj", "bias"]
        elif leaf == "weight":
            if value.ndim == 4:
                if any(p.search(key) for p in convt_re):
                    # torch ConvTranspose2d (I, O, kh, kw): flip spatial,
                    # store HWIO for lax.conv_transpose (see nn/layers.py)
                    value = np.transpose(value[:, :, ::-1, ::-1],
                                         (2, 3, 0, 1))
                else:
                    # torch Conv2d (O, I, kh, kw) -> HWIO
                    value = np.transpose(value, (2, 3, 1, 0))
                path[-1] = "kernel"
            elif value.ndim == 2:
                value = value.T
                path[-1] = "kernel"
            elif value.ndim == 1:
                path[-1] = "scale"
            else:
                raise ValueError(f"unhandled weight rank for {key}: "
                                 f"{value.shape}")
        elif leaf == "bias":
            pass
        elif value.ndim == 4 and leaf in ("pos_embed", "pos_embed_window"):
            # hiera's NCHW spatial pos-embed tables -> NHWC (other rank-4
            # params like maskmem_tpos_enc [7,1,1,mem] copy verbatim)
            value = np.transpose(value, (0, 2, 3, 1))
        # everything else (cls_token, pos_embed, mask_token, gamma, ...)
        # copies verbatim under its own name
        _assign(tree, path, np.ascontiguousarray(value))
    return tree
