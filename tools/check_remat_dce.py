"""Verify the REMAT_POLICY actually removes the Pallas forward kernels
from the backward recompute: compile grad-of-encoder on the TPU and count
pallas custom-calls in the optimized HLO.

Expected per depth-L encoder (flash + fused MLP on):
  - flash forward cols kernel: L  (fwd only; recompute copy DCE'd)
  - fused LN+MLP forward kernel: L (same)
  - flash backward cols kernel: L
Without the policy the fwd kernels appear 2L times (fwd + recompute).
"""
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vdn.nn.vit import DinoVisionTransformer

DEPTH = 4
m = DinoVisionTransformer(embed_dim=1024, depth=DEPTH, num_heads=16,
                          img_size=518, patch_size=14,
                          param_dtype=jnp.float32, remat=True)
x = jnp.zeros((2, 518, 518, 3), jnp.bfloat16)
p = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x))
p = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), p)
p = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                 if a.dtype == jnp.float32 else a, p)


def loss(p):
    return jnp.sum(m.apply(p, x).astype(jnp.float32) ** 2)


lowered = jax.jit(jax.grad(loss)).lower(p)
hlo = lowered.compile().as_text()
counts = collections.Counter(
    re.findall(r'custom_call_target="([^"]+)"', hlo))
for k, v in sorted(counts.items()):
    print(f"{k}: {v}")
kernels = collections.Counter(
    m.group(1) for m in re.finditer(r'kernel_name\\?["\']?\s*:\s*\\?["\']?(\w+)', hlo))
print("kernel names:", dict(kernels))
