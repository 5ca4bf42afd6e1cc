"""Count tpu_custom_call occurrences in the compiled v4 train step HLO,
grouped by the fusion/computation name where they appear — checks which
Pallas kernels remat actually recomputes."""
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vdn.models.refine import RefineVideoDepth
from vdn.train.trainer import RefineTrainer, preprocess_depth_sequences

model = RefineVideoDepth(version=4, encoder="vitl",
                         compute_dtype=jnp.bfloat16, remat=True)
rng = np.random.default_rng(0)
b, t, s = 2, 8, 518
params = jax.jit(model.init)(
    jax.random.PRNGKey(0), jnp.zeros((1, 2, 56, 56), jnp.float32))
trainer = RefineTrainer(model, initial_lr=1e-5, stable_scale=10.0)
state = trainer.init_state(params)
input_depths = preprocess_depth_sequences(
    jnp.zeros((b, t, s, s), jnp.float32),
    jnp.ones((b, t, s, s), jnp.float32), norm=False)
gt = jnp.ones((b, t, s, s), jnp.float32)
masks = jnp.ones((b, t, s, s), jnp.float32)

hlo = jax.jit(trainer._train_step_impl).lower(
    state, input_depths, gt, masks).compile().as_text()
names = re.findall(
    r'custom_call_target="tpu_custom_call".*?op_name="([^"]*)"', hlo)
print("tpu_custom_call count:", len(names))


def classify(n):
    where = "bwd-recompute" if "transpose(" in n else "fwd"
    for key in ("_flash_bwd", "flash_attention_fused_qkv", "flash_attention",
                "_ln_mlp", "fused_ln_mlp", "temporal_attention", "geglu",
                "resize_rows", "resize_mid_axis", "w_resize_island",
                "select_rows", "kth"):
        if key in n:
            return f"{where}: {key}"
    tail = n.rsplit("/", 2)[-2:]
    return f"{where}: {'/'.join(tail)[-60:]}"


for k, v in sorted(collections.Counter(map(classify, names)).items()):
    print(f"{v:4d}  {k}")
