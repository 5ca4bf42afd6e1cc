"""Mixed-precision policy for TPU.

The reference uses CUDA autocast fp16 with explicit fp32 "islands" (the final
output convs of the temporal DPT head run out of autocast, and attention
softmax is optionally upcast — see reference dpt_temporal.py:108-123 and
motion_module/attention.py:198-204).  On TPU the equivalent policy is
bf16 compute / fp32 parameters, with softmax and the final output convs pinned
to fp32.  A `Policy` is threaded through every module; tests run fp32/fp32 so
parity with the fp32 torch reference is exact.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32
    # dtype used for softmax / normalization statistics
    reduce_dtype: Any = jnp.float32
    # dtype of the final output convs (the reference's fp32 island)
    output_dtype: Any = jnp.float32

    def cast_to_compute(self, *xs):
        out = tuple(x.astype(self.compute_dtype) if x is not None else None for x in xs)
        return out[0] if len(out) == 1 else out


FP32 = Policy()
BF16 = Policy(compute_dtype=jnp.bfloat16)


def get_policy(name: str) -> Policy:
    return {"fp32": FP32, "float32": FP32, "bf16": BF16, "bfloat16": BF16}[name]
