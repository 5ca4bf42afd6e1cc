"""Surface normals from depth maps (reference utils/normal_utils.py:1-52).

NHWC: depth [B, S, H, W] (or [..., H, W]) -> normals [..., H, W, 3] via
reflect-padded Sobel gradients, n = normalize([-Ix, -Iy, 1])."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sobel_ix_iy", "normal_vector"]

_KX = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32)
_KY = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], np.float32)


def sobel_ix_iy(img: jnp.ndarray, normalize_kernel: bool = True):
    """img [..., H, W] -> (Ix, Iy) each [..., H, W]."""
    lead = img.shape[:-2]
    h, w = img.shape[-2:]
    x = img.reshape(-1, h, w, 1)
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    kx, ky = _KX, _KY
    if normalize_kernel:
        kx, ky = kx / 8.0, ky / 8.0
    k = jnp.asarray(np.stack([kx, ky], axis=-1)[:, :, None, :],
                    dtype=img.dtype)  # [3,3,1,2]
    out = jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = out.reshape(*lead, h, w, 2)
    return out[..., 0], out[..., 1]


def normal_vector(img: jnp.ndarray, normalize_kernel: bool = True,
                  scale_xy: float = 1.0, scale_z: float = 1.0,
                  eps: float = 1e-8) -> jnp.ndarray:
    """img [..., H, W] -> unit normals [..., H, W, 3]."""
    ix, iy = sobel_ix_iy(img, normalize_kernel)
    n = jnp.stack([-scale_xy * ix, -scale_xy * iy,
                   scale_z * jnp.ones_like(ix)], axis=-1)
    norm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True) + eps)
    return n / norm
