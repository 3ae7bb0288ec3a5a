"""Surface-normal map from tactile gradients (reference models/model_utils.py:408-428).

normal = normalize([gx, gy, scale_nz·1], axis=channel); NHWC."""

from __future__ import annotations

import jax.numpy as jnp


def compute_normal(t: jnp.ndarray, scale_nz: float = 0.0, eps: float = 1e-12) -> jnp.ndarray:
    """t: (..., H, W, 2) gx/gy → (..., H, W, 3) unit normal.

    Matches torch F.normalize semantics (divide by max(norm, eps))."""
    gx = t[..., 0:1]
    gy = t[..., 1:2]
    n = jnp.concatenate([gx, gy, scale_nz * jnp.ones_like(gx)], axis=-1)
    norm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True))
    return n / jnp.maximum(norm, eps)
