"""Surface-normal angle losses (reference models/normal_losses.py:10-54)."""

from __future__ import annotations

import jax.numpy as jnp


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-6):
    """Channel-axis cosine similarity over NHWC normals, torch semantics
    (denominator clamped at eps·eps via per-vector max(||·||, eps))."""
    dot = jnp.sum(a * b, axis=-1)
    na = jnp.maximum(jnp.sqrt(jnp.sum(a * a, axis=-1)), eps)
    nb = jnp.maximum(jnp.sqrt(jnp.sum(b * b, axis=-1)), eps)
    return dot / (na * nb)


def surface_normal_angle_error(real_normal: jnp.ndarray, pred_normal: jnp.ndarray,
                               mode: str = "evaluate"):
    """AE metric (degrees, per-pixel map) and training variants.

    modes: 'evaluate' → per-pixel degrees; 'train_L2_loss' → 1 − mean cos;
    'train_AL_loss' → mean acos over the numerically safe region;
    'train_TAL_loss' → robust acos/cos mix (reference normal_losses.py:31-54).
    """
    cos = cosine_similarity(pred_normal, real_normal)
    if mode == "evaluate":
        cos = jnp.clip(cos, -1.0, 1.0)
        return jnp.arccos(cos) * 180.0 / jnp.pi
    if mode == "train_L2_loss":
        return 1.0 - jnp.mean(cos)
    if mode == "train_AL_loss":
        safe = (cos < 0.999) & (cos > -0.999)
        acos = jnp.arccos(jnp.clip(cos, -0.999, 0.999))
        return jnp.sum(jnp.where(safe, acos, 0.0)) / jnp.maximum(jnp.sum(safe), 1)
    if mode == "train_TAL_loss":
        acos_mask = (cos < 0.9999) & (cos > 0.0)
        cos_mask = cos <= 0.0
        acos = jnp.arccos(jnp.clip(cos, -1.0, 0.9999))
        num = jnp.sum(jnp.where(acos_mask, acos, 0.0)) - jnp.sum(jnp.where(cos_mask, cos, 0.0))
        den = jnp.maximum(jnp.sum(acos_mask) + jnp.sum(cos_mask), 1)
        return num / den
    raise NotImplementedError(mode)
