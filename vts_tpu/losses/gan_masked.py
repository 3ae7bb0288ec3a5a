"""Validity-masked GAN reductions for the static-K patch economy.

The data pipeline pads ragged patch sets to a fixed K with a float validity
mask; these helpers compute the reference's reductions while excluding the
padding:

  * masked mean  — D-side ``criterionGAN(...).mean()`` over real patches only;
  * masked patch-sum — G2's ``view(-1,K).mean(0).sum()`` (a sum over patches,
    reference sinskitG_model.py:1706-1711).

``per_sample_gan_loss`` gives a per-sample vector for *every* GAN mode (for
lsgan/vanilla this is the per-sample mean, which recovers the torch module's
global mean under a full mask).
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp

Pred = Union[jnp.ndarray, Sequence[Sequence[jnp.ndarray]]]


def _per_sample_single(pred: jnp.ndarray, target_is_real: bool, mode: str,
                       real_label: float, fake_label: float) -> jnp.ndarray:
    pred = pred.astype(jnp.float32)
    n = pred.shape[0]
    flat = pred.reshape(n, -1)
    if mode == "lsgan":
        t = real_label if target_is_real else fake_label
        return jnp.mean((flat - t) ** 2, axis=1)
    if mode == "vanilla":
        t = real_label if target_is_real else fake_label
        return jnp.mean(jax.nn.softplus(flat) - t * flat, axis=1)
    if mode in ("wgan", "wgangp"):
        m = jnp.mean(flat, axis=1)
        return -m if target_is_real else m
    if mode == "nonsaturating":
        v = jax.nn.softplus(-flat) if target_is_real else jax.nn.softplus(flat)
        return jnp.mean(v, axis=1)
    if mode == "hinge":
        v = jax.nn.relu(1.0 - flat) if target_is_real else jax.nn.relu(1.0 + flat)
        return jnp.mean(v, axis=1)
    raise NotImplementedError(mode)


def per_sample_gan_loss(pred: Pred, target_is_real: bool, mode: str,
                        real_label: float = 1.0, fake_label: float = 0.0) -> jnp.ndarray:
    """(N,) per-sample loss; multiscale predictions sum over scales."""
    if isinstance(pred, (list, tuple)):
        if len(pred) and isinstance(pred[0], (list, tuple)):
            total = 0.0
            for scale in pred:
                total = total + _per_sample_single(scale[-1], target_is_real, mode,
                                                   real_label, fake_label)
            return total
        pred = pred[-1]
    return _per_sample_single(pred, target_is_real, mode, real_label, fake_label)


def masked_mean(vec: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(vec * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def masked_patch_sum(vec: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(vec * valid)
