"""GAN objectives with reference-exact reductions.

Re-design of ``GANLoss`` (reference models/networks.py:448-542) as pure
functions.  The subtle part the training dynamics depend on is the *shape*
of the returned loss:

  * lsgan / vanilla / wgan(gp): scalar (global mean), like the torch modules;
  * nonsaturating / hinge: per-sample vector (N,) — callers then either
    ``.mean()`` (full-image D1) or sum over the patch axis (G2's per-patch
    sum, reference sinskitG_model.py:1706-1711);
  * multiscale predictions (list over scales of feature lists) contribute the
    *sum over scales* of per-scale losses (networks.py:529-541).

Label smoothing (real=0.8) only affects the target-tensor modes
(lsgan/vanilla) — reference sinskitG_model.py:485-490.
"""

from __future__ import annotations

from typing import List, Sequence, Union

import jax
import jax.numpy as jnp

Pred = Union[jnp.ndarray, Sequence[Sequence[jnp.ndarray]]]

GAN_MODES = ("lsgan", "vanilla", "wgan", "wgangp", "nonsaturating", "hinge")


def _single_scale_loss(pred: jnp.ndarray, target_is_real: bool, mode: str,
                       real_label: float, fake_label: float):
    pred = pred.astype(jnp.float32)
    n = pred.shape[0]
    if mode == "lsgan":
        target = real_label if target_is_real else fake_label
        return jnp.mean((pred - target) ** 2)
    if mode == "vanilla":
        target = real_label if target_is_real else fake_label
        # BCEWithLogits with constant target t: softplus(x) - t*x
        return jnp.mean(jax.nn.softplus(pred) - target * pred)
    if mode in ("wgan", "wgangp"):
        return -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    if mode == "nonsaturating":
        v = jax.nn.softplus(-pred) if target_is_real else jax.nn.softplus(pred)
        return jnp.mean(v.reshape(n, -1), axis=1)
    if mode == "hinge":
        v = jax.nn.relu(1.0 - pred) if target_is_real else jax.nn.relu(1.0 + pred)
        return jnp.mean(v.reshape(n, -1), axis=1)
    raise NotImplementedError(f"gan mode {mode!r} not implemented")


def gan_loss(pred: Pred, target_is_real: bool, mode: str,
             real_label: float = 1.0, fake_label: float = 0.0):
    """Returns a scalar or a per-sample vector depending on ``mode`` (see
    module docstring).  ``pred`` may be a raw logit array, a feature list
    whose last entry is the logit map, or a multiscale list of those."""
    if isinstance(pred, (list, tuple)):
        if len(pred) and isinstance(pred[0], (list, tuple)):
            total = 0.0
            for scale in pred:
                total = total + _single_scale_loss(scale[-1], target_is_real, mode,
                                                   real_label, fake_label)
            return total
        pred = pred[-1]
    return _single_scale_loss(pred, target_is_real, mode, real_label, fake_label)


def reduce_d(loss):
    """D-side reduction: mean of whatever gan_loss returned."""
    return jnp.mean(jnp.asarray(loss))


def reduce_g2_patch_sum(loss, k: int):
    """G2's GAN reduction: view(-1, K).mean(0).sum() — a *sum* over the K
    patches (reference sinskitG_model.py:1706-1711).  For per-sample vectors
    of length K this equals sum(loss)."""
    loss = jnp.asarray(loss)
    if loss.ndim == 0:
        return loss
    return jnp.sum(jnp.mean(loss.reshape(-1, k), axis=0))


def feature_matching_loss(pred_fake: Sequence[Sequence[jnp.ndarray]],
                          pred_real: Sequence[Sequence[jnp.ndarray]],
                          n_layers: int, num_d: int):
    """Pix2PixHD GAN feature-matching: L1 over every intermediate feature,
    weighted 4/(n_layers+1) per layer and 1/num_D per scale; the real-side
    features are treated as constants (reference sinskitG_model.py:1752-1770,
    pix2pixHD_model.py:184-201)."""
    feat_w = 4.0 / (n_layers + 1)
    d_w = 1.0 / num_d
    total = 0.0
    for scale_fake, scale_real in zip(pred_fake, pred_real):
        for f, r in zip(scale_fake[:-1], scale_real[:-1]):
            total = total + d_w * feat_w * jnp.mean(
                jnp.abs(f.astype(jnp.float32) - jax.lax.stop_gradient(r).astype(jnp.float32)))
    return total


def gradient_penalty(d_fn, real: jnp.ndarray, fake: jnp.ndarray, rng: jax.Array,
                     kind: str = "mixed", constant: float = 1.0,
                     lambda_gp: float = 10.0):
    """WGAN-GP penalty (reference models/networks.py:548-582).

    ``d_fn`` maps images → logits (any pytree of logit arrays is flattened).
    Uses grad-of-grad through D; caller differentiates the result wrt D params.
    """
    if lambda_gp <= 0.0:
        return 0.0
    if kind == "real":
        interp = real
    elif kind == "fake":
        interp = fake
    else:
        alpha = jax.random.uniform(rng, (real.shape[0],) + (1,) * (real.ndim - 1), real.dtype)
        interp = alpha * real + (1 - alpha) * fake

    def scalar_d(x):
        out = d_fn(x)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l) for l in leaves)

    grads = jax.grad(scalar_d)(interp)
    g = grads.reshape(real.shape[0], -1)
    gp = jnp.mean((jnp.linalg.norm(g + 1e-16, axis=1) - constant) ** 2) * lambda_gp
    return gp
