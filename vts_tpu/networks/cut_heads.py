"""CUT feature-sampling heads + PatchNCE + gram-matrix texture loss.

Present-but-unwired components of the reference, kept as optional building
blocks exactly like upstream (reference models/networks.py:597-720 notes
``define_F`` heads and models/patchnce.py are not imported by any shipped
model — SURVEY.md §2.A):

  * PoolingF / ReshapeF / StridedConvF / PatchSampleF (define_F registry),
  * PatchNCELoss (reference models/patchnce.py:6-55),
  * gram-matrix TextureLoss (reference models/networks.py:1836-1895).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def l2_normalize(x, axis=-1, power=2, eps=1e-7):
    norm = jnp.power(jnp.sum(jnp.power(jnp.abs(x), power), axis=axis, keepdims=True),
                     1.0 / power)
    return x / (norm + eps)


class PoolingF(nn.Module):
    """Adaptive max-pool to 1×1 + L2 norm (reference networks.py:597-609)."""

    @nn.compact
    def __call__(self, x):
        pooled = jnp.max(x, axis=(1, 2))
        return l2_normalize(pooled)


class ReshapeF(nn.Module):
    """4×4 avg-pool, flatten spatial to tokens, L2 norm (networks.py:611-624)."""

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        x = nn.avg_pool(x, (h // 4 or 1, w // 4 or 1), (h // 4 or 1, w // 4 or 1))
        x = x.reshape(n, -1, c)
        return l2_normalize(x)


class StridedConvF(nn.Module):
    """Stacked stride-2 convs until ≤64px, + L2 norm (networks.py:626-668)."""

    @nn.compact
    def __call__(self, x):
        h = x
        while h.shape[1] > 64:
            h = nn.Conv(max(h.shape[-1] // 2, 64), (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))(h)
            h = nn.relu(h)
        return l2_normalize(h.reshape(h.shape[0], -1))


class PatchSampleF(nn.Module):
    """Sample num_patches locations per feature map, optional 2-layer MLP,
    L2 norm (reference networks.py:670-720)."""

    use_mlp: bool = False
    nc: int = 256
    num_patches: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], rng: jax.Array,
                 patch_ids: Optional[List[jnp.ndarray]] = None
                 ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        out_feats, out_ids = [], []
        keys = jax.random.split(rng, len(feats))
        for i, (feat, key) in enumerate(zip(feats, keys)):
            n, h, w, c = feat.shape
            tokens = feat.reshape(n, h * w, c)
            if patch_ids is not None:
                ids = patch_ids[i]
            else:
                ids = jax.random.permutation(key, h * w)[: min(self.num_patches, h * w)]
            sample = tokens[:, ids, :].reshape(-1, c)
            if self.use_mlp:
                sample = nn.Dense(self.nc, name=f"mlp_{i}_0")(sample)
                sample = nn.relu(sample)
                sample = nn.Dense(self.nc, name=f"mlp_{i}_1")(sample)
            out_feats.append(l2_normalize(sample))
            out_ids.append(ids)
        return out_feats, out_ids


def patch_nce_loss(feat_q: jnp.ndarray, feat_k: jnp.ndarray, nce_T: float = 0.07,
                   batch_size: int = 1) -> jnp.ndarray:
    """CUT contrastive loss (reference models/patchnce.py:6-55): positives are
    corresponding patches, negatives the other patches within the same image;
    cross-entropy at temperature nce_T.  Returns per-patch losses."""
    feat_k = jax.lax.stop_gradient(feat_k)
    n, dim = feat_q.shape
    l_pos = jnp.sum(feat_q * feat_k, axis=-1, keepdims=True)            # (N,1)
    per_img = n // batch_size
    q = feat_q.reshape(batch_size, per_img, dim)
    k = feat_k.reshape(batch_size, per_img, dim)
    l_neg = jnp.einsum("bid,bjd->bij", q, k)
    mask = jnp.eye(per_img, dtype=bool)[None]
    l_neg = jnp.where(mask, -10.0, l_neg).reshape(n, per_img)
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / nce_T
    return -jax.nn.log_softmax(logits, axis=1)[:, 0]


def gram_matrix(feat: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) → normalized gram (reference networks.py:1836-1855)."""
    n, h, w, c = feat.shape
    f = feat.reshape(n, h * w, c)
    g = jnp.einsum("npc,npd->ncd", f, f)
    return g / (h * w * c)


def texture_loss(feats_fake: Sequence[jnp.ndarray],
                 feats_real: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Gram-matrix style loss over feature lists (networks.py:1857-1895)."""
    total = 0.0
    for a, b in zip(feats_fake, feats_real):
        total = total + jnp.mean((gram_matrix(a) - gram_matrix(jax.lax.stop_gradient(b))) ** 2)
    return total
