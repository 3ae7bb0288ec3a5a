"""Vision-aided discriminator (D3): trainable heads on frozen CLIP features.

Equivalent of ``vision_aided_loss.Discriminator(cv_type='clip',
loss_type='multilevel_sigmoid_s')`` used by the reference after a warmup
epoch (reference models/sinskitG_model.py:546-552, :1386-1399, :1797-1801):
the CLIP ViT backbone is frozen; small per-level heads on intermediate token
sequences produce logits; training uses sigmoid (BCE) losses with the smooth
non-saturating generator objective.

Head design (mirrors the package's multilevel head at the granularity that
matters for training dynamics): taps after blocks {3, 7, 11}; each head is
LayerNorm → Dense(128) → GELU → Dense(1) applied per token, plus a head on
the final embedding.  Loss per level: softplus-based sigmoid loss summed over
levels ('_s' = the smoothed/softplus variant):

  D: mean softplus(-logit_real) + mean softplus(logit_fake)
  G: mean softplus(-logit_fake)
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..networks.clip_vit import clip_image_features

TAP_LAYERS = (3, 7, 11)
HIDDEN = 128


def init_d3_head_params(seed: int = 0, width: int = 768, embed_dim: int = 512) -> Dict:
    rng = np.random.default_rng(seed)
    def head(in_dim):
        return {
            "ln": {"scale": jnp.ones((in_dim,)), "bias": jnp.zeros((in_dim,))},
            "w1": jnp.asarray(rng.normal(0, (in_dim) ** -0.5, (in_dim, HIDDEN)).astype(np.float32)),
            "b1": jnp.zeros((HIDDEN,)),
            "w2": jnp.asarray(rng.normal(0, HIDDEN ** -0.5, (HIDDEN, 1)).astype(np.float32)),
            "b2": jnp.zeros((1,)),
        }
    return {"taps": [head(width) for _ in TAP_LAYERS], "embed": head(embed_dim)}


def _head_logits(p, x):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    h = (x - mean) * jax.lax.rsqrt(var + 1e-5) * p["ln"]["scale"] + p["ln"]["bias"]
    h = jax.nn.gelu(h @ p["w1"] + p["b1"], approximate=False)
    return (h @ p["w2"] + p["b2"])[..., 0]


def d3_logits(clip_params: Dict, head_params: Dict, images: jnp.ndarray) -> List[jnp.ndarray]:
    emb, taps = clip_image_features(clip_params, images, tap_layers=TAP_LAYERS)
    logits = [_head_logits(hp, t) for hp, t in zip(head_params["taps"], taps)]
    logits.append(_head_logits(head_params["embed"], emb[:, None, :]))
    return logits


def d3_d_loss(clip_params, head_params, real, fake) -> jnp.ndarray:
    lr = d3_logits(clip_params, head_params, real)
    lf = d3_logits(clip_params, head_params, jax.lax.stop_gradient(fake))
    total = 0.0
    for a, b in zip(lr, lf):
        total = total + jnp.mean(jax.nn.softplus(-a)) + jnp.mean(jax.nn.softplus(b))
    return total * 0.5


def d3_g_loss(clip_params, head_params, fake) -> jnp.ndarray:
    lf = d3_logits(clip_params, head_params, fake)
    return sum(jnp.mean(jax.nn.softplus(-l)) for l in lf)
