"""CLIP ViT-B/32 image tower in JAX — style encoder + vision-aided D3 backbone.

The reference uses two CLIP consumers:
  * skitG's style encoder — ``clip.encode_image`` → 512-d style code
    (reference models/skitG_model.py:484-486, :705-721);
  * the vision-aided discriminator D3 (``vision_aided_loss.Discriminator``
    with cv_type='clip', loss_type='multilevel_sigmoid_s',
    reference models/sinskitG_model.py:546-552).

This is a faithful ViT-B/32 (patch 32 conv → class token + positional
embedding → pre-LN transformer ×12, width 768, heads 12 → ln_post →
512-d projection).  ``load_clip_weights`` converts an OpenAI CLIP or HF
``CLIPVisionModel`` torch checkpoint; without one, ``init_clip_params`` gives
a deterministic random tower (embeddings remain a usable — if semantically
meaningless — style space; supply converted weights for reference parity).

Functional (params pytree, not linen) so the fleet can treat it as constants.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize_mm import resize_mm

WIDTH = 768
LAYERS = 12
HEADS = 12
PATCH = 32
GRID = 7          # 224 / 32
EMBED_DIM = 512

# CLIP's image preprocessing constants (values in [0,1])
_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _ln(rng, shape):
    return {"scale": jnp.ones(shape, jnp.float32), "bias": jnp.zeros(shape, jnp.float32)}


def init_clip_params(seed: int = 0) -> Dict:
    rng = np.random.default_rng(seed)
    def norm(*shape, scale=0.02):
        return jnp.asarray(rng.normal(0, scale, shape).astype(np.float32))

    blocks = []
    for _ in range(LAYERS):
        blocks.append({
            "ln_1": _ln(rng, (WIDTH,)),
            "attn": {
                "qkv_w": norm(WIDTH, 3 * WIDTH, scale=WIDTH ** -0.5),
                "qkv_b": jnp.zeros((3 * WIDTH,)),
                "out_w": norm(WIDTH, WIDTH, scale=WIDTH ** -0.5),
                "out_b": jnp.zeros((WIDTH,)),
            },
            "ln_2": _ln(rng, (WIDTH,)),
            "mlp": {
                "fc_w": norm(WIDTH, 4 * WIDTH, scale=(2 * WIDTH) ** -0.5),
                "fc_b": jnp.zeros((4 * WIDTH,)),
                "proj_w": norm(4 * WIDTH, WIDTH, scale=WIDTH ** -0.5),
                "proj_b": jnp.zeros((WIDTH,)),
            },
        })
    return {
        "conv": norm(PATCH, PATCH, 3, WIDTH, scale=WIDTH ** -0.5),
        "class_embedding": norm(WIDTH, scale=WIDTH ** -0.5),
        "positional_embedding": norm(GRID * GRID + 1, WIDTH, scale=0.01),
        "ln_pre": _ln(rng, (WIDTH,)),
        "blocks": blocks,
        "ln_post": _ln(rng, (WIDTH,)),
        "proj": norm(WIDTH, EMBED_DIM, scale=WIDTH ** -0.5),
    }


def load_clip_weights(path: str) -> Dict:
    """Convert an OpenAI CLIP state_dict (``visual.*`` keys) or HF
    CLIPVisionModel checkpoint to the params pytree."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    g = lambda k: jnp.asarray(np.asarray(sd[k].float() if hasattr(sd[k], "float") else sd[k]))
    if "visual.conv1.weight" in sd:   # OpenAI format
        blocks = []
        for i in range(LAYERS):
            p = f"visual.transformer.resblocks.{i}"
            blocks.append({
                "ln_1": {"scale": g(f"{p}.ln_1.weight"), "bias": g(f"{p}.ln_1.bias")},
                "attn": {
                    "qkv_w": g(f"{p}.attn.in_proj_weight").T,
                    "qkv_b": g(f"{p}.attn.in_proj_bias"),
                    "out_w": g(f"{p}.attn.out_proj.weight").T,
                    "out_b": g(f"{p}.attn.out_proj.bias"),
                },
                "ln_2": {"scale": g(f"{p}.ln_2.weight"), "bias": g(f"{p}.ln_2.bias")},
                "mlp": {
                    "fc_w": g(f"{p}.mlp.c_fc.weight").T,
                    "fc_b": g(f"{p}.mlp.c_fc.bias"),
                    "proj_w": g(f"{p}.mlp.c_proj.weight").T,
                    "proj_b": g(f"{p}.mlp.c_proj.bias"),
                },
            })
        return {
            "conv": g("visual.conv1.weight").transpose(2, 3, 1, 0),
            "class_embedding": g("visual.class_embedding"),
            "positional_embedding": g("visual.positional_embedding"),
            "ln_pre": {"scale": g("visual.ln_pre.weight"), "bias": g("visual.ln_pre.bias")},
            "blocks": blocks,
            "ln_post": {"scale": g("visual.ln_post.weight"), "bias": g("visual.ln_post.bias")},
            "proj": g("visual.proj"),
        }
    raise KeyError("unrecognized CLIP checkpoint format (expected visual.* keys)")


def _layer_norm(p, x, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _attention(p, x):
    n, t, _ = x.shape
    qkv = x @ p["qkv_w"] + p["qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    reshape = lambda a: a.reshape(n, t, HEADS, WIDTH // HEADS).transpose(0, 2, 1, 3)
    q, k, v = reshape(q), reshape(k), reshape(v)
    scale = (WIDTH // HEADS) ** -0.5
    attn = jax.nn.softmax((q * scale) @ k.transpose(0, 1, 3, 2), axis=-1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(n, t, WIDTH)
    return out @ p["out_w"] + p["out_b"]


def clip_image_features(params: Dict, images: jnp.ndarray,
                        tap_layers: Tuple[int, ...] = ()) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """images (N, 224, 224, 3) in [-1, 1] → (embedding (N, 512), taps).

    taps are token sequences (N, 50, 768) after the requested blocks —
    the hooks the vision-aided D3 heads consume."""
    x = images.astype(jnp.float32) * 0.5 + 0.5
    x = (x - _MEAN) / _STD
    if x.shape[1] != 224:
        # matmul-form resize: jax.image.resize lowers this 1536²→224²
        # downsample to gathers (23.4 ms/step fwd in the round-5 batch-4
        # trace) and its VJP to scatter-adds; two MXU einsums do the same
        # linear operator in <1 ms each way (ops/resize_mm.py, values equal
        # to f32 round-off).
        x = resize_mm(x, (224, 224), method="linear", antialias=True)
    h = jax.lax.conv_general_dilated(
        x, params["conv"], (PATCH, PATCH), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))        # (N, 7, 7, 768)
    n = h.shape[0]
    h = h.reshape(n, GRID * GRID, WIDTH)
    cls = jnp.broadcast_to(params["class_embedding"][None, None, :], (n, 1, WIDTH))
    h = jnp.concatenate([cls, h], axis=1) + params["positional_embedding"][None]
    h = _layer_norm(params["ln_pre"], h)
    taps = []
    for i, blk in enumerate(params["blocks"]):
        h = h + _attention(blk["attn"], _layer_norm(blk["ln_1"], h))
        y = _layer_norm(blk["ln_2"], h)
        y = jax.nn.gelu(y @ blk["mlp"]["fc_w"] + blk["mlp"]["fc_b"], approximate=False)
        h = h + (y @ blk["mlp"]["proj_w"] + blk["mlp"]["proj_b"])
        if i in tap_layers:
            taps.append(h)
    pooled = _layer_norm(params["ln_post"], h[:, 0, :])
    embedding = pooled @ params["proj"]
    return embedding, taps


def clip_style_code(params: Dict, images: jnp.ndarray) -> jnp.ndarray:
    """512-d image embedding (the skitG style code)."""
    emb, _ = clip_image_features(params, images)
    return emb
