"""MUNIT-style encoder/decoder generator — the 'resnet_cat' netG.

Compact re-design of the reference's vendored MUNIT blocks
(models/networks.py:722-1049: ContentEncoder, Decoder_all/Decoder,
G_Resnet): content encoder = stem + n_downsample stride-2 convs + residual
blocks (instance norm); decoder = residual blocks + nearest-upsample convs
(layer norm), with an optional latent z concatenated onto the features at
every decoder stage (the "cat" injection G_Resnet uses).  CUT heritage —
no shipped SKIT config selects it, kept for define_G parity.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import InstanceNorm, make_initializer
from .resnet_gen import _pad_reflect


class LayerNorm2d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
        g = self.param("scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * g + b


class _ResBlk(nn.Module):
    features: int
    kernel_init: Any

    @nn.compact
    def __call__(self, x):
        h = _pad_reflect(x, 1)
        h = nn.Conv(self.features, (3, 3), padding="VALID",
                    kernel_init=self.kernel_init)(h)
        h = InstanceNorm()(h)
        h = nn.relu(h)
        h = _pad_reflect(h, 1)
        h = nn.Conv(self.features, (3, 3), padding="VALID",
                    kernel_init=self.kernel_init)(h)
        h = InstanceNorm()(h)
        return x + h


class GResnet(nn.Module):
    """Content encoder + z-cat decoder (reference G_Resnet, networks.py:722-780)."""

    ngf: int = 64
    out_nc: int = 3
    nz: int = 8
    num_downs: int = 2
    n_res: int = 4
    init_type: str = "xavier"
    init_gain: float = 0.02
    dtype: Optional[Any] = None
    train: bool = True

    @nn.compact
    def __call__(self, x, z: Optional[jnp.ndarray] = None, *,
                 deterministic: bool = True):
        winit = make_initializer(self.init_type, self.init_gain)
        conv = lambda f, k, s, name: nn.Conv(f, (k, k), strides=(s, s),
                                             padding="VALID", kernel_init=winit,
                                             name=name)
        # --- content encoder ---
        h = _pad_reflect(x, 3)
        h = nn.relu(InstanceNorm()(conv(self.ngf, 7, 1, "stem")(h)))
        dim = self.ngf
        for i in range(self.num_downs):
            h = _pad_reflect(h, 1)
            h = nn.relu(InstanceNorm()(conv(dim * 2, 4, 2, f"down{i}")(h)))
            dim *= 2
        for i in range(self.n_res):
            h = _ResBlk(dim, winit, name=f"enc_res{i}")(h)

        # --- decoder with z concatenation at each stage ---
        def cat_z(feat):
            if z is None:
                return feat
            zt = jnp.broadcast_to(z[:, None, None, :],
                                  (feat.shape[0], feat.shape[1], feat.shape[2],
                                   z.shape[-1]))
            return jnp.concatenate([feat, zt], axis=-1)

        for i in range(self.n_res):
            h = _ResBlk(h.shape[-1], winit, name=f"dec_res{i}")(cat_z(h) if i == 0 else h)
        for i in range(self.num_downs):
            h = jax.image.resize(h, (h.shape[0], h.shape[1] * 2, h.shape[2] * 2,
                                     h.shape[3]), "nearest")
            h = cat_z(h)
            h = _pad_reflect(h, 2)
            h = conv(dim // 2, 5, 1, f"up{i}")(h)
            h = LayerNorm2d(dim // 2, name=f"up_ln{i}")(h)
            h = nn.relu(h)
            dim //= 2
        h = cat_z(h)
        h = _pad_reflect(h, 3)
        h = conv(self.out_nc, 7, 1, "head")(h)
        return jnp.tanh(h)
