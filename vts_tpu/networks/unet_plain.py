"""Plain single-head U-Net (unet_256 / unet_128).

Equivalent of the reference's recursive ``UnetGenerator``/
``UnetSkipConnectionBlock`` (models/networks.py:1327-1428), expressed
iteratively: the torch recursion builds exactly the encoder/decoder ladder
below (outermost block = conv down + tanh up WITH skip-concat — unlike
``CustomUnetGenerator`` whose outermost up takes no skip).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .blocks import Conv4x4, ConvT4x4, make_initializer, make_norm_layer, norm_uses_bias


class UnetGenerator(nn.Module):
    ngf: int = 64
    out_nc: int = 3
    num_downs: int = 8
    norm_type: str = "batch"
    use_dropout: bool = False
    init_type: str = "xavier"
    init_gain: float = 0.02
    dtype: Optional[Any] = None
    train: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        g = self.ngf
        nd = self.num_downs
        norm = make_norm_layer(self.norm_type, train=self.train,
                               axis_name=self.axis_name, dtype=self.dtype)
        winit = make_initializer(self.init_type, self.init_gain)
        use_bias = norm_uses_bias(self.norm_type)

        def enc_feats(i):
            return g * min(2 ** min(i, 3), 8)

        skips = []
        h = x
        for i in range(nd):
            feats = enc_feats(i)
            if i > 0:
                h = nn.leaky_relu(h, 0.2)
            h = Conv4x4(feats, use_bias=use_bias, kernel_init=winit,
                        dtype=self.dtype, name=f"down{i}")(h)
            if 0 < i < nd - 1:
                h = norm()(h)
            skips.append(h)

        for i in range(nd - 1, -1, -1):
            if i < nd - 1:
                h = jnp.concatenate([h, skips[i]], axis=-1)
            h = nn.relu(h)
            feats = self.out_nc if i == 0 else enc_feats(i - 1)
            h = ConvT4x4(feats, use_bias=(True if i == 0 else use_bias),
                         kernel_init=winit, dtype=self.dtype, name=f"up{i}")(h)
            if i == 0:
                h = jnp.tanh(h)
            else:
                h = norm()(h)
                if self.use_dropout and nd // 2 <= i < nd - 1:
                    h = nn.Dropout(0.5, deterministic=deterministic)(h)
        return h
