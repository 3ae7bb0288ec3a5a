"""ResNet generator with antialiased resampling (NHWC).

Re-design of the reference ``ResnetGenerator`` (models/networks.py:1051-1155)
and ``ResnetBlock`` (:1253-1325): 7×7 stem → n_downsampling antialiased
stride-2 stages (conv + FIR blur-down) → n_blocks residual blocks →
upsampling stages (FIR blur-up + conv), with ``T_resolution_multiplier``
extra upsampling stages when ``generate_T_imgs`` (the image→touch
super-resolution path) → 7×7 tanh head.

Used by the pix2pix baseline (netG=resnet_9blocks on 32² SIMT patches,
reference pix2pix_model.py:134-156) and by define_G2('VisGel') relatives.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .blocks import (blur_downsample, blur_upsample, make_initializer,
                     make_norm_layer, norm_uses_bias)


def _pad_reflect(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class ResnetBlock(nn.Module):
    features: int
    norm: Callable[[], nn.Module]
    use_bias: bool = True
    use_dropout: bool = False
    padding_type: str = "reflect"
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        mode = {"reflect": "reflect", "replicate": "edge", "zero": "constant"}[self.padding_type]
        h = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)
        h = nn.Conv(self.features, (3, 3), padding="VALID", use_bias=self.use_bias,
                    kernel_init=self.kernel_init, dtype=self.dtype)(h)
        h = self.norm()(h)
        h = nn.relu(h)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=deterministic)(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)
        h = nn.Conv(self.features, (3, 3), padding="VALID", use_bias=self.use_bias,
                    kernel_init=self.kernel_init, dtype=self.dtype)(h)
        h = self.norm()(h)
        return x + h


class ResnetGenerator(nn.Module):
    ngf: int = 64
    out_nc: int = 3
    n_blocks: int = 9
    n_downsampling: int = 2
    norm_type: str = "instance"
    use_dropout: bool = False
    no_antialias: bool = False
    no_antialias_up: bool = False
    padding_type: str = "reflect"
    generate_T_imgs: bool = False
    t_resolution_multiplier: int = 1
    init_type: str = "xavier"
    init_gain: float = 0.02
    dtype: Optional[Any] = None
    train: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        norm = make_norm_layer(self.norm_type, train=self.train,
                               axis_name=self.axis_name, dtype=self.dtype)
        winit = make_initializer(self.init_type, self.init_gain)
        use_bias = norm_uses_bias(self.norm_type)
        conv = lambda f, k, s=1: nn.Conv(f, (k, k), strides=(s, s), padding="VALID",
                                         use_bias=use_bias, kernel_init=winit,
                                         dtype=self.dtype)

        h = _pad_reflect(x, 3)
        h = conv(self.ngf, 7)(h)
        h = norm()(h)
        h = nn.relu(h)

        for i in range(self.n_downsampling):
            mult = 2 ** i
            feats = self.ngf * mult * 2
            if self.no_antialias:
                h = nn.Conv(feats, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            use_bias=use_bias, kernel_init=winit, dtype=self.dtype)(h)
                h = norm()(h)
                h = nn.relu(h)
            else:
                h = nn.Conv(feats, (3, 3), padding=((1, 1), (1, 1)), use_bias=use_bias,
                            kernel_init=winit, dtype=self.dtype)(h)
                h = norm()(h)
                h = nn.relu(h)
                h = blur_downsample(h)

        mult = 2 ** self.n_downsampling
        for _ in range(self.n_blocks):
            h = ResnetBlock(self.ngf * mult, norm=norm, use_bias=use_bias,
                            use_dropout=self.use_dropout,
                            padding_type=self.padding_type, kernel_init=winit,
                            dtype=self.dtype)(h, deterministic=deterministic)

        n_up = self.n_downsampling
        if self.generate_T_imgs:
            n_up += int(np.log2(self.t_resolution_multiplier))
        for i in range(n_up):
            mult = 2 ** (self.n_downsampling - i)
            feats = int(self.ngf * mult / 2)
            if self.no_antialias_up:
                # torch ConvTranspose k3 s2 p1 op1 ⇒ out = 2·in; on the
                # stride-dilated input that is asymmetric padding (1, 2)
                h = nn.ConvTranspose(feats, (3, 3), strides=(2, 2),
                                     padding=((1, 2), (1, 2)),
                                     use_bias=use_bias, kernel_init=winit,
                                     dtype=self.dtype)(h)
            else:
                h = blur_upsample(h)
                h = nn.Conv(feats, (3, 3), padding=((1, 1), (1, 1)), use_bias=use_bias,
                            kernel_init=winit, dtype=self.dtype)(h)
            h = norm()(h)
            h = nn.relu(h)

        h = _pad_reflect(h, 3)
        h = nn.Conv(self.out_nc, (7, 7), padding="VALID", kernel_init=winit,
                    dtype=self.dtype)(h)
        return jnp.tanh(h)
