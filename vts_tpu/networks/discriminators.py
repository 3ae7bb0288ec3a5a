"""PatchGAN discriminator family (flax.linen, NHWC).

Re-designed equivalents of the reference zoo (models/networks.py:1649-1800):
``NLayerDiscriminator`` (70×70 PatchGAN), ``MultiscaleDiscriminator``
(pix2pixHD-style pyramid of NLayer heads over avg-pooled inputs, optionally
returning intermediate features for feature matching), ``PixelDiscriminator``
(1×1) and ``PatchDiscriminator`` (16×16 tiling).

Multiscale outputs are a list (coarsest head first, matching the reference's
``layer{num_D-1-i}`` ordering) of per-scale lists of feature maps whose last
element is the logit map.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from .blocks import (Conv4x4, avg_pool_3x3_s2_nopad_count, make_initializer,
                     make_norm_layer)


def _split_spectral(norm_type: str):
    """SPADE-style D norms: 'spectralinstance' → (spectral=True, 'instance')
    (reference models/normalization.py:18-52)."""
    if norm_type.startswith("spectral"):
        sub = norm_type[len("spectral"):] or "none"
        return True, sub
    return False, norm_type


class NLayerDiscriminator(nn.Module):
    """k4 PatchGAN: s2 conv ×(n_layers) then s1 conv + 1-logit head, pad 2.

    Reference models/networks.py:1696-1750.  Channel schedule:
    ndf, 2·ndf, … capped at 512.  Returns the logit map, or — when
    ``get_interm_feat`` — the list of all intermediate activations ending
    with the logit map.
    """

    ndf: int = 64
    n_layers: int = 3
    norm_type: str = "batch"
    use_sigmoid: bool = False
    get_interm_feat: bool = False
    init_type: str = "xavier"
    init_gain: float = 0.02
    dtype: Optional[Any] = None
    train: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        spectral, sub_norm = _split_spectral(self.norm_type)
        norm = make_norm_layer(sub_norm, train=self.train,
                               axis_name=self.axis_name, dtype=self.dtype)
        winit = make_initializer(self.init_type, self.init_gain)
        if spectral:
            from .spade_nets import SpectralConv

            def conv4(f, s):
                return SpectralConv(f, (4, 4), strides=(s, s),
                                    padding=((2, 2), (2, 2)), kernel_init=winit,
                                    dtype=self.dtype, train=self.train)
        else:
            def conv4(f, s):
                return Conv4x4(f, stride=s, padding=2, kernel_init=winit,
                               dtype=self.dtype)
        feats: List[jnp.ndarray] = []

        h = conv4(self.ndf, 2)(x)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)

        nf = self.ndf
        for _ in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = conv4(nf, 2)(h)
            h = norm()(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)

        nf = min(nf * 2, 512)
        h = conv4(nf, 1)(h)
        h = norm()(h)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)

        h = conv4(1, 1)(h)
        if self.use_sigmoid:
            h = nn.sigmoid(h)
        feats.append(h)

        if self.get_interm_feat:
            return feats
        return h


class MultiscaleDiscriminator(nn.Module):
    """num_D NLayer heads on a ×2 avg-pool pyramid (reference networks.py:1649-1694).

    Output: list over scales — entry i is the head applied to the input
    downsampled i times; each entry is itself a list of feature maps (length 1
    holding just the logit map unless ``get_interm_feat``)."""

    ndf: int = 64
    n_layers: int = 3
    num_D: int = 3
    norm_type: str = "batch"
    use_sigmoid: bool = False   # vanilla GAN mode only
    get_interm_feat: bool = False
    init_type: str = "xavier"
    init_gain: float = 0.02
    dtype: Optional[Any] = None
    train: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        results = []
        h = x
        for i in range(self.num_D):
            head = NLayerDiscriminator(
                ndf=self.ndf, n_layers=self.n_layers, norm_type=self.norm_type,
                use_sigmoid=self.use_sigmoid, get_interm_feat=True,
                init_type=self.init_type, init_gain=self.init_gain,
                dtype=self.dtype, train=self.train, axis_name=self.axis_name,
                name=f"scale{self.num_D - 1 - i}")
            out = head(h)
            results.append(out if self.get_interm_feat else [out[-1]])
            if i != self.num_D - 1:
                h = avg_pool_3x3_s2_nopad_count(h)
        return results


class PixelDiscriminator(nn.Module):
    """1×1 PatchGAN (reference networks.py:1752-1782)."""

    ndf: int = 64
    norm_type: str = "batch"
    init_type: str = "xavier"
    init_gain: float = 0.02
    dtype: Optional[Any] = None
    train: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        norm = make_norm_layer(self.norm_type, train=self.train,
                               axis_name=self.axis_name, dtype=self.dtype)
        winit = make_initializer(self.init_type, self.init_gain)
        conv = lambda f, name: nn.Conv(f, (1, 1), kernel_init=winit, dtype=self.dtype, name=name)
        h = conv(self.ndf, "conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        h = conv(self.ndf * 2, "conv1")(h)
        h = norm()(h)
        h = nn.leaky_relu(h, 0.2)
        return conv(1, "conv2")(h)


class PatchDiscriminator(nn.Module):
    """Tiles the input into 16×16 patches and runs a 2-layer NLayer head on
    the tile batch (reference networks.py:1784-1798)."""

    ndf: int = 64
    norm_type: str = "batch"
    init_type: str = "xavier"
    init_gain: float = 0.02
    dtype: Optional[Any] = None
    train: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        n, hh, ww, c = x.shape
        size = 16
        y, xb = hh // size, ww // size
        tiles = x.reshape(n, y, size, xb, size, c).transpose(0, 1, 3, 2, 4, 5)
        tiles = tiles.reshape(n * y * xb, size, size, c)
        return NLayerDiscriminator(
            ndf=self.ndf, n_layers=2, norm_type=self.norm_type,
            init_type=self.init_type, init_gain=self.init_gain,
            dtype=self.dtype, train=self.train, axis_name=self.axis_name,
            name="head")(tiles)
