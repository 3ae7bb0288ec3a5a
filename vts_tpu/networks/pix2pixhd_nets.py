"""Pix2PixHD generator family (NHWC).

Re-designs of GlobalGenerator / LocalEnhancer / Encoder
(reference models/networks.py:1897-2019) and the VGG19 perceptual loss
(:2021-2073).  Torch's ConvTranspose k3 s2 p1 op1 maps to flax padding (1, 2)
on the stride-dilated input (out = 2·in).
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import (avg_pool_3x3_s2_nopad_count, make_initializer,
                     make_norm_layer)
from .resnet_gen import ResnetBlock, _pad_reflect


class _GlobalCore(nn.Module):
    """Stem → downsamples → resnet blocks → upsamples (no output head)."""

    ngf: int
    n_downsampling: int
    n_blocks: int
    norm: Callable
    kernel_init: Callable
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, s=1, p="VALID": nn.Conv(
            f, (k, k), strides=(s, s), padding=p,
            kernel_init=self.kernel_init, dtype=self.dtype)
        h = _pad_reflect(x, 3)
        h = conv(self.ngf, 7)(h)
        h = self.norm()(h)
        h = nn.relu(h)
        for i in range(self.n_downsampling):
            mult = 2 ** i
            h = conv(self.ngf * mult * 2, 3, 2, ((1, 1), (1, 1)))(h)
            h = self.norm()(h)
            h = nn.relu(h)
        mult = 2 ** self.n_downsampling
        for _ in range(self.n_blocks):
            h = ResnetBlock(self.ngf * mult, norm=self.norm, use_bias=True,
                            kernel_init=self.kernel_init, dtype=self.dtype)(h)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            h = nn.ConvTranspose(int(self.ngf * mult / 2), (3, 3), strides=(2, 2),
                                 padding=((1, 2), (1, 2)),
                                 kernel_init=self.kernel_init, dtype=self.dtype)(h)
            h = self.norm()(h)
            h = nn.relu(h)
        return h


class GlobalGenerator(nn.Module):
    """Reference networks.py:1953-1984."""

    ngf: int = 64
    out_nc: int = 3
    n_downsampling: int = 3
    n_blocks: int = 9
    norm_type: str = "instance"
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
        h = _GlobalCore(self.ngf, self.n_downsampling, self.n_blocks, norm,
                        winit, self.dtype, name="core")(x)
        h = _pad_reflect(h, 3)
        h = nn.Conv(self.out_nc, (7, 7), padding="VALID", kernel_init=winit,
                    dtype=self.dtype)(h)
        return jnp.tanh(h)


class LocalEnhancer(nn.Module):
    """Coarse global core + per-level local enhancer branches
    (reference networks.py:1897-1950)."""

    ngf: int = 32
    out_nc: int = 3
    n_downsample_global: int = 3
    n_blocks_global: int = 9
    n_local_enhancers: int = 1
    n_blocks_local: int = 3
    norm_type: str = "instance"
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
        conv = lambda f, k, s=1, p="VALID": nn.Conv(
            f, (k, k), strides=(s, s), padding=p, kernel_init=winit, dtype=self.dtype)

        pyramid: List[jnp.ndarray] = [x]
        for _ in range(self.n_local_enhancers):
            pyramid.append(avg_pool_3x3_s2_nopad_count(pyramid[-1]))

        ngf_global = self.ngf * (2 ** self.n_local_enhancers)
        out_prev = _GlobalCore(ngf_global, self.n_downsample_global,
                               self.n_blocks_global, norm, winit, self.dtype,
                               name="global")(pyramid[-1])

        for n in range(1, self.n_local_enhancers + 1):
            g = self.ngf * (2 ** (self.n_local_enhancers - n))
            inp = pyramid[self.n_local_enhancers - n]
            h = _pad_reflect(inp, 3)
            h = conv(g, 7)(h)
            h = norm()(h)
            h = nn.relu(h)
            h = conv(g * 2, 3, 2, ((1, 1), (1, 1)))(h)
            h = norm()(h)
            h = nn.relu(h)
            h = h + out_prev
            for _ in range(self.n_blocks_local):
                h = ResnetBlock(g * 2, norm=norm, use_bias=True,
                                kernel_init=winit, dtype=self.dtype)(h)
            h = nn.ConvTranspose(g, (3, 3), strides=(2, 2),
                                 padding=((1, 2), (1, 2)), kernel_init=winit,
                                 dtype=self.dtype)(h)
            h = norm()(h)
            h = nn.relu(h)
            out_prev = h
        h = _pad_reflect(out_prev, 3)
        h = nn.Conv(self.out_nc, (7, 7), padding="VALID", kernel_init=winit,
                    dtype=self.dtype)(h)
        return jnp.tanh(h)


class Encoder(nn.Module):
    """Feature encoder with instance-wise average pooling left to the caller
    (reference networks.py:1986-2019 — the per-instance pooling is a
    host/data concern; provide ``instance_average`` below)."""

    ngf: int = 32
    out_nc: int = 3
    n_downsampling: int = 4
    norm_type: str = "instance"
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
        conv = lambda f, k, s=1, p="VALID": nn.Conv(
            f, (k, k), strides=(s, s), padding=p, kernel_init=winit, dtype=self.dtype)
        h = _pad_reflect(x, 3)
        h = conv(self.ngf, 7)(h)
        h = norm()(h)
        h = nn.relu(h)
        for i in range(self.n_downsampling):
            mult = 2 ** i
            h = conv(self.ngf * mult * 2, 3, 2, ((1, 1), (1, 1)))(h)
            h = norm()(h)
            h = nn.relu(h)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            h = nn.ConvTranspose(int(self.ngf * mult / 2), (3, 3), strides=(2, 2),
                                 padding=((1, 2), (1, 2)), kernel_init=winit,
                                 dtype=self.dtype)(h)
            h = norm()(h)
            h = nn.relu(h)
        h = _pad_reflect(h, 3)
        h = nn.Conv(self.out_nc, (7, 7), padding="VALID", kernel_init=winit,
                    dtype=self.dtype)(h)
        return jnp.tanh(h)


def instance_average(features: jnp.ndarray, inst: jnp.ndarray,
                     num_instances: int) -> jnp.ndarray:
    """Instance-wise average pooling over integer instance maps
    (reference Encoder.forward, networks.py:2007-2019) — segment-mean via
    one-hot matmuls, jit-safe for a static instance count."""
    n, h, w, c = features.shape
    onehot = jax.nn.one_hot(inst.reshape(n, h * w), num_instances, dtype=features.dtype)
    feat = features.reshape(n, h * w, c)
    sums = jnp.einsum("npk,npc->nkc", onehot, feat)
    counts = jnp.sum(onehot, axis=1)[..., None]
    means = sums / jnp.maximum(counts, 1.0)
    pooled = jnp.einsum("npk,nkc->npc", onehot, means)
    return pooled.reshape(n, h, w, c)
