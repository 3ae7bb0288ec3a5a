"""StyleGAN2 network family (NHWC, pure JAX — no custom CUDA).

Re-design of the reference's pure-PyTorch CUT port
(models/stylegan_networks.py:18-930), selected via ``--netG
stylegan2|smallstylegan2`` and ``--netD stylegan2|tilestylegan2``.  The
vendored CUDA ``upfirdn2d``/``bias_act`` kernels
(reference thirdparty/stylegan2_ada/torch_utils/ops/) become the grouped-conv
FIR resamplers from :mod:`vts_tpu.networks.blocks` — XLA fuses
pad+filter+stride into one kernel, which is exactly what those CUDA kernels
hand-fused; the fused bias+leaky-relu+gain ("bias_act") is a single XLA
elementwise fusion.

Pieces: equalized-lr conv/linear, FIR blur, modulated conv (demodulation in
fp32), noise injection, StyledConv, encoder/decoder translation generator
(stylegan_networks.py:800-930), and the discriminator with minibatch-stddev
(:696-798) plus the 16×16 tile variant.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn



def _fir_kernel(k: Sequence[float], gain: float = 1.0) -> np.ndarray:
    a = np.asarray(k, np.float32)
    f = np.outer(a, a)
    f = f / f.sum() * gain
    return f


def fir_filter(x: jnp.ndarray, kernel: np.ndarray, up: int = 1, down: int = 1,
               pad: Tuple[int, int] = (0, 0)) -> jnp.ndarray:
    """upfirdn2d: zero-upsample ×up → pad → FIR → downsample ×down.

    The TPU-native equivalent of the reference CUDA kernel
    (thirdparty/stylegan2_ada/torch_utils/ops/upfirdn2d.cu): one grouped
    ``conv_general_dilated`` with lhs dilation and window stride."""
    c = x.shape[-1]
    kh, kw = kernel.shape
    kern = jnp.tile(jnp.asarray(kernel, x.dtype)[:, :, None, None], (1, 1, 1, c))
    p0, p1 = pad
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(down, down),
        padding=((p0, p1), (p0, p1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def blur(x, kernel=(1, 3, 3, 1), pad=(2, 1), upsample_factor: int = 1):
    k = _fir_kernel(kernel, gain=upsample_factor ** 2)
    return fir_filter(x, k, pad=pad)


def upsample2(x, kernel=(1, 3, 3, 1)):
    k = _fir_kernel(kernel, gain=4.0)
    p = k.shape[0] - 2
    return fir_filter(x, k, up=2, pad=((p + 1) // 2 + 1, p // 2))


def downsample2(x, kernel=(1, 3, 3, 1)):
    k = _fir_kernel(kernel)
    p = k.shape[0] - 2
    return fir_filter(x, k, down=2, pad=((p + 1) // 2, p // 2))


def fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=2 ** 0.5):
    if bias is not None:
        x = x + bias
    return nn.leaky_relu(x, negative_slope) * scale


class EqualConv(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0),
                       (self.kernel, self.kernel, in_c, self.features))
        scale = 1.0 / math.sqrt(in_c * self.kernel ** 2)
        y = jax.lax.conv_general_dilated(
            x, w * scale, (self.stride, self.stride),
            ((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class EqualLinear(nn.Module):
    features: int
    lr_mul: float = 1.0
    activation: bool = False
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0 / self.lr_mul),
                       (in_c, self.features))
        b = self.param("bias", nn.initializers.constant(self.bias_init),
                       (self.features,))
        scale = (1.0 / math.sqrt(in_c)) * self.lr_mul
        y = x @ (w * scale)
        if self.activation:
            return fused_leaky_relu(y, b * self.lr_mul)
        return y + b * self.lr_mul


class ConvLayer(nn.Module):
    """EqualConv (+ optional blur-downsample) + fused leaky relu."""

    features: int
    kernel: int = 3
    downsample: bool = False
    activate: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        if self.downsample:
            p = 4 - 2  # blur kernel len - factor
            x = blur(x, pad=((p + 1) // 2, p // 2))
            y = EqualConv(self.features, self.kernel, stride=2,
                          padding=0 if self.kernel == 1 else 1,
                          use_bias=self.use_bias and not self.activate)(x)
        else:
            y = EqualConv(self.features, self.kernel, stride=1,
                          padding=self.kernel // 2,
                          use_bias=self.use_bias and not self.activate)(x)
        if self.activate:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = fused_leaky_relu(y, b)
        return y


class ModulatedConv(nn.Module):
    """Style-modulated, demodulated conv (reference stylegan_networks.py:248-349)."""

    features: int
    kernel: int = 3
    style_dim: int = 512
    demodulate: bool = True
    upsample: bool = False

    @nn.compact
    def __call__(self, x, style):
        n, h, w_, in_c = x.shape
        k = self.kernel
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (k, k, in_c, self.features))
        scale = 1.0 / math.sqrt(in_c * k * k)
        s = EqualLinear(in_c, bias_init=1.0, name="modulation")(style)  # (n, in_c)
        w = (weight * scale)[None] * s[:, None, None, :, None]          # (n,k,k,in,out)
        if self.demodulate:
            demod = jax.lax.rsqrt(jnp.sum(w.astype(jnp.float32) ** 2,
                                          axis=(1, 2, 3)) + 1e-8)       # (n,out)
            w = w * demod[:, None, None, None, :].astype(w.dtype)
        # grouped conv over the batch: fold batch into feature groups
        if self.upsample:
            x = jax.image.resize(x, (n, h * 2, w_ * 2, in_c), "nearest")
            x = blur(x, pad=(2, 1))
        x_g = x.transpose(1, 2, 0, 3).reshape(1, x.shape[1], x.shape[2], n * in_c)
        # (n,k,k,in,out) → (k,k,in, n*out) with feature_group_count=n
        w_g = w.transpose(1, 2, 3, 0, 4).reshape(k, k, in_c, n * self.features)
        y = jax.lax.conv_general_dilated(
            x_g, w_g, (1, 1), ((k // 2, k // 2), (k // 2, k // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=n)
        y = y.reshape(y.shape[1], y.shape[2], n, self.features).transpose(2, 0, 1, 3)
        return y


class StyledConv(nn.Module):
    features: int
    kernel: int = 3
    style_dim: int = 512
    upsample: bool = False
    inject_noise: bool = True

    @nn.compact
    def __call__(self, x, style=None, rng=None):
        if style is None:
            style = jnp.ones((x.shape[0], x.shape[-1]), x.dtype)
        y = ModulatedConv(self.features, self.kernel, self.style_dim,
                          upsample=self.upsample, name="conv")(x, style)
        if self.inject_noise:
            strength = self.param("noise_strength", nn.initializers.zeros, ())
            noise = jax.random.normal(
                self.make_rng("noise") if rng is None and self.has_rng("noise") else
                (rng if rng is not None else jax.random.key(0)),
                (y.shape[0], y.shape[1], y.shape[2], 1), y.dtype)
            y = y + strength * noise
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return fused_leaky_relu(y, b)


class ResBlock(nn.Module):
    features: int
    downsample: bool = True

    @nn.compact
    def __call__(self, x):
        out = ConvLayer(x.shape[-1], 3)(x)
        out = ConvLayer(self.features, 3, downsample=self.downsample)(out)
        skip = ConvLayer(self.features, 1, downsample=self.downsample,
                         activate=False, use_bias=False)(x)
        return (out + skip) / math.sqrt(2)


def _channels(ngf: int):
    cm = ngf / 32
    return {r: (min(512, int(round(base * cm))) if r <= 32 else int(round(base * cm)))
            for r, base in ((4, 4096), (8, 2048), (16, 1024), (32, 512),
                            (64, 256), (128, 128), (256, 64), (512, 32), (1024, 16))}


class StyleGAN2Generator(nn.Module):
    """Encoder/decoder translation generator (stylegan_networks.py:800-930)."""

    ngf: int = 64
    out_nc: int = 3
    n_blocks: Optional[int] = None       # None → 6 ('smallstylegan2' → 2)
    crop_size: int = 256
    num_downsampling: int = 1
    init_type: str = "xavier"            # unused (equalized lr)
    init_gain: float = 0.02
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        nb = self.n_blocks if self.n_blocks is not None else 6
        ch = _channels(self.ngf)
        res = 2 ** int(np.rint(np.log2(self.crop_size)))
        h = ConvLayer(ch[res], 1)(x)
        for _ in range(self.num_downsampling):
            h = ResBlock(ch[res // 2])(h)
            res //= 2
        for _ in range(nb // 2):
            h = ResBlock(ch[res], downsample=False)(h)
        # decoder
        for _ in range(nb // 2):
            h = ResBlock(ch[res], downsample=False)(h)
        for _ in range(self.num_downsampling):
            h = StyledConv(ch[res * 2], 3, upsample=True,
                           inject_noise=self.n_blocks is None)(h)
            res *= 2
        return ConvLayer(self.out_nc, 1)(h)


class StyleGAN2Discriminator(nn.Module):
    """Blur-downsampling D with minibatch stddev (stylegan_networks.py:696-798)."""

    ndf: int = 64
    n_layers: int = 3
    tile: bool = False
    crop_size: int = 256

    @nn.compact
    def __call__(self, x):
        if self.tile:
            n, hh, ww, c = x.shape
            size = self.crop_size // 4 if self.crop_size >= 64 else 16
            y_t, x_t = hh // size, ww // size
            x = x.reshape(n, y_t, size, x_t, size, c).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(n * y_t * x_t, size, size, c)
        ch = _channels(self.ndf * 2)
        res = 2 ** int(np.rint(np.log2(x.shape[1])))
        h = ConvLayer(ch[min(res, 1024)], 1)(x)
        while res > 4:
            h = ResBlock(ch[max(res // 2, 4)])(h)
            res //= 2
        # minibatch stddev
        n = h.shape[0]
        group = min(n, 4)
        g = h[: (n // group) * group].reshape(group, -1, *h.shape[1:])
        std = jnp.sqrt(jnp.var(g.astype(jnp.float32), axis=0) + 1e-8)
        mean_std = jnp.mean(std, axis=(1, 2, 3), keepdims=True)
        mean_std = jnp.broadcast_to(
            jnp.repeat(mean_std, group, axis=0)[: n, :, :, :1],
            (n, h.shape[1], h.shape[2], 1)).astype(h.dtype)
        h = jnp.concatenate([h, mean_std], axis=-1)
        h = ConvLayer(ch[4], 3)(h)
        h = h.reshape(n, -1)
        h = EqualLinear(ch[4], activation=True)(h)
        return EqualLinear(1)(h)
