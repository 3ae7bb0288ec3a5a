"""SPADE generator family (NHWC) with spectral normalization.

Re-designs of the reference SPADE pieces:
  * ``SpectralConv`` — power-iteration spectral norm (torch
    ``spectral_norm`` semantics, 1 iteration/step; the ``u`` vector lives in
    the ``batch_stats`` collection so the existing state plumbing carries it);
  * ``SPADENorm`` — param-free norm + segmap-conditioned γ/β MLP
    (reference models/normalization.py:68-112; config text
    ``spade(norm)(k)x(k)``, e.g. ``spadesyncbatch3x3`` — syncbatch maps to
    batch norm with a mesh ``axis_name``);
  * ``SPADEResnetBlock`` (reference models/architecture.py:21-68);
  * ``SPADEGenerator`` (reference models/networks.py:2126-2254): fc stem from
    the downsampled segmap (or a VAE z), head + 2 middle + num_upsampling
    up blocks with nearest 2× upsampling;
  * ``ConvEncoder`` + ``kld_loss`` for the VAE option
    (reference networks.py:2256-2317).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_nearest
from .blocks import make_initializer


class SpectralConv(nn.Module):
    """Conv2d wrapped in spectral normalization (power iteration).

    The singular-vector estimate ``u`` updates on every training apply via
    the mutable ``batch_stats`` collection, matching torch's one-step power
    iteration per forward."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Optional[Any] = None
    train: bool = True

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_c = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (kh, kw, in_c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) \
            if self.use_bias else None
        w2d = kernel.reshape(-1, self.features).astype(jnp.float32)
        u_var = self.variable("batch_stats", "u",
                              lambda: jax.random.normal(
                                  jax.random.key(0), (self.features,)) / jnp.sqrt(
                                      jnp.float32(self.features)))
        u = u_var.value
        v = w2d @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u_new = w2d.T @ v
        u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
        sigma = v @ (w2d @ u_new)
        if self.train and not self.is_initializing():
            u_var.value = jax.lax.stop_gradient(u_new)
        w_sn = (kernel / jax.lax.stop_gradient(sigma)).astype(
            self.dtype or kernel.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(w_sn.dtype), w_sn, self.strides,
            self.padding if not isinstance(self.padding, int)
            else [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


def parse_spade_config(config_text: str) -> Tuple[bool, str, int]:
    """'spectralspadesyncbatch3x3' → (spectral=True, 'syncbatch', ks=3)."""
    spectral = config_text.startswith("spectral")
    rest = config_text[len("spectral"):] if spectral else config_text
    m = re.search(r"spade(\D+)(\d)x\d", rest)
    if not m:
        raise ValueError(f"unparsable SPADE config {config_text!r}")
    return spectral, m.group(1), int(m.group(2))


class SPADENorm(nn.Module):
    """Param-free norm + segmap-conditioned modulation."""

    norm_nc: int
    param_free: str = "syncbatch"   # instance | batch | syncbatch
    ks: int = 3
    nhidden: int = 128
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Optional[Any] = None
    train: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, segmap):
        if self.param_free == "instance":
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.var(x, axis=(1, 2), keepdims=True)
            normalized = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        else:
            normalized = nn.BatchNorm(
                use_running_average=not self.train, momentum=0.9, epsilon=1e-5,
                use_bias=False, use_scale=False,
                axis_name=self.axis_name if self.param_free == "syncbatch" else None,
                dtype=self.dtype)(x)
        # torch F.interpolate default-nearest index convention (the generator
        # always DOWN-samples seg here, where jax's half-pixel rounding differs)
        seg = resize_nearest(segmap, (x.shape[1], x.shape[2]))
        pw = self.ks // 2
        conv = lambda f, name: nn.Conv(f, (self.ks, self.ks),
                                       padding=((pw, pw), (pw, pw)),
                                       kernel_init=self.kernel_init,
                                       dtype=self.dtype, name=name)
        actv = nn.relu(conv(self.nhidden, "mlp_shared")(seg))
        gamma = conv(self.norm_nc, "mlp_gamma")(actv)
        beta = conv(self.norm_nc, "mlp_beta")(actv)
        return normalized * (1 + gamma) + beta


class SPADEResnetBlock(nn.Module):
    fin: int
    fout: int
    norm_g: str = "spectralspadesyncbatch3x3"
    semantic_nc: int = 1
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Optional[Any] = None
    train: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, seg):
        spectral, pf, ks = parse_spade_config(self.norm_g)
        fmiddle = min(self.fin, self.fout)
        learned_shortcut = self.fin != self.fout

        def conv(f, k, name, use_bias=True):
            if spectral:
                return SpectralConv(f, (k, k), padding=((k // 2, k // 2),) * 2,
                                    use_bias=use_bias, kernel_init=self.kernel_init,
                                    dtype=self.dtype, train=self.train, name=name)
            return nn.Conv(f, (k, k), padding=((k // 2, k // 2),) * 2,
                           use_bias=use_bias, kernel_init=self.kernel_init,
                           dtype=self.dtype, name=name)

        def spade(nc, name):
            return SPADENorm(nc, param_free=pf, ks=ks, kernel_init=self.kernel_init,
                             dtype=self.dtype, train=self.train,
                             axis_name=self.axis_name, name=name)

        actvn = lambda z: nn.leaky_relu(z, 0.2)
        if learned_shortcut:
            x_s = conv(self.fout, 1, "conv_s", use_bias=False)(
                spade(self.fin, "norm_s")(x, seg))
        else:
            x_s = x
        dx = conv(fmiddle, 3, "conv_0")(actvn(spade(self.fin, "norm_0")(x, seg)))
        dx = conv(self.fout, 3, "conv_1")(actvn(spade(fmiddle, "norm_1")(dx, seg)))
        return x_s + dx


class SPADEGenerator(nn.Module):
    ngf: int = 64
    out_nc: int = 5
    semantic_nc: int = 1
    num_upsampling_layers: int = 3
    crop_size: int = 32          # output width during this phase
    aspect_ratio: float = 1.0
    norm_g: str = "spectralspadesyncbatch3x3"
    use_vae: bool = False
    z_dim: int = 256
    opt: Any = None
    init_type: str = "xavier"
    init_gain: float = 0.02
    dtype: Optional[Any] = None
    train: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, seg, z=None, *, deterministic: bool = True):
        nf = self.ngf
        n_up = self.num_upsampling_layers
        winit = make_initializer(self.init_type, self.init_gain)
        sw = seg.shape[2] // (2 ** n_up)
        sh = round(sw / self.aspect_ratio)

        def block(fin, fout, name):
            return SPADEResnetBlock(fin, fout, norm_g=self.norm_g,
                                    semantic_nc=self.semantic_nc,
                                    kernel_init=winit, dtype=self.dtype,
                                    train=self.train, axis_name=self.axis_name,
                                    name=name)

        up2 = lambda h: jax.image.resize(
            h, (h.shape[0], h.shape[1] * 2, h.shape[2] * 2, h.shape[3]), "nearest")

        if self.use_vae:
            assert z is not None, "VAE mode needs a z sample"
            x = nn.Dense(16 * nf * sw * sh, kernel_init=winit, dtype=self.dtype,
                         name="fc")(z)
            x = x.reshape(-1, sh, sw, 16 * nf)
        else:
            x = resize_nearest(seg, (sh, sw))
            x = nn.Conv(16 * nf, (3, 3), padding=((1, 1), (1, 1)), kernel_init=winit,
                        dtype=self.dtype, name="fc")(x)

        x = block(16 * nf, 16 * nf, "head_0")(x, seg)
        x = up2(x)
        x = block(16 * nf, 16 * nf, "G_middle_0")(x, seg)
        if n_up > 5:
            x = up2(x)
        x = block(16 * nf, 16 * nf, "G_middle_1")(x, seg)
        x = up2(x)
        x = block(16 * nf, 8 * nf, "up_0")(x, seg)
        final_nc = 8 * nf
        if n_up > 2:
            x = up2(x)
            x = block(8 * nf, 4 * nf, "up_1")(x, seg)
            final_nc = 4 * nf
        if n_up > 3:
            x = up2(x)
            x = block(4 * nf, 2 * nf, "up_2")(x, seg)
            final_nc = 2 * nf
        if n_up > 4:
            x = up2(x)
            x = block(2 * nf, nf, "up_3")(x, seg)
            final_nc = nf
        if n_up > 6:
            x = up2(x)
            x = block(nf, nf // 2, "up_4")(x, seg)
            final_nc = nf // 2
        x = nn.Conv(self.out_nc, (3, 3), padding=((1, 1), (1, 1)), kernel_init=winit,
                    dtype=self.dtype, name="conv_img")(nn.leaky_relu(x, 0.2))
        return jnp.tanh(x)


class ConvEncoder(nn.Module):
    """VAE image encoder → (mu, logvar) (reference networks.py:2256-2303)."""

    ndf: int = 64
    z_dim: int = 256
    crop_size: int = 256
    init_type: str = "xavier"
    init_gain: float = 0.02
    dtype: Optional[Any] = None
    train: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        winit = make_initializer(self.init_type, self.init_gain)
        if x.shape[1] != 256 or x.shape[2] != 256:
            x = jax.image.resize(x, (x.shape[0], 256, 256, x.shape[-1]), "linear")
        h = x
        for i, mult in enumerate((1, 2, 4, 8, 8, 8)):
            h = SpectralConv(self.ndf * mult, (3, 3), strides=(2, 2),
                             padding=((1, 1), (1, 1)), kernel_init=winit,
                             dtype=self.dtype, train=self.train, name=f"layer{i}")(h)
            mean = jnp.mean(h, axis=(1, 2), keepdims=True)
            var = jnp.var(h, axis=(1, 2), keepdims=True)
            h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
            if i > 0:
                h = nn.leaky_relu(h, 0.2)
        h = nn.leaky_relu(h, 0.2)
        h = h.reshape(h.shape[0], -1)
        mu = nn.Dense(self.z_dim, kernel_init=winit, name="fc_mu")(h)
        logvar = nn.Dense(self.z_dim, kernel_init=winit, name="fc_var")(h)
        return mu, logvar


def kld_loss(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """Reference networks.py:2305-2317."""
    return -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar))


def reparameterize(rng, mu, logvar):
    std = jnp.exp(0.5 * logvar)
    return mu + std * jax.random.normal(rng, mu.shape, mu.dtype)
