"""Shared network building blocks (flax.linen, NHWC).

Re-designed equivalents of the reference's block zoo:
  * norm factory — reference models/networks.py:127-145 (instance norm is
    affine-free and never tracks stats; batch norm is affine with running
    stats and syncs across the data mesh axis via ``axis_name``);
  * weight init — reference models/networks.py:191-230 (xavier-normal with
    gain ``init_gain`` is the shipped default: init_type=xavier, gain 0.02);
  * ``Down``/``Up`` U-Net halves — reference thirdparty/unet/unet_parts_custom.py:9-82;
  * antialiased ``BlurDown``/``BlurUp`` (binomial FIR) — reference
    models/networks.py:50-107 — expressed as grouped ``conv_general_dilated``
    so XLA fuses pad+filter+stride (the TPU replacement for the CUDA
    ``upfirdn2d`` kernel, reference thirdparty/stylegan2_ada/torch_utils/ops/).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def _conv_fans(shape: Sequence[int]):
    # flax conv kernels are (kh, kw, in, out); dense are (in, out)
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    fan_in = shape[-2] * receptive
    fan_out = shape[-1] * receptive
    return fan_in, fan_out


def xavier_normal_gain(gain: float):
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _conv_fans(shape)
        std = gain * np.sqrt(2.0 / (fan_in + fan_out))
        return jax.random.normal(key, shape, dtype) * std

    return init


def normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init


def kaiming_normal():
    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _conv_fans(shape)
        std = np.sqrt(2.0 / fan_in)
        return jax.random.normal(key, shape, dtype) * std

    return init


def orthogonal_gain(gain: float):
    base = jax.nn.initializers.orthogonal()

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * gain

    return init


def make_initializer(init_type: str, init_gain: float) -> Callable:
    """Reference models/networks.py:191-230."""
    if init_type == "normal":
        return normal_init(init_gain)
    if init_type == "xavier":
        return xavier_normal_gain(init_gain)
    if init_type == "xavier_uniform":
        return jax.nn.initializers.xavier_uniform()
    if init_type == "kaiming":
        return kaiming_normal()
    if init_type == "orthogonal":
        return orthogonal_gain(init_gain)
    if init_type == "none":
        return jax.nn.initializers.lecun_normal()
    raise NotImplementedError(f"initialization method {init_type!r} not implemented")


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------

class InstanceNorm(nn.Module):
    """Affine-free instance norm over (H, W), eps matching torch (1e-5)."""

    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        # statistics accumulate in fp32 (tiny (N,1,1,C) tensors); the
        # normalization arithmetic stays in x's dtype — upcasting the whole
        # canvas materializes fp32 activations (and their backward residuals)
        # at 2× the bytes in the TPU's lane-padded layouts, which the device
        # trace showed costing ~3 ms per norm layer at 1536².
        # Caveat: the one-pass variance E[x²]−(E[x])² cancels catastrophically
        # when |mean| ≫ std; the parity suite's tolerances hold for GAN-scale
        # activations — if they ever drift, subtract the fp32 mean before
        # squaring (two-pass) while keeping the fp32-stats split.
        mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1, 2),
                       keepdims=True) - jnp.square(mean)
        scale = jax.lax.rsqrt(jnp.maximum(var, 0.0) + self.epsilon)
        return (x - mean.astype(x.dtype)) * scale.astype(x.dtype)


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x


def make_norm_layer(norm_type: str, *, train: bool = True, axis_name: Optional[str] = None,
                    dtype: Optional[Dtype] = None) -> Callable[[], nn.Module]:
    """Factory mirroring get_norm_layer (reference models/networks.py:127-145).

    ``batch`` syncs batch statistics over the data-parallel mesh axis when
    ``axis_name`` is set — the TPU-native replacement for the vendored
    SyncBN master-slave pipes (reference models/sync_batchnorm/).
    """
    if norm_type == "instance":
        return functools.partial(InstanceNorm, dtype=dtype)
    if norm_type == "batch":
        def bn_scale_init(key, shape, dtype_=jnp.float32):
            # torch init_weights: BatchNorm weight ~ N(1.0, init_gain)
            return 1.0 + jax.random.normal(key, shape, dtype_) * 0.02

        return functools.partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=axis_name,
            dtype=dtype,
            scale_init=bn_scale_init,
        )
    if norm_type == "none":
        return Identity
    raise NotImplementedError(f"normalization layer {norm_type!r} not found")


def norm_uses_bias(norm_type: str) -> bool:
    """Convs followed by instance norm keep their bias (instance norm is
    affine-free); batch norm absorbs it. Reference unet_parts_custom.py:16-20."""
    return norm_type != "batch"


# ---------------------------------------------------------------------------
# conv wrappers
# ---------------------------------------------------------------------------

class Conv4x4(nn.Module):
    """4x4 conv, stride 2 (or 1), symmetric padding — the U-Net/PatchGAN unit.

    ``groups`` > 1 is the garment-packing path: G independent garments'
    kernels ride one grouped conv (feature_group_count=G), so G tiny-channel
    convs (ngf=10 → ≤8 of 128 MXU lanes each) become one lane-filling op.
    """

    features: int
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Optional[Dtype] = None
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            kernel_size=(4, 4),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            feature_group_count=self.groups,
        )(x)


class _GroupedConvT(nn.Module):
    """Grouped 4x4/s2 transposed conv (flax ConvTranspose lacks groups).

    Pinned equivalence (tests/test_packing.py): nn.ConvTranspose(k=4, s=2,
    padding=((2,2),(2,2))) == conv_general_dilated(x, kernel, strides=1,
    padding=((2,2),(2,2)), lhs_dilation=(2,2)) with the UNFLIPPED (kh, kw,
    cin_per_group, out) kernel — so the param layout matches ConvTranspose
    per group and feature_group_count applies directly.
    """

    features: int
    groups: int
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        cin_g = x.shape[-1] // self.groups
        kernel = self.param("kernel", self.kernel_init,
                            (4, 4, cin_g, self.features))
        dt = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dt), kernel.astype(dt), window_strides=(1, 1),
            padding=((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(dt)
        return y


class ConvT4x4(nn.Module):
    """4x4 transposed conv, stride 2 → exact 2x upsample (out = in*2,
    matching torch ConvTranspose2d(k=4, s=2, p=1)).  flax pads the
    stride-dilated input, so torch's p maps to flax padding k-1-p = 2."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Optional[Dtype] = None
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        if self.groups > 1:
            # child named like the groups=1 path so packed params map
            # leaf-for-leaf onto per-garment ConvTranspose params
            return _GroupedConvT(self.features, self.groups,
                                 use_bias=self.use_bias,
                                 kernel_init=self.kernel_init,
                                 dtype=self.dtype,
                                 name="ConvTranspose_0")(x)
        return nn.ConvTranspose(
            self.features,
            kernel_size=(4, 4),
            strides=(2, 2),
            padding=((2, 2), (2, 2)),
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
        )(x)


def packed_concat(a: jnp.ndarray, b: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Channel-concat per packed group: (…, G·Ca) ⊕ (…, G·Cb) → (…, G·(Ca+Cb))
    with group-g's channels kept contiguous (what feature_group_count needs)."""
    if groups == 1:
        return jnp.concatenate([a, b], axis=-1)
    sa = a.shape[:-1] + (groups, a.shape[-1] // groups)
    sb = b.shape[:-1] + (groups, b.shape[-1] // groups)
    out = jnp.concatenate([a.reshape(sa), b.reshape(sb)], axis=-1)
    return out.reshape(a.shape[:-1] + (a.shape[-1] + b.shape[-1],))


# ---------------------------------------------------------------------------
# U-Net halves (reference thirdparty/unet/unet_parts_custom.py:9-82)
# ---------------------------------------------------------------------------

class Down(nn.Module):
    """[LeakyReLU(0.2)] + Conv4x4(s2) + [norm].

    outermost: conv only.  innermost: lrelu + conv (no norm).
    """

    features: int
    norm: Callable[[], nn.Module]
    innermost: bool = False
    outermost: bool = False
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Optional[Dtype] = None
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        if not self.outermost:
            x = nn.leaky_relu(x, 0.2)
        x = Conv4x4(self.features, use_bias=self.use_bias,
                    kernel_init=self.kernel_init, dtype=self.dtype,
                    groups=self.groups)(x)
        if not (self.outermost or self.innermost):
            x = self.norm()(x)
        return x


class Up(nn.Module):
    """ReLU + ConvT4x4(s2) + norm (or Tanh at the outermost).

    Interior layers concatenate the skip connection on channels before the
    transposed conv; the outermost and innermost layers take ``x`` alone
    (reference unet_parts_custom.py:74-79 — note the outermost Up does *not*
    consume the down0 skip).
    """

    features: int
    norm: Callable[[], nn.Module]
    innermost: bool = False
    outermost: bool = False
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Optional[Dtype] = None
    dropout: float = 0.0
    groups: int = 1

    @nn.compact
    def __call__(self, x, skip=None, *, deterministic: bool = True):
        if not (self.outermost or self.innermost) and skip is not None:
            x = packed_concat(x, skip, self.groups)
        x = nn.relu(x)
        bias = True if self.outermost else self.use_bias
        x = ConvT4x4(self.features, use_bias=bias,
                     kernel_init=self.kernel_init, dtype=self.dtype,
                     groups=self.groups)(x)
        if self.outermost:
            x = jnp.tanh(x)
        else:
            x = self.norm()(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


# ---------------------------------------------------------------------------
# antialiased resampling (binomial FIR blur) — the upfirdn2d replacement
# ---------------------------------------------------------------------------

def binomial_filter_1d(filt_size: int) -> np.ndarray:
    """Pascal-row FIR taps (reference models/networks.py:29-47)."""
    rows = {
        1: [1.0],
        2: [1.0, 1.0],
        3: [1.0, 2.0, 1.0],
        4: [1.0, 3.0, 3.0, 1.0],
        5: [1.0, 4.0, 6.0, 4.0, 1.0],
        6: [1.0, 5.0, 10.0, 10.0, 5.0, 1.0],
        7: [1.0, 6.0, 15.0, 20.0, 15.0, 6.0, 1.0],
    }
    return np.asarray(rows[filt_size], dtype=np.float32)


def binomial_filter_2d(filt_size: int) -> np.ndarray:
    a = binomial_filter_1d(filt_size)
    f = np.outer(a, a)
    return f / f.sum()


def _pad_2d(x, pads, mode: str):
    jax_mode = {"reflect": "reflect", "refl": "reflect", "repl": "edge",
                "replicate": "edge", "zero": "constant"}[mode]
    (pt, pb), (pl, pr) = pads
    return jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)), mode=jax_mode)


def blur_downsample(x, filt_size: int = 3, stride: int = 2, pad_type: str = "reflect",
                    pad_off: int = 0):
    """Antialiased downsample: pad → depthwise binomial FIR → stride.

    NHWC equivalent of reference ``Downsample`` (models/networks.py:50-74).
    One grouped ``conv_general_dilated`` — XLA maps it to a single fused
    window reduction on the VPU/MXU.
    """
    c = x.shape[-1]
    if filt_size == 1:
        if pad_off == 0:
            return x[:, ::stride, ::stride, :]
        x = _pad_2d(x, ((pad_off, pad_off), (pad_off, pad_off)), pad_type)
        return x[:, ::stride, ::stride, :]
    p0 = (filt_size - 1) // 2
    p1 = int(np.ceil((filt_size - 1) / 2.0))
    x = _pad_2d(x, ((p0 + pad_off, p1 + pad_off), (p0 + pad_off, p1 + pad_off)), pad_type)
    filt = jnp.asarray(binomial_filter_2d(filt_size), x.dtype)
    kernel = jnp.tile(filt[:, :, None, None], (1, 1, 1, c))  # HWIO, grouped
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def blur_upsample(x, filt_size: int = 4, stride: int = 2, pad_type: str = "repl"):
    """Antialiased 2x upsample: zero-insert (lhs dilation) → FIR × stride².

    NHWC equivalent of reference ``Upsample`` (models/networks.py:87-107):
    replication-pad 1, transposed FIR with stride, crop.  Expressed as an
    lhs-dilated grouped conv, which XLA lowers to one kernel.
    """
    c = x.shape[-1]
    x = _pad_2d(x, ((1, 1), (1, 1)), pad_type)
    filt = jnp.asarray(binomial_filter_2d(filt_size) * (stride ** 2), x.dtype)
    kernel = jnp.tile(filt[:, :, None, None], (1, 1, 1, c))
    # conv_transpose(pad=1+pad_size) == lhs-dilated conv with symmetric
    # padding k-1-(1+pad_size) per side
    pad_size = (filt_size - 1) // 2
    eff = filt_size - 1 - (1 + pad_size)
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1),
        padding=((eff, eff), (eff, eff)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    y = y[:, 1:, 1:, :]
    if filt_size % 2 == 0:
        y = y[:, :-1, :-1, :]
    return y


def avg_pool_3x3_s2_nopad_count(x):
    """AvgPool2d(3, stride=2, padding=1, count_include_pad=False) — the
    multiscale-D pyramid downsampler (reference models/networks.py:1670).

    Expressed as a depthwise ones-conv (fully differentiable in any dtype —
    reduce_window's generic path lacks a bf16 linearization rule) divided by
    the valid-count map, which constant-folds."""
    c = x.shape[-1]
    kern = jnp.ones((3, 3, 1, 1), x.dtype)
    sum_ = jax.lax.conv_general_dilated(
        x, jnp.tile(kern, (1, 1, 1, c)), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    cnt = jax.lax.conv_general_dilated(
        ones, kern, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return sum_ / cnt
