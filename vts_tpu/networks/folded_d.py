"""Space-to-depth folded MultiscaleDiscriminator forward — D-stack layout escape.

Round-3 traces show that after folding the generator (folded.py) the no-LPIPS
step's remaining ~108 ms is dominated by the D1 canvas pyramid: NLayer
PatchGAN heads over 1536²/768²/384² inputs with 4-64 channels, every
intermediate lane-padded 2-32×.  This module runs the same discriminators on
folded tensors — (N, H/b, W/b, b²C) — so the big intermediates carry 64-256
lanes.  Three exact-equivalence obstacles distinguish it from the generator
fold and are handled here:

  * the PatchGAN convs pad 2 (reference models/networks.py:1696-1750), so a
    4×4/s2/p2 conv maps size H → H//2+1 — odd sizes that don't tile the fold
    grid.  Folded levels carry a partially-garbage tail block; garbage
    positions are zero-masked after every conv/norm, which reproduces the
    real conv's zero padding exactly for all downstream taps;
  * BatchNorm statistics must reduce over the VALID positions only: folded
    levels with a garbage tail use masked sums divided by the static valid
    count — the identical reduction set (and fp32 one-pass clamped-variance
    numerics) as flax nn.BatchNorm;
  * the multiscale pyramid's AvgPool2d(3, s2, p1, count_include_pad=False)
    (reference models/networks.py:1670) becomes a folded block conv divided
    by the constant valid-count map.

Kernel maps: a 4×4/s2/p2 conv from fold b to fold b/2 is a 3×3/s1 block conv
whose kernel scatters the original (4,4,Ci,Co) weights with tap
k = δ·b + β − 2γ + 2; the 3×3/s2/p1 pool uses k = δ·b + β − 2γ + 1.  Deep
levels (fold 1) use the standard lax forms (exactly nn.Conv's lowering).

``folded_multiscale_d_apply(params, stats, x, ...)`` ≡
``MultiscaleDiscriminator.apply(..., mutable=["batch_stats"])`` for the
logit-only configuration — pinned by tests/test_folded_d.py.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .folded import _folded_kernel
from .folded import fold as _s2d
from .folded import unfold as _d2s


# ---------------------------------------------------------------------------
# kernel index maps
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _down_map_p2(b_in: int) -> np.ndarray:
    """4×4/s2/pad-2 conv taps: K[δ+1, β, γ] = k with k = δ·b_in + β − 2γ + 2
    (output position o = G·b_out + γ reads input i = 2o − 2 + k)."""
    b_out = max(1, b_in // 2)
    m = np.full((3, b_in, b_out), 4, np.int32)
    for d in (-1, 0, 1):
        for beta in range(b_in):
            for g in range(b_out):
                k = d * b_in + beta - 2 * g + 2
                if 0 <= k < 4:
                    m[d + 1, beta, g] = k
    return m


@functools.lru_cache(maxsize=None)
def _pool_map(b_in: int) -> np.ndarray:
    """3×3/s2/pad-1 pool taps: k = δ·b_in + β − 2γ + 1 (i = 2o − 1 + k)."""
    b_out = max(1, b_in // 2)
    m = np.full((3, b_in, b_out), 4, np.int32)
    for d in (-1, 0, 1):
        for beta in range(b_in):
            for g in range(b_out):
                k = d * b_in + beta - 2 * g + 1
                if 0 <= k < 3:          # 3×3 pool: taps 0..2 only
                    m[d + 1, beta, g] = k
    return m


@functools.lru_cache(maxsize=None)
def _tail_mask(out_blocks: int, b_out: int, out_size: int) -> np.ndarray:
    """(out_blocks, out_blocks, b_out²) 0/1 mask of valid logical positions on
    the folded grid (grid = out_blocks·b_out ≥ out_size; tail is garbage)."""
    v = (np.arange(out_blocks * b_out) < out_size).astype(np.float32)
    vf = v.reshape(out_blocks, b_out)
    m = vf[:, None, :, None] * vf[None, :, None, :]
    return m.reshape(out_blocks, out_blocks, b_out * b_out)


# ---------------------------------------------------------------------------
# folded primitive ops
# ---------------------------------------------------------------------------

def _block_conv_pad(x_f, fk, bias, pad_hi: int, b_out: int, dt):
    """3×3/s1 block conv with padding ((1, pad_hi), (1, pad_hi)) — the padded
    blocks are zeros, which reproduce the original conv's pad-2 zeros (any
    tap at logical i ≥ in_size reads 0 either way)."""
    y = jax.lax.conv_general_dilated(
        x_f.astype(dt), fk.astype(dt), (1, 1),
        [(1, pad_hi), (1, pad_hi)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + jnp.tile(bias, b_out * b_out).astype(dt)
    return y


def _apply_mask(x_f, out_blocks: int, b_out: int, out_size: int):
    if out_blocks * b_out == out_size:
        return x_f
    m = jnp.asarray(_tail_mask(out_blocks, b_out, out_size), x_f.dtype)
    n, hb, wb, bc = x_f.shape
    c = bc // (b_out * b_out)
    xr = x_f.reshape(n, hb, wb, b_out * b_out, c)
    return (xr * m[None, :, :, :, None]).reshape(x_f.shape)


def folded_conv4x4_s2_p2(x_f, w, bias, b_in: int, in_size: int, dt):
    """Fold-b_in input (logical in_size, tail zero-masked) → fold-b_in/2
    output of the 4×4/s2/pad-2 conv, tail re-masked.  Returns (y, out_size)."""
    out_size = in_size // 2 + 1
    if b_in == 1:
        y = jax.lax.conv_general_dilated(
            x_f.astype(dt), w.astype(dt), (2, 2), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            y = y + bias.astype(dt)
        return y, out_size
    b_out = b_in // 2
    in_blocks = x_f.shape[1]
    out_blocks = math.ceil(out_size / b_out)
    pad_hi = out_blocks - in_blocks + 1
    fk = _folded_kernel(w, _down_map_p2(b_in))
    y = _block_conv_pad(x_f, fk, bias, pad_hi, b_out, dt)
    return _apply_mask(y, out_blocks, b_out, out_size), out_size


def conv4x4_s1_p2(x, w, bias, dt):
    y = jax.lax.conv_general_dilated(
        x.astype(dt), w.astype(dt), (1, 1), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(dt) if bias is not None else y


def folded_avg_pool_3x3_s2(x_f, b_in: int, in_size: int, channels: int, dt):
    """Folded AvgPool2d(3, s2, p1, count_include_pad=False).  Assumes the
    input tiles the fold grid exactly (even canvas sizes — true for the
    multiscale pyramid).  Returns (y, out_size)."""
    out_size = (in_size - 1) // 2 + 1
    b_out = max(1, b_in // 2)
    in_blocks = x_f.shape[1]
    out_blocks = math.ceil(out_size / b_out)
    pad_hi = out_blocks - in_blocks + 1
    # depthwise ones kernel lifted to a block-diagonal folded kernel
    wp = np.zeros((4, 4, channels, channels), np.float32)
    wp[:3, :3, np.arange(channels), np.arange(channels)] = 1.0
    fk = _folded_kernel(jnp.asarray(wp), _pool_map(b_in))
    y = _block_conv_pad(x_f, fk, None, pad_hi, b_out, dt)
    ones = jnp.ones((1, in_blocks, in_blocks, b_in * b_in), dt)
    fk1 = _folded_kernel(jnp.asarray(wp[:, :, :1, :1]), _pool_map(b_in))
    cnt = _block_conv_pad(ones, fk1, None, pad_hi, b_out, dt)
    n, hb, wb, _ = y.shape
    yr = y.reshape(n, hb, wb, b_out * b_out, channels)
    yr = yr / cnt.reshape(1, hb, wb, b_out * b_out, 1)
    return yr.reshape(n, hb, wb, b_out * b_out * channels), out_size


def folded_batch_norm(x_f, bn_params, bn_stats, b: int, out_size: int,
                      *, momentum: float = 0.9, eps: float = 1e-5,
                      dtype=None) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """flax nn.BatchNorm (train mode) on a folded tensor, reducing over the
    VALID logical positions only: fp32 one-pass stats (clamped fast variance),
    running-average update, affine, output cast — then tail re-masked."""
    n, hb, wb, bc = x_f.shape
    bb = b * b
    c = bc // bb
    grid = hb * b
    xr = x_f.reshape(n, hb, wb, bb, c).astype(jnp.float32)
    if grid != out_size:
        m = jnp.asarray(_tail_mask(hb, b, out_size), jnp.float32)
        xr = xr * m[None, :, :, :, None]
        n_valid = n * out_size * out_size
        mean = jnp.sum(xr, axis=(0, 1, 2, 3)) / n_valid
        mean2 = jnp.sum(jnp.square(xr), axis=(0, 1, 2, 3)) / n_valid
    else:
        mean = jnp.mean(xr, axis=(0, 1, 2, 3))
        mean2 = jnp.mean(jnp.square(xr), axis=(0, 1, 2, 3))
    var = jnp.maximum(0.0, mean2 - jnp.square(mean))
    scale = bn_params["scale"].astype(jnp.float32)
    bias = bn_params["bias"].astype(jnp.float32)
    mul = jax.lax.rsqrt(var + eps) * scale
    y = (xr - mean) * mul + bias
    if grid != out_size:
        y = y * m[None, :, :, :, None]
    out_dt = dtype or jnp.promote_types(x_f.dtype, jnp.float32)
    new_stats = {
        "mean": momentum * bn_stats["mean"] + (1.0 - momentum) * mean,
        "var": momentum * bn_stats["var"] + (1.0 - momentum) * var,
    }
    return y.reshape(n, hb, wb, bc).astype(out_dt), new_stats


def batch_norm_std(x, bn_params, bn_stats, *, momentum: float = 0.9,
                   eps: float = 1e-5, dtype=None):
    """flax nn.BatchNorm (train mode) on an unfolded tensor — identical
    numerics, used for the fold-1 levels."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(0, 1, 2))
    var = jnp.maximum(0.0, jnp.mean(jnp.square(x32), axis=(0, 1, 2))
                      - jnp.square(mean))
    scale = bn_params["scale"].astype(jnp.float32)
    bias = bn_params["bias"].astype(jnp.float32)
    y = (x32 - mean) * (jax.lax.rsqrt(var + eps) * scale) + bias
    out_dt = dtype or jnp.promote_types(x.dtype, jnp.float32)
    new_stats = {
        "mean": momentum * bn_stats["mean"] + (1.0 - momentum) * mean,
        "var": momentum * bn_stats["var"] + (1.0 - momentum) * var,
    }
    return y.astype(out_dt), new_stats


# ---------------------------------------------------------------------------
# the folded NLayer head + multiscale driver
# ---------------------------------------------------------------------------

def folded_nlayer_apply(params, stats, x_f, *, fold_b: int, in_size: int,
                        n_layers: int, use_sigmoid: bool = False,
                        dtype=None) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """One NLayerDiscriminator (discriminators.py:34, reference
    models/networks.py:1696-1750) on a fold-``fold_b`` input.  Returns the
    UNFOLDED logit map and the updated batch_stats subtree."""
    dt = dtype or x_f.dtype

    def conv_w(i):
        p = params[f"Conv4x4_{i}"]["Conv_0"]
        return p["kernel"], p.get("bias")

    new_stats: Dict[str, Any] = {}
    h, b, size = x_f, fold_b, in_size
    bn_idx = 0

    def maybe_bn(h, b, size):
        nonlocal bn_idx
        name = f"BatchNorm_{bn_idx}"
        if b > 1:
            h, ns = folded_batch_norm(h, params[name], stats[name], b, size,
                                      dtype=dtype)
        else:
            h, ns = batch_norm_std(h, params[name], stats[name], dtype=dtype)
        new_stats[name] = ns
        bn_idx += 1
        return h

    # stride-2 stack: conv (no norm) + lrelu, then (n_layers-1) × conv+BN+lrelu
    for li in range(n_layers):
        w, bias = conv_w(li)
        h, size = folded_conv4x4_s2_p2(h, w, bias, b, size, dt)
        b = max(1, b // 2)
        if li > 0:
            h = maybe_bn(h, b, size)
        h = jax.nn.leaky_relu(h, 0.2)

    if b > 1:   # unfold for the stride-1 tail (grid may exceed size: crop)
        c = h.shape[-1] // (b * b)
        h = _d2s(h, b, c)[:, :size, :size, :]
        b = 1

    # stride-1 conv + BN + lrelu, then the 1-logit conv
    w, bias = conv_w(n_layers)
    h = conv4x4_s1_p2(h, w, bias, dt)
    h = maybe_bn(h, 1, h.shape[1])
    h = jax.nn.leaky_relu(h, 0.2)
    w, bias = conv_w(n_layers + 1)
    h = conv4x4_s1_p2(h, w, bias, dt)
    if use_sigmoid:
        h = jax.nn.sigmoid(h)
    return h, new_stats


def folded_multiscale_d_apply(params, stats, x, *, fold: int, n_layers: int = 3,
                              num_D: int = 3, use_sigmoid: bool = False,
                              dtype=None
                              ) -> Tuple[List[List[jnp.ndarray]], Dict[str, Any]]:
    """MultiscaleDiscriminator forward (logit-only) on folded canvases.

    ``params``/``stats``: the standard flax trees.  Output matches
    ``MultiscaleDiscriminator.__call__`` with get_interm_feat=False: a list
    over scales (full-res head ``scale{num_D-1}`` first) of 1-element lists
    holding the logit map, plus the updated batch_stats tree.
    """
    n, h_sz, w_sz, c = x.shape
    assert h_sz == w_sz, "folded D assumes square canvases"
    dt = dtype or x.dtype
    b = fold
    size = h_sz
    h_f = _s2d(x.astype(dt), b)
    results: List[List[jnp.ndarray]] = []
    new_stats: Dict[str, Any] = {}
    for i in range(num_D):
        name = f"scale{num_D - 1 - i}"
        logit, ns = folded_nlayer_apply(
            params[name], stats.get(name, {}), h_f, fold_b=b, in_size=size,
            n_layers=n_layers, use_sigmoid=use_sigmoid, dtype=dtype)
        results.append([logit])
        new_stats[name] = ns
        if i != num_D - 1:
            h_f, size = folded_avg_pool_3x3_s2(h_f, b, size, c, dt)
            b = max(1, b // 2)
    return results, new_stats


def folded_d_eligible(opt, fold: int, in_size: int) -> bool:
    """The folded path covers the flagship D1 configuration: multiscale heads,
    batch norm, no intermediate-feature output, canvas tiling the fold grid
    at every pyramid scale."""
    if fold <= 1 or getattr(opt, "netD", "") != "multiscale":
        return False
    if getattr(opt, "normD", "batch") != "batch":
        return False
    if bool(getattr(opt, "getIntermFeat_D", False)):
        return False
    num_d = int(getattr(opt, "num_D_D1", 3))
    size, b = in_size, fold
    for _ in range(num_d - 1):
        if size % 2 or b < 2 or size % b:
            return False
        size, b = size // 2, b // 2
    return size % max(b, 1) == 0
