"""Image resizing with the interpolation conventions the losses/metrics need.

The reference leans on ``F.interpolate`` in three flavors:
  * bicubic + antialias + align_corners=False for patch/image rescales in the
    D2 pipeline (reference models/sinskitG_model.py:1440-1487),
  * default (nearest) for the tactile mask M_T (sinskitG_model.py:724-726),
  * bilinear(ish) plain resize for metric preprocessing at 224/299
    (model_utils.py:520-551 — F.interpolate default nearest there too).

``jax.image.resize`` provides cubic/linear with antialiasing; values agree
with torch to interpolation-kernel tolerance (torch's bicubic A=-0.75 vs
Keys cubic A=-0.5), which is below metric noise — documented here rather
than silently different.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bicubic(x: jnp.ndarray, size, antialias: bool = True) -> jnp.ndarray:
    """NHWC (or HWC) resize to (h, w) with cubic kernel."""
    h, w = size
    if x.ndim == 4:
        shape = (x.shape[0], h, w, x.shape[3])
    else:
        shape = (h, w, x.shape[-1])
    return jax.image.resize(x, shape, method="cubic", antialias=antialias)


def resize_bilinear(x: jnp.ndarray, size, antialias: bool = True) -> jnp.ndarray:
    h, w = size
    if x.ndim == 4:
        shape = (x.shape[0], h, w, x.shape[3])
    else:
        shape = (h, w, x.shape[-1])
    return jax.image.resize(x, shape, method="linear", antialias=antialias)


def resize_nearest(x: jnp.ndarray, size) -> jnp.ndarray:
    """Nearest-neighbor resize with torch's F.interpolate('nearest') index
    convention: src = floor(dst · in/out) (asymmetric, NOT half-pixel —
    jax.image.resize's rounding differs, which shifted T_LPIPS/T_SIFID by
    ~1%; tests/test_metric_parity.py pins this)."""
    h, w = size
    in_h = x.shape[-3]
    in_w = x.shape[-2]
    iy = jnp.minimum(jnp.floor(jnp.arange(h) * (in_h / h)).astype(jnp.int32), in_h - 1)
    ix = jnp.minimum(jnp.floor(jnp.arange(w) * (in_w / w)).astype(jnp.int32), in_w - 1)
    if x.ndim == 4:
        return x[:, iy][:, :, ix]
    return x[iy][:, ix]
