"""Batched patch extraction — the hot custom op of the framework.

TPU-native re-design of ``get_patch_in_input``
(reference models/model_utils.py:72-405).  The reference builds a K×C×C×3
meshgrid of (batch, y, x) indices, clamps them to the image, and does one
giant advanced-indexing gather on a K-times-repeated copy of the image.  Here:

  * shapes are static: K (number of patches) and the cutout size are
    compile-time constants; validity is expressed with a mask, never a
    dynamic shape;
  * ``mode='gather'`` reproduces the reference's per-pixel index clamp
    exactly (out-of-bounds windows replicate edge pixels);
  * ``mode='slice'`` uses a vmapped ``dynamic_slice`` (whole-window shift at
    the boundary) — cheaper on TPU, identical for in-bounds windows, which is
    the only case the data pipeline produces;
  * random "more fake T" sampling inside the dilated object mask
    (reference model_utils.py:203-226) is reformulated rejection-free:
    CDF inversion over the flattened mask weights.

All functions take NHWC images and are jit/vjp-safe (gradients flow to the
image via scatter-add in the gather transpose).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def patch_offsets_jnp(coords: jnp.ndarray, scale_multiplier: int = 1):
    """Device-side mirror of data.coords.patch_offsets (coords (K, 8))."""
    rr = coords[..., 5]
    off_x = jnp.round((coords[..., 0] + coords[..., 6] / rr) * scale_multiplier).astype(jnp.int32)
    off_y = jnp.round((coords[..., 1] + coords[..., 7] / rr) * scale_multiplier).astype(jnp.int32)
    cutout = jnp.round(coords[..., 4] / rr * scale_multiplier).astype(jnp.int32)
    return off_x, off_y, cutout


def gather_patches(
    image: jnp.ndarray,
    offset_x: jnp.ndarray,
    offset_y: jnp.ndarray,
    cutout: int,
    mode: str = "gather",
) -> jnp.ndarray:
    """Extract K cutout×cutout patches from a single image (1, H, W, C) or
    (H, W, C); offsets are (K,) int32 top-left corners.  Returns
    (K, cutout, cutout, C)."""
    if image.ndim == 4:
        assert image.shape[0] == 1, "gather_patches expects a single image"
        image = image[0]
    h, w, _ = image.shape
    if mode == "slice":
        ox = jnp.clip(offset_x, 0, w - cutout)
        oy = jnp.clip(offset_y, 0, h - cutout)

        def one(oyi, oxi):
            return jax.lax.dynamic_slice(image, (oyi, oxi, 0), (cutout, cutout, image.shape[-1]))

        return jax.vmap(one)(oy, ox)
    if mode == "gather":
        ar = jnp.arange(cutout, dtype=jnp.int32)
        idx_y = jnp.clip(offset_y[:, None] + ar[None, :], 0, h - 1)  # (K, C)
        idx_x = jnp.clip(offset_x[:, None] + ar[None, :], 0, w - 1)
        # (K, cut, cut, C) two-level take: rows then columns
        rows = image[idx_y]                      # (K, cut, W, C)
        out = jnp.take_along_axis(rows, idx_x[:, None, :, None], axis=2)
        return out
    raise NotImplementedError(mode)


def gather_patches_from_coords(
    image: jnp.ndarray,
    coords: jnp.ndarray,
    patch_size: int = 32,
    scale_multiplier: int = 1,
    mode: str = "gather",
) -> jnp.ndarray:
    """get_patch_in_input with predefined coordinates.

    The cutout size is static = patch_size*scale_multiplier; the reference's
    dynamic ``cutout_size`` is constant in every shipped config
    (reference model_utils.py:60-64 — "should be a constant").  When the data
    pipeline produces resize_ratio != 1, the host is responsible for baking
    the ratio into the patch (the shipped pipelines always have ratio 1).

    Batched form: image (N, H, W, C) with coords (N, K, 8) vmaps per sample
    and returns (N·K, cut, cut, C) — folded to align with the static patch
    stacks (something the reference cannot do: its ragged patches forced
    batch_size=1, sinskitG_model.py:351).
    """
    if coords.ndim == 3 and image.ndim == 4 and image.shape[0] == coords.shape[0] \
            and image.shape[0] > 1:
        per = jax.vmap(lambda img, c: gather_patches_from_coords(
            img, c, patch_size, scale_multiplier, mode))(image, coords)
        return per.reshape((-1,) + per.shape[2:])
    if coords.ndim == 3:
        coords = coords.reshape(-1, coords.shape[-1])
    off_x, off_y, _ = patch_offsets_jnp(coords, scale_multiplier)
    return gather_patches(image, off_x, off_y, patch_size * scale_multiplier, mode=mode)


def _box_sum_last(x: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """'same' correlation with ones(kernel) along the LAST axis via a
    prefix-sum difference: out[i] = P[i+p] - P[i-p-1] with zero padding.
    Exact (integer arithmetic in fp) for 0/1 masks; avoids the 1-channel
    convolution whose TPU layout pads the lane dim 128× (a ×4-tactile
    6144² mask conv intermediate would be 19.3 GB physical for 151 MB
    logical — measured compile OOM)."""
    assert kernel % 2 == 1, "box filter expects an odd kernel"
    p = kernel // 2
    n = x.shape[-1]
    cs = jnp.cumsum(x, axis=-1)
    hi = cs[..., jnp.clip(jnp.arange(n) + p, 0, n - 1)]
    lo_idx = jnp.arange(n) - p - 1
    lo = jnp.where(lo_idx >= 0, cs[..., jnp.clip(lo_idx, 0, n - 1)], 0)
    return hi - lo


def dilate_mask(mask: jnp.ndarray, kernel: int = 17) -> jnp.ndarray:
    """clamp(conv(M, ones(k,k)), 0, 1) — grows the object mask so D2's extra
    fake patches come from on/near-garment area (reference
    model_utils.py:210-215; note the reference comment says "erode" but the
    ones-kernel conv + clamp is a dilation).

    Implemented as two separable prefix-sum box filters on the raw (H, W)
    spatial dims — identical support/values to the ones-kernel conv for 0/1
    masks, without materializing 1-channel NHWC conv tensors (which TPU
    layouts pad to 128 lanes; see _box_sum_last)."""
    if mask.ndim == 2:          # (H, W)
        m = mask
    elif mask.ndim == 3:        # (H, W, C) → (C, H, W)
        m = jnp.moveaxis(mask, -1, 0)
    elif mask.ndim == 4:        # (N, H, W, C) → (N, C, H, W)
        m = jnp.moveaxis(mask, -1, 1)
    else:
        raise ValueError(f"dilate_mask: unsupported rank {mask.ndim}")
    out = _box_sum_last(jnp.swapaxes(m, -1, -2), kernel)   # vertical pass
    out = _box_sum_last(jnp.swapaxes(out, -1, -2), kernel)  # horizontal pass
    out = jnp.clip(out, 0.0, 1.0)
    if mask.ndim == 3:
        out = jnp.moveaxis(out, 0, -1)
    elif mask.ndim == 4:
        out = jnp.moveaxis(out, 1, -1)
    return out


def sample_offsets_in_mask(
    rng: jax.Array,
    mask: jnp.ndarray,
    k: int,
    patch_size: int,
    dilate: int = 17,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample K patch top-left corners with probability ∝ dilated mask.

    Rejection-free reformulation of the reference's host-side
    ``torch.nonzero`` + ``random.sample`` (model_utils.py:216-226): build the
    CDF of the flattened dilated mask (zeroed where the window would overflow)
    and invert K uniforms with a vectorized searchsorted.
    """
    m = mask
    if m.ndim == 4:
        m = m[0, ..., 0]
    elif m.ndim == 3:
        m = m[..., 0]
    h, w = m.shape
    dm = dilate_mask(m, dilate)
    # forbid windows that would overflow the image
    valid = jnp.zeros_like(dm).at[: h - patch_size + 1, : w - patch_size + 1].set(1.0)
    weights = dm * valid
    # exact two-stage inversion: sample the row from the row-sum CDF, then the
    # column within that row — O(H + K·W) instead of a full H·W cumsum
    row_sums = jnp.sum(weights, axis=1)
    row_cdf = jnp.cumsum(row_sums)
    k_row, k_col = jax.random.split(rng)
    u_row = jax.random.uniform(k_row, (k,)) * row_cdf[-1]
    rows = jnp.clip(jnp.searchsorted(row_cdf, u_row, side="right"), 0, h - 1)
    row_w = weights[rows]                       # (K, W)
    col_cdf = jnp.cumsum(row_w, axis=1)
    u_col = jax.random.uniform(k_col, (k,)) * col_cdf[:, -1]
    cols = jnp.clip(
        jax.vmap(lambda c, u: jnp.searchsorted(c, u, side="right"))(col_cdf, u_col),
        0, w - 1)
    return cols.astype(jnp.int32), rows.astype(jnp.int32)


def sample_patches_in_mask(
    rng: jax.Array,
    image: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
    patch_size: int,
    scale_multiplier: int = 1,
    dilate: int = 17,
    mode: str = "gather",
):
    """Random 'more fake T' patch stack + the offsets used (visual-res units),
    mirroring get_patch_in_input(coords=None) (reference model_utils.py:137-405)."""
    cut = patch_size * scale_multiplier
    off_x, off_y = sample_offsets_in_mask(rng, mask, k, cut, dilate)
    patches = gather_patches(image, off_x, off_y, cut, mode=mode)
    return patches, off_x // scale_multiplier, off_y // scale_multiplier
