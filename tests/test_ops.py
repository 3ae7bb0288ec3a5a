"""Tests for the TPU compute ops against numpy oracles of the reference
semantics (reference models/model_utils.py, thirdparty/DiffAugment.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vts_tpu.ops.diffaug import diff_augment, rand_brightness, rand_cutout, rand_translation
from vts_tpu.ops.normal import compute_normal
from vts_tpu.ops.patch import (dilate_mask, gather_patches,
                               gather_patches_from_coords,
                               sample_offsets_in_mask, sample_patches_in_mask)
from vts_tpu.ops.resize import resize_bicubic, resize_nearest


def _np_reference_gather(img, ox, oy, cut):
    """Numpy oracle of the reference's clamped meshgrid gather
    (model_utils.py:253-335)."""
    h, w, c = img.shape
    out = np.zeros((len(ox), cut, cut, c), img.dtype)
    for k in range(len(ox)):
        ys = np.clip(oy[k] + np.arange(cut), 0, h - 1)
        xs = np.clip(ox[k] + np.arange(cut), 0, w - 1)
        out[k] = img[np.ix_(ys, xs)]
    return out


def test_gather_matches_reference_oracle():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(96, 96, 5)).astype(np.float32)
    ox = np.array([0, 10, 90, 60], np.int32)   # 90 overhangs → edge replication
    oy = np.array([5, 0, 20, 80], np.int32)
    out = gather_patches(jnp.asarray(img), jnp.asarray(ox), jnp.asarray(oy), 16)
    np.testing.assert_allclose(np.asarray(out), _np_reference_gather(img, ox, oy, 16))


def test_gather_modes_agree_in_bounds():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(64, 64, 3)).astype(np.float32)
    ox = np.array([0, 10, 32], np.int32)
    oy = np.array([5, 0, 20], np.int32)
    a = gather_patches(jnp.asarray(img), jnp.asarray(ox), jnp.asarray(oy), 16, mode="gather")
    b = gather_patches(jnp.asarray(img), jnp.asarray(ox), jnp.asarray(oy), 16, mode="slice")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_gather_from_coords_scale_multiplier():
    rng = np.random.default_rng(2)
    img1 = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    img2 = np.kron(img1[0], np.ones((2, 2, 1))).astype(np.float32)[None]  # 2x nearest upsample
    coords = np.array([[4.0, 6.0, 32, 32, 8, 1.0, 3, 5]], np.float32)  # off=(7,11) cut=8
    p1 = gather_patches_from_coords(jnp.asarray(img1), jnp.asarray(coords), patch_size=8)
    p2 = gather_patches_from_coords(jnp.asarray(img2), jnp.asarray(coords), patch_size=8,
                                    scale_multiplier=2)
    assert p1.shape == (1, 8, 8, 3) and p2.shape == (1, 16, 16, 3)
    # the 2x patch downsampled by 2 (nearest) equals the 1x patch
    np.testing.assert_allclose(np.asarray(p2)[:, ::2, ::2], np.asarray(p1))


def test_gather_is_differentiable():
    img = jnp.ones((32, 32, 2))
    ox = jnp.array([4], jnp.int32)
    oy = jnp.array([6], jnp.int32)

    def f(im):
        return jnp.sum(gather_patches(im, ox, oy, 8) ** 2)

    g = jax.grad(f)(img)
    # gradient lands exactly on the patch window
    assert float(jnp.sum(g[6:14, 4:12])) == pytest.approx(2.0 * 8 * 8 * 2)
    assert float(jnp.sum(g)) == pytest.approx(2.0 * 8 * 8 * 2)


def test_dilate_mask_grows_region():
    m = np.zeros((33, 33), np.float32)
    m[16, 16] = 1.0
    d = np.asarray(dilate_mask(jnp.asarray(m), kernel=17))
    assert d[16, 16] == 1.0 and d[8, 8] == 1.0 and d[16, 8] == 1.0
    assert d[0, 0] == 0.0
    assert d.max() <= 1.0


def test_dilate_mask_matches_ones_conv():
    """Prefix-sum box filter ≡ ones-kernel conv+clamp (the reference form,
    model_utils.py:210-215) on random 0/1 masks, incl. 3-D/4-D layouts."""
    rng = np.random.default_rng(3)
    for kernel in (5, 17):
        m = (rng.random((40, 52)) < 0.1).astype(np.float32)
        ref = jax.lax.conv_general_dilated(
            jnp.asarray(m)[None, ..., None],
            jnp.ones((kernel, kernel, 1, 1), jnp.float32),
            (1, 1), [(kernel // 2,) * 2] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, ..., 0]
        ref = np.clip(np.asarray(ref), 0.0, 1.0)
        np.testing.assert_allclose(np.asarray(dilate_mask(jnp.asarray(m), kernel)),
                                   ref, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(dilate_mask(jnp.asarray(m)[..., None], kernel))[..., 0],
            ref, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(dilate_mask(jnp.asarray(m)[None, ..., None], kernel))[0, ..., 0],
            ref, atol=1e-6)


def test_sample_offsets_respect_mask_and_bounds():
    m = np.zeros((64, 64), np.float32)
    m[20:40, 25:45] = 1.0
    ox, oy = sample_offsets_in_mask(jax.random.key(0), jnp.asarray(m), 64, 16, dilate=5)
    ox, oy = np.asarray(ox), np.asarray(oy)
    assert (ox >= 0).all() and (ox + 16 <= 64).all()
    assert (oy >= 0).all() and (oy + 16 <= 64).all()
    # all samples inside the dilated support (mask ± 2 for kernel 5)
    assert (ox >= 25 - 2).all() and (ox <= 44 + 2).all()
    assert (oy >= 20 - 2).all() and (oy <= 39 + 2).all()


def test_sample_patches_in_mask_shapes():
    img = jnp.ones((1, 64, 64, 2))
    m = jnp.ones((1, 64, 64, 1))
    patches, ox, oy = sample_patches_in_mask(jax.random.key(1), img, m, 8, 16)
    assert patches.shape == (8, 16, 16, 2)
    assert ox.shape == (8,)


# ---------------------------------------------------------------------------
# DiffAugment
# ---------------------------------------------------------------------------

def test_brightness_shifts_globally():
    x = jnp.zeros((4, 8, 8, 3))
    y = rand_brightness(jax.random.key(0), x)
    per_img = np.asarray(y).reshape(4, -1)
    # constant shift per image, in (-0.5, 0.5)
    assert np.allclose(per_img.std(axis=1), 0.0, atol=1e-6)
    assert (np.abs(per_img[:, 0]) < 0.5).all()
    # different images get different shifts
    assert np.std(per_img[:, 0]) > 0


def test_translation_preserves_content_up_to_shift():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 3)).astype(np.float32))
    y = rand_translation(jax.random.key(3), x)
    assert y.shape == x.shape
    # values must be a subset of original values or zeros (padding)
    orig = set(np.round(np.asarray(x).ravel(), 5).tolist()) | {0.0}
    new = set(np.round(np.asarray(y).ravel(), 5).tolist())
    assert new <= orig


def test_cutout_zeroes_half_window():
    x = jnp.ones((3, 32, 32, 3))
    y = np.asarray(rand_cutout(jax.random.key(2), x))
    frac = 1 - y.mean(axis=(1, 2, 3))
    # a 16x16 cutout clipped to the image zeroes at most 25% of pixels
    assert (frac > 0).all() and (frac <= 0.25 + 1e-6).all()


def test_diffaug_policy_deterministic():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 16, 16, 3)).astype(np.float32))
    a = diff_augment(jax.random.key(5), x, "bs")
    b = diff_augment(jax.random.key(5), x, "bs")
    c = diff_augment(jax.random.key(6), x, "bs")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    # empty policy is identity
    np.testing.assert_allclose(np.asarray(diff_augment(jax.random.key(0), x, "")), np.asarray(x))


# ---------------------------------------------------------------------------
# normal + resize
# ---------------------------------------------------------------------------

def test_compute_normal_unit_length():
    t = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8, 8, 2)).astype(np.float32))
    n = compute_normal(t, scale_nz=1.0)
    assert n.shape == (4, 8, 8, 3)
    norms = np.linalg.norm(np.asarray(n), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    # scale_nz=0 → z component zero wherever gradients nonzero
    n0 = compute_normal(t, scale_nz=0.0)
    assert np.allclose(np.asarray(n0)[..., 2], 0.0)


def test_resize_shapes():
    x = jnp.ones((2, 64, 64, 3))
    assert resize_bicubic(x, (32, 32)).shape == (2, 32, 32, 3)
    assert resize_nearest(x, (128, 128)).shape == (2, 128, 128, 3)
    # identity-size resize returns (numerically) the same image
    y = resize_bicubic(x, (64, 64))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_resize_mm_matches_jax_image_resize():
    """resize_mm must reproduce jax.image.resize (the matrices are DERIVED
    from it via identity resize, so only accumulation order differs)."""
    from vts_tpu.ops.resize_mm import resize_mm
    rng = np.random.default_rng(7)
    for method in ("linear", "cubic"):
        for antialias in (True, False):
            for in_hw, out_hw in (((192, 160), (56, 56)),   # big downsample
                                  ((48, 64), (96, 80)),     # upsample
                                  ((96, 96), (96, 48))):    # one axis only
                x = jnp.asarray(rng.normal(
                    size=(2, *in_hw, 3)).astype(np.float32))
                want = jax.image.resize(
                    x, (2, *out_hw, 3), method=method, antialias=antialias)
                got = resize_mm(x, out_hw, method=method, antialias=antialias)
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5,
                    err_msg=f"{method} antialias={antialias} "
                            f"{in_hw}->{out_hw}")


def test_resize_mm_hwc_identity_and_grad():
    from vts_tpu.ops.resize_mm import resize_mm
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(40, 40, 3)).astype(np.float32))
    # HWC rank preserved; identity size is a no-op
    assert resize_mm(x, (20, 24)).shape == (20, 24, 3)
    np.testing.assert_array_equal(np.asarray(resize_mm(x, (40, 40))),
                                  np.asarray(x))
    # differentiable under jit (the VJP is the transposed matmuls), and the
    # gradient matches jax.image.resize's to round-off
    f_mm = jax.jit(lambda a: jnp.sum(resize_mm(a, (16, 16)) ** 2))
    f_ref = jax.jit(lambda a: jnp.sum(
        jax.image.resize(a, (16, 16, 3), "linear") ** 2))
    g_mm = jax.grad(f_mm)(x)
    g_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_ref),
                               rtol=2e-5, atol=2e-5)
