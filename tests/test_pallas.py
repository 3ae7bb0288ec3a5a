"""Pallas kernel parity (interpret mode — CPU-safe)."""

import jax
import jax.numpy as jnp
import numpy as np

from vts_tpu.ops.pallas_gather import gather_patches_pallas
from vts_tpu.ops.patch import gather_patches


def test_pallas_gather_matches_xla_slice():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(128, 128, 5)).astype(np.float32))
    ox = jnp.asarray(np.array([0, 10, 60, 96], np.int32))
    oy = jnp.asarray(np.array([5, 0, 20, 90], np.int32))
    a = gather_patches_pallas(img, ox, oy, 32, interpret=True)
    b = gather_patches(img, ox, oy, 32, mode="slice")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_pallas_gather_clamps_oob():
    img = jnp.arange(16.0 * 16 * 2).reshape(16, 16, 2)
    a = gather_patches_pallas(img, jnp.array([100], jnp.int32),
                              jnp.array([100], jnp.int32), 8, interpret=True)
    b = gather_patches(img, jnp.array([100], jnp.int32),
                       jnp.array([100], jnp.int32), 8, mode="slice")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
