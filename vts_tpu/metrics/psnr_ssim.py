"""PSNR / SSIM in JAX (NHWC, inputs in [0, 1] like the reference's
torchmetrics calls — reference models/model_utils.py:495-499)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Global-mean PSNR over the whole batch (torchmetrics default)."""
    mse = jnp.mean((x.astype(jnp.float32) - y.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel1d(size: int, sigma: float) -> np.ndarray:
    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-0.5 * (ax / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def ssim(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Mean SSIM with a gaussian window over the valid region (the
    torchmetrics/skimage formulation, gaussian_kernel=True defaults)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    c = x.shape[-1]
    k1d = _gaussian_kernel1d(kernel_size, sigma)
    k2d = np.outer(k1d, k1d)
    kernel = jnp.asarray(np.tile(k2d[:, :, None, None], (1, 1, 1, c)))

    def filt(img):
        return jax.lax.conv_general_dilated(
            img, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)

    mu_x = filt(x)
    mu_y = filt(y)
    mu_xx = filt(x * x)
    mu_yy = filt(y * y)
    mu_xy = filt(x * y)
    var_x = mu_xx - mu_x * mu_x
    var_y = mu_yy - mu_y * mu_y
    cov = mu_xy - mu_x * mu_y
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    num = (2 * mu_x * mu_y + c1) * (2 * cov + c2)
    den = (mu_x ** 2 + mu_y ** 2 + c1) * (var_x + var_y + c2)
    return jnp.mean(num / den)
