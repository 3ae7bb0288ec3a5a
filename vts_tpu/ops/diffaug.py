"""DiffAugment as pure functions of a PRNG key (NHWC).

Equivalent of the reference's vendored DiffAugment
(reference thirdparty/DiffAugment.py:9-102), policy letters:
b=brightness, s=saturation, c=contrast, t=translation, o=cutout, n=noise.
The shipped sinskitG policy is "bs" (reference models/sinskitG_model.py:269-274).

Each op draws its randomness from a split of the given key, so
``diff_augment(rng, x, "bs")`` is deterministic given the key — the JAX
replacement for torch's global RNG.  To augment real and fake with
*independent* draws (the reference calls DiffAugment twice), pass different
keys; to share draws, pass the same key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rand_brightness(rng, x):
    b = jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype) - 0.5
    return x + b


def rand_saturation(rng, x):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    s = jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype) * 2.0
    return (x - mean) * s + mean


def rand_contrast(rng, x):
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    c = jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype) + 0.5
    return (x - mean) * c + mean


def rand_translation(rng, x, ratio: float = 0.125):
    n, h, w, c = x.shape
    sh = int(h * ratio + 0.5)
    sw = int(w * ratio + 0.5)
    kh, kw = jax.random.split(rng)
    ty = jax.random.randint(kh, (n, 1), -sh, sh + 1)
    tx = jax.random.randint(kw, (n, 1), -sw, sw + 1)
    gy = jnp.clip(jnp.arange(h)[None, :] + ty + 1, 0, h + 1)   # (n, h)
    gx = jnp.clip(jnp.arange(w)[None, :] + tx + 1, 0, w + 1)   # (n, w)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    rows = xp[jnp.arange(n)[:, None], gy]                      # (n, h, W+2, c)
    gx4 = jnp.broadcast_to(gx[:, None, :, None], (n, h, w, 1))
    return jnp.take_along_axis(rows, gx4, axis=2)


def rand_cutout(rng, x, ratio: float = 0.5):
    n, h, w, c = x.shape
    ch = int(h * ratio + 0.5)
    cw = int(w * ratio + 0.5)
    ky, kx = jax.random.split(rng)
    oy = jax.random.randint(ky, (n, 1, 1), 0, h + (1 - ch % 2))
    ox = jax.random.randint(kx, (n, 1, 1), 0, w + (1 - cw % 2))
    gy = jnp.arange(h)[None, :, None]
    gx = jnp.arange(w)[None, None, :]
    in_y = (gy >= oy - ch // 2) & (gy < oy - ch // 2 + ch)
    in_x = (gx >= ox - cw // 2) & (gx < ox - cw // 2 + cw)
    mask = 1.0 - (in_y & in_x).astype(x.dtype)
    return x * mask[..., None]


def rand_noise(rng, x, noise_std: float = 0.1, noise: float = 1.0, p: float = 0.5):
    k1, k2, k3 = jax.random.split(rng, 3)
    sigma = jnp.abs(jax.random.uniform(k1, (x.shape[0], 1, 1, 1), x.dtype)) * noise_std
    gate = jax.random.uniform(k2, (x.shape[0], 1, 1, 1), x.dtype) < noise * p
    sigma = jnp.where(gate, sigma, 0.0)
    return x + sigma * jax.random.normal(k3, x.shape, x.dtype)


_AUGMENT_FNS = {
    "b": rand_brightness,
    "s": rand_saturation,
    "c": rand_contrast,
    "t": rand_translation,
    "o": rand_cutout,
    "n": rand_noise,
}


def diff_augment(rng: jax.Array, x: jnp.ndarray, policy: str = "") -> jnp.ndarray:
    if not policy:
        return x
    keys = jax.random.split(rng, len(policy))
    for key, letter in zip(keys, policy):
        x = _AUGMENT_FNS[letter](key, x)
    return x
