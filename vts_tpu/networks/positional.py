"""2D positional encodings (pure functions of (h, w)).

Equivalents of the reference's SPE2d / CSG modules
(reference thirdparty/mmgeneration/positional_encoding.py:13-205), returned
NHWC.  These are deterministic functions of the spatial size, so under jit
they fold into constants.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def sinusoidal_embedding_table(num_positions: int, dim: int, div_half_dim: bool = False) -> jnp.ndarray:
    """Rows 0..num_positions-1 of the SPE table; row 0 (padding idx) is zero.

    Matches reference positional_encoding.py:53-81: for half_dim = dim/2,
    freq_i = exp(-i * log(1e4) / (half_dim - 1)) (or /half_dim), and
    emb[p] = [sin(p f_0.. p f_{h-1}), cos(p f_0 .. p f_{h-1})].
    """
    assert dim % 2 == 0, "embedding_dim must be divisible by 2"
    half = dim // 2
    denom = half if div_half_dim else max(half - 1, 1)
    freqs = np.exp(np.arange(half, dtype=np.float64) * -(np.log(1e4) / denom))
    pos = np.arange(num_positions, dtype=np.float64)[:, None] * freqs[None, :]
    table = np.concatenate([np.sin(pos), np.cos(pos)], axis=1)
    table[0, :] = 0.0  # padding index
    return jnp.asarray(table, jnp.float32)


def spe_grid(h: int, w: int, dim: int = 4, center_shift: int | None = None) -> jnp.ndarray:
    """SPE2d grid, shape (h, w, 2*dim): x-axis embeddings tiled over rows then
    y-axis embeddings tiled over columns, concatenated on channels
    (reference positional_encoding.py:113-159; channel order [x_emb, y_emb])."""
    h_shift = w_shift = 0
    if center_shift is not None:
        h_center = h // 2 if h % 2 == 0 else h // 2 + 1
        w_center = w // 2 if w % 2 == 0 else w // 2 + 1
        h_shift = center_shift - h_center
        w_shift = center_shift - w_center
    n = max(h + h_shift, w + w_shift) + 1
    table = sinusoidal_embedding_table(n + 1, dim)
    x_emb = table[1 + w_shift : 1 + w_shift + w]  # (w, dim)
    y_emb = table[1 + h_shift : 1 + h_shift + h]  # (h, dim)
    x_grid = jnp.broadcast_to(x_emb[None, :, :], (h, w, dim))
    y_grid = jnp.broadcast_to(y_emb[:, None, :], (h, w, dim))
    return jnp.concatenate([x_grid, y_grid], axis=-1)


def csg_grid(h: int, w: int) -> jnp.ndarray:
    """Cartesian grid in [-1, 1], shape (h, w, 2), channels (x, y)
    (reference positional_encoding.py:177-205)."""
    ys = jnp.linspace(-1.0, 1.0, h) if h > 1 else jnp.zeros((1,))
    xs = jnp.linspace(-1.0, 1.0, w) if w > 1 else jnp.zeros((1,))
    gx = jnp.broadcast_to(xs[None, :], (h, w))
    gy = jnp.broadcast_to(ys[:, None], (h, w))
    return jnp.stack([gx, gy], axis=-1)


def positional_encoding(h: int, w: int, mode: str = "spe", dim: int = 4,
                        batch: int = 1) -> jnp.ndarray:
    """(batch, h, w, C) encoding; C = 2*dim for spe, 2 for csg."""
    if mode == "spe":
        g = spe_grid(h, w, dim)
    elif mode == "csg":
        g = csg_grid(h, w)
    else:
        raise NotImplementedError(f"positional encoding mode {mode!r}")
    return jnp.broadcast_to(g[None], (batch, *g.shape))
