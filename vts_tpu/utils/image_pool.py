"""Fake-image history buffer (reference util/image_pool.py:10-61).

Classic 50%-swap pool for discriminator updates (``--pool_size``).  Two
implementations:

* :class:`ImagePool` — host-side numpy buffer, same sequential semantics as
  the reference (insert until full, then 50% chance of swapping with a random
  historical fake per sample).
* :func:`pool_query` — the jit-side equivalent used inside the fused train
  step (pix2pixHD's D-fake pass, reference pix2pixHD_model.py:582): the
  buffer + fill count are carried as device state and updated with a
  ``lax.scan`` over the batch, so the pool lives entirely on-device.

The shipped SKIT configs use pool_size=0 (pass-through).
"""

from __future__ import annotations

import numpy as np


class ImagePool:
    def __init__(self, pool_size: int = 50, seed: int = 0):
        self.pool_size = pool_size
        self.images = []
        self.rng = np.random.default_rng(seed)

    def query(self, images) -> np.ndarray:
        """images: (N, H, W, C) batch of fakes → same-shape batch where each
        element is either the input or a swapped historical fake."""
        images = np.asarray(images)
        if self.pool_size == 0:
            return images
        out = []
        for img in images:
            if len(self.images) < self.pool_size:
                self.images.append(img.copy())
                out.append(img)
            elif self.rng.uniform() > 0.5:
                idx = int(self.rng.integers(0, self.pool_size))
                out.append(self.images[idx].copy())
                self.images[idx] = img.copy()
            else:
                out.append(img)
        return np.stack(out)


def pool_query(buf, n, images, key):
    """Jit-side pool query (sequential semantics of ImagePool.query).

    buf: (P, H, W, C) history buffer; n: int32 fill count; images: (B, H, W, C)
    current fakes; key: PRNG key.  Returns (new_buf, new_n, queried) where
    ``queried`` is the batch the discriminator should see.
    """
    import jax
    import jax.numpy as jnp

    P = buf.shape[0]

    def body(carry, x):
        b, cnt = carry
        im, k = x
        k1, k2 = jax.random.split(k)
        insert = cnt < P
        rid = jax.random.randint(k2, (), 0, P)
        swap = jax.random.uniform(k1) > 0.5
        ret = jnp.where(insert, im, jnp.where(swap, b[rid], im))
        b_ins = jax.lax.dynamic_update_index_in_dim(b, im, jnp.minimum(cnt, P - 1), 0)
        b_swap = jax.lax.dynamic_update_index_in_dim(b, im, rid, 0)
        new_b = jnp.where(insert, b_ins, jnp.where(swap, b_swap, b))
        new_cnt = jnp.where(insert, cnt + 1, cnt)
        return (new_b, new_cnt), ret

    keys = jax.random.split(key, images.shape[0])
    (buf, n), out = jax.lax.scan(body, (buf, n), (images, keys))
    return buf, n, out
