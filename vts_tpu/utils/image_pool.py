"""Fake-image history buffer (reference util/image_pool.py:10-61).

Classic 50%-swap pool for discriminator updates (``--pool_size``).  Host-side
numpy buffer; returns device-puttable arrays.  The shipped SKIT configs use
pool_size=0 (pass-through), but the component is part of the framework API.
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
