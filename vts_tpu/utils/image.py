"""Array↔image utilities (reference util/util.py:22-165), NHWC.

``tensor2im`` maps a [-1,1] float array to uint8 RGB; single-channel inputs
are tiled to gray RGB (the reference applies a colormap for some visuals —
kept simple and gray here, colormaps are a presentation choice)."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def tensor2im(arr, imtype=np.uint8) -> np.ndarray:
    """(N,H,W,C)|(H,W,C)|(H,W) float in [-1,1] → (H,W,3) uint8."""
    a = np.asarray(arr)
    if a.ndim == 4:
        a = a[0]
    if a.ndim == 2:
        a = a[:, :, None]
    if a.dtype in (np.uint8,):
        return a
    a = (np.clip(a.astype(np.float64), -1, 1) + 1) / 2.0 * 255.0
    if a.shape[-1] == 1:
        a = np.tile(a, (1, 1, 3))
    return a.astype(imtype)


def tensor2arr(arr) -> np.ndarray:
    """Raw float values, squeezed (reference util.py:95-122)."""
    return np.squeeze(np.asarray(arr))


def save_image(image_numpy: np.ndarray, image_path: str,
               aspect_ratio: float = 1.0) -> None:
    pil = Image.fromarray(image_numpy)
    h, w = image_numpy.shape[:2]
    if aspect_ratio > 1.0:
        pil = pil.resize((int(w * aspect_ratio), h), Image.BICUBIC)
    if aspect_ratio < 1.0:
        pil = pil.resize((w, int(h / aspect_ratio)), Image.BICUBIC)
    os.makedirs(os.path.dirname(image_path) or ".", exist_ok=True)
    pil.save(image_path)


def mkdirs(paths) -> None:
    if isinstance(paths, (list, tuple)):
        for p in paths:
            os.makedirs(p, exist_ok=True)
    else:
        os.makedirs(paths, exist_ok=True)
