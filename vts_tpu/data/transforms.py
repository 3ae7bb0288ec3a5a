"""Host-side PIL/numpy image transforms with coordinate-mirror guarantees.

Image-space halves of the augmentation pipeline; their coordinate-space
mirrors live in :mod:`vts_tpu.data.coords` (reference data/dataset_util.py).
All functions accept/return PIL Images (loading stage) and the final
conversion emits float32 NHWC arrays — the framework's device contract.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from PIL import Image

from .coords import crop_window

LANCZOS = Image.LANCZOS


def zoom_img(img: Image.Image, scale_h: float = 1.0, scale_w: float = 1.0,
             method=LANCZOS) -> Image.Image:
    w, h = img.size
    return img.resize((int(round(w * scale_w)), int(round(h * scale_h))), method)


def crop_img(
    img: Image.Image,
    crop_h: int,
    crop_w: int,
    method=LANCZOS,
    resize_ratio: Optional[float] = None,
    crop_pos_x: Optional[int] = None,
    crop_pos_y: Optional[int] = None,
    center_w: int = 0,
    center_h: int = 0,
    center_crop: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[Image.Image, float, int, int]:
    """Resize-if-needed then crop; returns (img, resize_ratio, pos_x, pos_y).
    Reference data/dataset_util.py:184-197."""
    w, h = img.size
    if resize_ratio is None:
        resize_ratio = 1.0 if (w >= crop_w and h >= crop_h) else max(crop_w / w, crop_h / h)
    if resize_ratio != 1.0:
        img = img.resize((int(round(w * resize_ratio)), int(round(h * resize_ratio))), method)
    if crop_pos_x is None and crop_pos_y is None:
        crop_pos_x, crop_pos_y = crop_window(
            img.size[1], img.size[0], crop_h, crop_w,
            center_h=center_h, center_w=center_w, center_crop=center_crop, rng=rng)
    out = img.crop((crop_pos_x, crop_pos_y, crop_pos_x + crop_w, crop_pos_y + crop_h))
    return out, resize_ratio, crop_pos_x, crop_pos_y


def make_power_2_img(img: Image.Image, base: int, method=LANCZOS):
    """Round both sides to a multiple of base. Returns (img, ratio_w, ratio_h).
    Reference data/dataset_util.py:216-227."""
    w, h = img.size
    nh = int(round(h / base) * base)
    nw = int(round(w / base) * base)
    if nh == h and nw == w:
        return img, 1.0, 1.0
    return img.resize((nw, nh), method), nw / w, nh / h


def to_array(img: Image.Image, normalize: bool = True) -> np.ndarray:
    """PIL → float32 (H, W, C); normalize maps [0,255] → [-1,1]
    (torchvision ToTensor + Normalize(0.5, 0.5) semantics)."""
    arr = np.asarray(img, dtype=np.float32)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if normalize:
        arr *= np.float32(2.0 / 255.0)
        arr -= np.float32(1.0)
    else:
        arr *= np.float32(1.0 / 255.0)
    return arr


def variance_of_laplacian(image: np.ndarray) -> float:
    """Sharpness proxy: variance of the 4-neighbour Laplacian — the
    resampling weight for sketch patches (reference util/util.py:261-265;
    the constant-reference subtraction there does not affect the result)."""
    img = np.asarray(image, np.float64)
    if img.ndim == 3:
        img = img[..., 0]
    lap = (-4.0 * img
           + np.roll(img, 1, 0) + np.roll(img, -1, 0)
           + np.roll(img, 1, 1) + np.roll(img, -1, 1))
    # cv2.Laplacian leaves the 1px border as one-sided diffs; interior-only
    # variance is the stable, dependency-free equivalent
    return float(lap[1:-1, 1:-1].var())
