"""The CycleGAN-heritage transform pipeline (reference data/base_dataset.py:83-380).

``get_params(opt, size)`` + ``apply_transform(opt, img, params)`` reproduce
the reference's composable preprocess chains — resize / scale_width /
make-power-2 / zoom / crop / patch / trim / flip / normalize — as pure
functions over PIL images returning float32 NHWC arrays.  Used by the legacy
datasets (single / singleimage / unaligned / template); the SKIT pipelines
use the coordinate-propagating variants in :mod:`vts_tpu.data.transforms`.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
from PIL import Image

from .transforms import to_array

LANCZOS = Image.LANCZOS
BICUBIC = Image.BICUBIC


def get_params(opt, size: Tuple[int, int],
               rng: Optional[np.random.Generator] = None) -> Dict:
    """Random parameters shared across paired images (base_dataset.py:60-81)."""
    rng = rng or np.random.default_rng()
    w, h = size
    new_h, new_w = h, w
    if opt.preprocess == "resize_and_crop":
        new_h = new_w = opt.load_size
    elif opt.preprocess == "scale_width_and_crop":
        new_w = opt.load_size
        new_h = opt.load_size * h // w
    x = int(rng.integers(0, max(0, new_w - opt.crop_size) + 1))
    y = int(rng.integers(0, max(0, new_h - opt.crop_size) + 1))
    flip = bool(rng.uniform() > 0.5)
    return {"crop_pos": (x, y), "flip": flip,
            "scale_factor": float(rng.uniform(1.0 / getattr(opt, "random_scale_max", 3.0), 1.0))}


def _make_power_2(img, base, method=BICUBIC):
    ow, oh = img.size
    h = int(round(oh / base) * base)
    w = int(round(ow / base) * base)
    if h == oh and w == ow:
        return img
    return img.resize((w, h), method)


def _scale_width(img, target, crop, method=BICUBIC):
    ow, oh = img.size
    if ow == target and oh >= crop:
        return img
    w = target
    h = int(max(target * oh / ow, crop))
    return img.resize((w, h), method)


def apply_transform(opt, img: Image.Image, params: Optional[Dict] = None,
                    grayscale: bool = False, method=BICUBIC,
                    normalize: bool = True) -> np.ndarray:
    """Apply the preprocess chain named by ``opt.preprocess``; returns HWC
    float32 (normalized to [-1,1] when requested)."""
    if grayscale and img.mode != "L":
        img = img.convert("L")
    p = opt.preprocess
    if "resize" in p:
        img = img.resize((opt.load_size, opt.load_size), method)
    elif "scale_width" in p:
        img = _scale_width(img, opt.load_size, opt.crop_size, method)
    if "zoom" in p and params is not None:
        sf = params["scale_factor"]
        img = img.resize((int(round(img.size[0] * sf)), int(round(img.size[1] * sf))),
                         method)
    if "crop" in p:
        if params is None:
            x = max(0, (img.size[0] - opt.crop_size) // 2)
            y = max(0, (img.size[1] - opt.crop_size) // 2)
        else:
            x, y = params["crop_pos"]
        img = img.crop((x, y, x + opt.crop_size, y + opt.crop_size))
    if p == "none" or "power" in p:
        img = _make_power_2(img, base=4, method=method)
    if not getattr(opt, "no_flip", True) and params is not None and params["flip"]:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    return to_array(img, normalize=normalize)
