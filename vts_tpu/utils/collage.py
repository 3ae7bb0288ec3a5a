"""Patch collages and bounding-box overlays for the HTML galleries.

Numpy re-design of the reference's additional visuals
(models/sinskitG_model.py:809-1266 / models/model_utils.py:564-912): tile the
sampled S/I/T patch stacks into one grid image, and draw the sampled-patch
rectangles (red=train, green=val/ROI) onto the generated images — without a
cv2/matplotlib dependency.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .image import tensor2im


def draw_rect(img: np.ndarray, x0: int, y0: int, w: int, h: int,
              color=(255, 0, 0), thickness: int = 2) -> np.ndarray:
    """In-place rectangle outline on an (H, W, 3) uint8 image."""
    hh, ww = img.shape[:2]
    x0c, y0c = max(0, x0), max(0, y0)
    x1, y1 = min(ww, x0 + w), min(hh, y0 + h)
    c = np.asarray(color, img.dtype)
    t = thickness
    img[y0c:min(y0c + t, hh), x0c:x1] = c
    img[max(0, y1 - t):y1, x0c:x1] = c
    img[y0c:y1, x0c:min(x0c + t, ww)] = c
    img[y0c:y1, max(0, x1 - t):x1] = c
    return img


def bbox_overlay(image, offsets_x, offsets_y, sizes, color=(255, 0, 0)) -> np.ndarray:
    """Generated image + rectangles at patch locations (the reference's
    ``{phase}_I_bb`` / ``{phase}_gx_bb`` visuals)."""
    img = tensor2im(image).copy()
    sizes = np.broadcast_to(np.asarray(sizes), np.asarray(offsets_x).shape)
    for x, y, s in zip(np.asarray(offsets_x), np.asarray(offsets_y), sizes):
        draw_rect(img, int(x), int(y), int(s), int(s), color)
    return img


def patch_collage(patches: np.ndarray, cols: Optional[int] = None,
                  pad: int = 2, pad_value: int = 255,
                  valid: Optional[np.ndarray] = None) -> np.ndarray:
    """(K, h, w, C) patch stack → one tiled uint8 image."""
    p = np.asarray(patches)
    if valid is not None:
        p = p[np.asarray(valid) > 0]
    if p.size == 0:
        return np.full((8, 8, 3), pad_value, np.uint8)
    k = p.shape[0]
    cols = cols or int(np.ceil(np.sqrt(k)))
    rows = int(np.ceil(k / cols))
    tiles = [tensor2im(p[i]) for i in range(k)]
    h, w = tiles[0].shape[:2]
    out = np.full((rows * (h + pad) - pad, cols * (w + pad) - pad, 3),
                  pad_value, np.uint8)
    for i, tile in enumerate(tiles):
        r, c = divmod(i, cols)
        out[r * (h + pad): r * (h + pad) + h, c * (w + pad): c * (w + pad) + w] = tile
    return out


def sim_patch_rows(stacks: Sequence[np.ndarray], pad: int = 2) -> np.ndarray:
    """Stack aligned patch collections (e.g. S, I, real_gx, fake_gx) as rows
    of one comparison figure — the reference's train/val patch panels."""
    rows = [patch_collage(s, cols=len(np.asarray(s))) for s in stacks]
    w = max(r.shape[1] for r in rows)
    rows = [np.pad(r, ((0, 0), (0, w - r.shape[1]), (0, 0)), constant_values=255)
            for r in rows]
    gap = np.full((pad, w, 3), 255, np.uint8)
    out = rows[0]
    for r in rows[1:]:
        out = np.concatenate([out, gap, r], axis=0)
    return out
