"""Tactile-patch FID: 3×3 im2col crops of 2-channel patches → Fréchet
distance (reference models/tactile_patch_fid.py:12-154)."""

from __future__ import annotations

import numpy as np

from .frechet import frechet_distance, gaussian_stats


def im2col_3x3(patch: np.ndarray) -> np.ndarray:
    """(H, W, C) → (num_windows, C*9) feature rows: every 3×3 window,
    channels-major within a row (matching the reference's channel-first
    take-order, tactile_patch_fid.py:88-100)."""
    h, w, c = patch.shape
    im = np.transpose(patch, (2, 0, 1))  # (C, H, W)
    cols = []
    for ci in range(c):
        for dy in range(3):
            for dx in range(3):
                cols.append(im[ci, dy : dy + h - 2, dx : dx + w - 2].reshape(-1))
    return np.stack(cols, axis=1)  # (windows, C*9)


def tactile_patch_fid(real: np.ndarray, fake: np.ndarray, reduction: str = "none") -> float:
    """real/fake: (N, H, W, C) tactile patch stacks.

    reduction 'none': pool all windows of all patches into one Gaussian per
    group; 'mean': per-pair FID averaged (reference tactile_patch_fid.py:120-154).
    """
    real = np.asarray(real, np.float64)
    fake = np.asarray(fake, np.float64)
    if reduction == "none":
        f1 = np.concatenate([im2col_3x3(p) for p in real], axis=0)
        f2 = np.concatenate([im2col_3x3(p) for p in fake], axis=0)
        return frechet_distance(*gaussian_stats(f1), *gaussian_stats(f2))
    if reduction == "mean":
        assert len(real) == len(fake)
        vals = [
            frechet_distance(*gaussian_stats(im2col_3x3(r)), *gaussian_stats(im2col_3x3(f)))
            for r, f in zip(real, fake)
        ]
        return float(np.mean(vals))
    raise NotImplementedError(reduction)
