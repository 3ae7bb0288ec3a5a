"""Analytic coordinate propagation through the augmentation pipeline.

The SKIT patch economy depends on tracking, for every GelSight touch patch,
where its rectangular sensing region (ROI) lands in the visual image after
each augmentation step.  The reference implements these as loose functions
(reference data/dataset_util.py:150-239); here they are pure, unit-tested
float transforms over an ``ROI = (x, y, h, w)`` tuple, plus the patch-coordinate
codec shared with the device-side gather op.

Conventions (identical to the reference):
  * ``x`` is the horizontal (width) offset, ``y`` vertical (height);
  * zoom scales coordinates by the same per-axis factors as the image resize;
  * crop first scales by ``resize_ratio`` then subtracts the crop origin, and
    a ROI is *valid* only if it lies fully inside the crop window;
  * make-power-2 rescales each axis by ``new/old`` size ratio;
  * global padding shifts by ``(padded - org) // 2``.

The 8-tuple patch coordinate record is the stable contract between the host
data pipeline and the jitted train step::

    (ROI_x, ROI_y, ROI_h, ROI_w, patch_crop_size, resize_ratio,
     crop_pos_x, crop_pos_y)

where ``crop_pos_*`` is the patch origin inside the ROI at visual resolution
(reference data/singleskit_dataset.py:843-864) and the device-side gather
resolves it to pixel offsets via :func:`patch_offsets`
(reference models/model_utils.py:23-69).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np


class ROI(NamedTuple):
    x: float
    y: float
    h: float
    w: float


def zoom_roi(roi: ROI, scale_h: float = 1.0, scale_w: float = 1.0) -> ROI:
    """Reference dataset_util.py:150-155."""
    return ROI(roi.x * scale_w, roi.y * scale_h, roi.h * scale_h, roi.w * scale_w)


def crop_roi(
    roi: ROI,
    crop_size_h: float,
    crop_size_w: float,
    resize_ratio: float,
    crop_pos_x: float,
    crop_pos_y: float,
) -> Tuple[bool, ROI]:
    """Map a ROI through resize-then-crop; returns (valid, new_roi).

    Valid iff the ROI falls completely inside the crop window.
    Reference dataset_util.py:200-213.
    """
    x = roi.x * resize_ratio - crop_pos_x
    y = roi.y * resize_ratio - crop_pos_y
    h = roi.h * resize_ratio
    w = roi.w * resize_ratio
    valid = not (x < 0 or x + w > crop_size_w or y < 0 or y + h > crop_size_h)
    return valid, ROI(x, y, h, w)


def make_power_2_roi(roi: ROI, ratio_w: float, ratio_h: float) -> ROI:
    """Reference dataset_util.py:229-234."""
    return ROI(roi.x * ratio_w, roi.y * ratio_h, roi.h * ratio_h, roi.w * ratio_w)


def pad_roi(roi: ROI, org_w: int = 1280, org_h: int = 960, padded_size: int = 1600) -> ROI:
    """Center-pad shift. Reference dataset_util.py:236-239."""
    return ROI(roi.x + (padded_size - org_w) // 2, roi.y + (padded_size - org_h) // 2, roi.h, roi.w)


def make_power_2_size(h: int, w: int, base: int) -> Tuple[int, int, float, float]:
    """New (h, w) rounded to a multiple of ``base`` plus per-axis ratios.
    Reference dataset_util.py:216-227."""
    nh = int(round(h / base) * base)
    nw = int(round(w / base) * base)
    if nh == h and nw == w:
        return h, w, 1.0, 1.0
    return nh, nw, nw / w, nh / h


def crop_window(
    img_h: int,
    img_w: int,
    crop_h: int,
    crop_w: int,
    center_h: int = 0,
    center_w: int = 0,
    center_crop: bool = False,
    rng: np.random.Generator | None = None,
) -> Tuple[int, int]:
    """Pick a crop origin ``(x, y)``.

    Random origins are constrained so the protected center region
    (``center_h``×``center_w`` around the image middle) stays inside the
    crop — the reference's "do not crop the garment" rule
    (reference data/dataset_util.py:163-181).
    """
    assert img_w >= crop_w and img_h >= crop_h, "image smaller than crop size"
    assert crop_h >= center_h and crop_w >= center_w, "crop cannot cover center region"
    if center_crop:
        return (img_w - crop_w) // 2, (img_h - crop_h) // 2
    rng = rng or np.random.default_rng()
    if center_w > 0 or center_h > 0:
        buffer = min(
            max(0, (img_w - center_w) // 2),
            max(0, (img_h - center_h) // 2),
            img_h - crop_h,
            img_w - crop_w,
        )
        x = int(rng.integers(0, buffer + 1))
        y = int(rng.integers(0, buffer + 1))
    else:
        x = int(rng.integers(0, max(0, img_w - crop_w) + 1))
        y = int(rng.integers(0, max(0, img_h - crop_h) + 1))
    return x, y


# ---------------------------------------------------------------------------
# patch-coordinate codec (host side of the device gather contract)
# ---------------------------------------------------------------------------

N_COORD_FIELDS = 8


def pack_patch_coords(
    roi: ROI, patch_crop_size: float, resize_ratio: float, crop_pos_x: float, crop_pos_y: float
) -> np.ndarray:
    return np.array(
        [roi.x, roi.y, roi.h, roi.w, patch_crop_size, resize_ratio, crop_pos_x, crop_pos_y],
        dtype=np.float32,
    )


def patch_offsets(coords: np.ndarray, scale_multiplier: int = 1):
    """Resolve packed coords (..., 8) to integer (offset_x, offset_y, cutout).

    offset = (ROI_origin + crop_pos / resize_ratio) * scale_multiplier, rounded;
    cutout = patch_crop_size / resize_ratio * scale_multiplier, rounded.
    Reference models/model_utils.py:23-69.
    """
    coords = np.asarray(coords, dtype=np.float64)
    rr = coords[..., 5]
    off_x = np.round((coords[..., 0] + coords[..., 6] / rr) * scale_multiplier).astype(np.int32)
    off_y = np.round((coords[..., 1] + coords[..., 7] / rr) * scale_multiplier).astype(np.int32)
    cutout = np.round(coords[..., 4] / rr * scale_multiplier).astype(np.int32)
    return off_x, off_y, cutout
