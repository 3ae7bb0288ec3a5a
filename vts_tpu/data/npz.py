"""GelSight touch-record IO.

Same on-disk contract as the reference (reference data/dataset_util.py:5-60):
one ``.npz`` per touch with

  gx_raw, gy_raw          float arrays in [-1, 1], tactile resolution
  vision_mask_x/y/h/w     ROI rectangle of the sensing area in the (unpadded)
                          camera frame
  touch_thresh            contact mask inside the ROI (0/1 or 0/255)
  touch_center_thresh     contact-center mask (where 32² squares may center)
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import List, Optional

import numpy as np


@dataclasses.dataclass
class TouchRecord:
    gx: np.ndarray
    gy: np.ndarray
    roi_x: float
    roi_y: float
    roi_h: float
    roi_w: float
    touch_mask: Optional[np.ndarray]
    touch_center_mask: Optional[np.ndarray]
    path: str = ""


def load_touch_npz(path: str, return_mask: bool = True) -> TouchRecord:
    data = np.load(path)
    touch_mask = touch_center_mask = None
    if return_mask:
        assert "touch_thresh" in data.files, f"touch_thresh not found in {path}"
        assert "touch_center_thresh" in data.files, f"touch_center_thresh not found in {path}"
        touch_mask = np.asarray(data["touch_thresh"], np.float32)
        touch_center_mask = np.asarray(data["touch_center_thresh"], np.float32)
        if touch_mask.max() > 1:
            touch_mask = touch_mask / 255.0
        if touch_center_mask.max() > 1:
            touch_center_mask = touch_center_mask / 255.0
    return TouchRecord(
        gx=np.asarray(data["gx_raw"], np.float32),
        gy=np.asarray(data["gy_raw"], np.float32),
        roi_x=float(data["vision_mask_x"]),
        roi_y=float(data["vision_mask_y"]),
        roi_h=float(data["vision_mask_h"]),
        roi_w=float(data["vision_mask_w"]),
        touch_mask=touch_mask,
        touch_center_mask=touch_center_mask,
        path=path,
    )


def save_touch_npz(path: str, gx, gy, roi_x, roi_y, roi_h, roi_w,
                   touch_mask, touch_center_mask) -> None:
    np.savez(
        path,
        gx_raw=np.asarray(gx, np.float32),
        gy_raw=np.asarray(gy, np.float32),
        vision_mask_x=roi_x,
        vision_mask_y=roi_y,
        vision_mask_h=roi_h,
        vision_mask_w=roi_w,
        touch_thresh=np.asarray(touch_mask, np.float32),
        touch_center_thresh=np.asarray(touch_center_mask, np.float32),
    )


IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".tif", ".tiff", ".webp")


def list_images(directory: str, max_size: Optional[int] = None) -> List[str]:
    """Recursive image glob (reference data/image_folder.py:23-61)."""
    out = []
    for root, _, files in sorted(os.walk(directory)):
        for f in sorted(files):
            if f.lower().endswith(IMG_EXTENSIONS):
                out.append(os.path.join(root, f))
    return out[:max_size] if max_size else out


def list_touch_npz(directory: str, max_size: Optional[int] = None) -> List[str]:
    out = sorted(glob.glob(os.path.join(directory, "**", "*.npz"), recursive=True))
    return out[:max_size] if max_size else out
