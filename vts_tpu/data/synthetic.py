"""Procedural synthetic garments in the reference on-disk layout.

The TouchClothing dataset (20 garments, 580 MB) is not present in this
environment, so tests, smoke runs, and benchmarks use procedurally generated
garments written in exactly the reference's directory convention
(reference README.md:66-101):

    <root>/singleskit_<name>_padded_<P>_x<mult>/
        trainS/sketch.png    grayscale sketch, white bg, padded P²
        trainI/image.png     RGB visual
        trainM/mask.png      object mask
        trainT/*.npz         GelSight records (gx/gy + ROI + contact masks)
        valT/*.npz           held-out touch records
        testS/ testI/ testM/ testT/   center-cropped test copies

A garment is a rounded polygon mask over the protected 1280×960 center
region, a woven-texture height field; the visual is the shaded texture, the
sketch its edge map, and each tactile record samples the height-field
gradient over a small ROI — so S, I, and T are *mutually consistent*, which
is what the SKIT losses assume.

``dataroot='synthetic://<name>?size=P&patches=N'`` materializes (and caches)
such a garment and returns the concrete path.
"""

from __future__ import annotations

import hashlib
import os
import urllib.parse
from typing import Tuple

import numpy as np
from PIL import Image

from .npz import save_touch_npz


def _height_field(h: int, w: int, rng: np.random.Generator, n_waves: int = 6,
                  max_freq: float = 0.25) -> np.ndarray:
    """Smooth pseudo-weave height field in [-1, 1]; frequencies are capped so
    the visual decimation at T_resolution_multiplier > 1 does not alias."""
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    field = np.zeros((h, w), np.float32)
    for _ in range(n_waves):
        fx, fy = rng.uniform(0.02, max_freq, size=2)
        phase = rng.uniform(0, 2 * np.pi)
        amp = rng.uniform(0.3, 1.0)
        field += amp * np.sin(2 * np.pi * (fx * xx + fy * yy) + phase)
    field /= np.abs(field).max() + 1e-8
    return field


def _garment_mask(h: int, w: int, rng: np.random.Generator) -> np.ndarray:
    """Blobby garment silhouette filling most of the frame."""
    yy, xx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij")
    r = np.sqrt((xx / 0.85) ** 2 + (yy / 0.8) ** 2)
    ang = np.arctan2(yy, xx)
    wobble = sum(rng.uniform(0.02, 0.08) * np.cos(k * ang + rng.uniform(0, 2 * np.pi))
                 for k in range(2, 6))
    return (r < 0.9 + wobble).astype(np.float32)


def generate_garment(out_dir: str, name: str, padded_size: int = 1800,
                     center_w: int = 1280, center_h: int = 960,
                     n_train_patches: int = 12, n_val_patches: int = 4,
                     roi_hw: Tuple[int, int] = (192, 256),
                     mult: int = 1, seed: int = 0) -> str:
    """Write one synthetic garment; returns the dataroot path."""
    root = os.path.join(out_dir, f"singleskit_{name}_padded_{padded_size}_x{mult}")
    done_marker = os.path.join(root, ".complete")
    if os.path.exists(done_marker):
        return root
    rng = np.random.default_rng(seed)
    for sub in ("trainS", "trainI", "trainM", "trainT", "valT",
                "testS", "testI", "testM", "testT"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    # center (camera) frame content
    mask_c = _garment_mask(center_h, center_w, rng)
    height = _height_field(center_h * mult, center_w * mult, rng,
                           max_freq=0.25 / (2 * mult) if mult > 1 else 0.25)
    height_v = height[::mult, ::mult] if mult > 1 else height

    base_rgb = rng.uniform(0.25, 0.85, size=3).astype(np.float32)
    shade = 0.5 + 0.35 * height_v
    visual_c = (shade[..., None] * base_rgb[None, None, :]) * mask_c[..., None] \
        + (1.0 - mask_c[..., None])  # white background

    # sketch: mask boundary + strong texture edges, black strokes on white
    gy_v, gx_v = np.gradient(height_v)
    edge = (np.abs(gx_v) + np.abs(gy_v)) > np.percentile(np.abs(gx_v) + np.abs(gy_v), 92)
    mgy, mgx = np.gradient(mask_c)
    boundary = (np.abs(mgx) + np.abs(mgy)) > 0
    sketch_c = 1.0 - np.clip(edge * mask_c + boundary * 3.0, 0, 1) * 0.9

    # pad to padded_size² with white (sketch/visual) and zero (mask)
    pad_y = (padded_size - center_h) // 2
    pad_x = (padded_size - center_w) // 2

    def pad(img, fill):
        out = np.full((padded_size, padded_size) + img.shape[2:], fill, np.float32)
        out[pad_y : pad_y + center_h, pad_x : pad_x + center_w] = img
        return out

    def save_png(path, arr):
        a = np.clip(arr, 0, 1)
        a8 = (a * 255).astype(np.uint8)
        if a8.ndim == 3 and a8.shape[-1] == 1:
            a8 = a8[..., 0]
        Image.fromarray(a8).save(path)

    save_png(os.path.join(root, "trainS", f"{name}_sketch.png"), pad(sketch_c, 1.0))
    save_png(os.path.join(root, "trainI", f"{name}_image.png"), pad(visual_c, 1.0))
    save_png(os.path.join(root, "trainM", f"{name}_mask.png"), pad(mask_c, 0.0))
    # test copies share the padded images (reference test roots are the same
    # garment with preprocess='none' center crop)
    save_png(os.path.join(root, "testS", f"{name}_sketch.png"), pad(sketch_c, 1.0))
    save_png(os.path.join(root, "testI", f"{name}_image.png"), pad(visual_c, 1.0))
    save_png(os.path.join(root, "testM", f"{name}_mask.png"), pad(mask_c, 0.0))

    # tactile records: gradient of the height field over small ROIs whose
    # coords live in the *unpadded* camera frame (reference global_padding
    # convention, data/dataset_util.py:236-239); ROIs shrink with the frame
    # but stay large enough to host 32² contact squares
    roi_h = max(40, min(roi_hw[0], int(center_h * 0.45)))
    roi_w = max(40, min(roi_hw[1], int(center_w * 0.45)))
    gy_t, gx_t = np.gradient(height)  # tactile-res gradients
    scale = 1.0 / (np.abs(gx_t).max() + 1e-8)

    def write_patches(subdir, count, rng):
        written = 0
        attempts = 0
        while written < count and attempts < count * 50:
            attempts += 1
            x = int(rng.integers(0, center_w - roi_w))
            y = int(rng.integers(0, center_h - roi_h))
            m_roi = mask_c[y : y + roi_h, x : x + roi_w]
            if m_roi.mean() < 0.7:
                continue
            yt, xt = y * mult, x * mult
            gx_roi = (gx_t[yt : yt + roi_h * mult, xt : xt + roi_w * mult] * scale).astype(np.float32)
            gy_roi = (gy_t[yt : yt + roi_h * mult, xt : xt + roi_w * mult] * scale).astype(np.float32)
            # contact mask: central super-ellipse; center mask: its erosion
            hh, ww = gx_roi.shape
            yy, xx = np.meshgrid(np.linspace(-1, 1, hh), np.linspace(-1, 1, ww), indexing="ij")
            contact = ((np.abs(xx) ** 4 + np.abs(yy) ** 4) < 0.55).astype(np.float32)
            center = ((np.abs(xx) ** 4 + np.abs(yy) ** 4) < 0.18).astype(np.float32)
            save_touch_npz(
                os.path.join(root, subdir, f"{name}_{subdir}_{written:03d}_tactile.npz"),
                gx_roi, gy_roi, x, y, roi_h, roi_w, contact, center)
            written += 1
        assert written == count, f"could not place {count} ROIs inside the garment"

    write_patches("trainT", n_train_patches, np.random.default_rng(seed + 1))
    write_patches("valT", n_val_patches, np.random.default_rng(seed + 2))
    write_patches("testT", max(2, n_val_patches), np.random.default_rng(seed + 3))

    with open(done_marker, "w") as f:
        f.write("ok\n")
    return root


def materialize_synthetic(uri: str, opt=None) -> str:
    """Resolve 'synthetic://<name>?size=1800&patches=12&mult=1&seed=0' to a
    generated dataroot under $VTS_SYNTH_DIR (default /tmp/vts_synth)."""
    parsed = urllib.parse.urlparse(uri)
    name = parsed.netloc or "default"
    q = dict(urllib.parse.parse_qsl(parsed.query))
    out_dir = os.environ.get("VTS_SYNTH_DIR", "/tmp/vts_synth")
    os.makedirs(out_dir, exist_ok=True)
    seed = int(q.get("seed", int(hashlib.md5(name.encode()).hexdigest()[:6], 16)))
    mult = int(q.get("mult", getattr(opt, "T_resolution_multiplier", 1) if opt else 1))
    return generate_garment(
        out_dir, name,
        padded_size=int(q.get("size", 1800)),
        center_w=int(q.get("center_w", getattr(opt, "center_w", 1280) if opt else 1280)),
        center_h=int(q.get("center_h", getattr(opt, "center_h", 960) if opt else 960)),
        n_train_patches=int(q.get("patches", 12)),
        n_val_patches=int(q.get("val_patches", 4)),
        mult=mult,
        seed=seed,
    )
