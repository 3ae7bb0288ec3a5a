"""Legacy CycleGAN-heritage datasets (reference data/{single,singleimage,
unaligned,template}_dataset.py) — kept for registry parity; the four shipped
SKIT configs never use them (SURVEY.md §2.A)."""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
from PIL import Image

from ..utils.registry import register_dataset
from .base_transforms import apply_transform, get_params
from .npz import list_images


class _LegacyBase:
    @staticmethod
    def modify_commandline_options(parser, is_train):
        return parser

    def __len__(self):
        return self._len

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


@register_dataset("single")
class SingleDataset(_LegacyBase):
    """One image directory, domain A only (reference data/single_dataset.py)."""

    def __init__(self, opt):
        self.opt = opt
        self.paths = list_images(opt.dataroot, getattr(opt, "max_dataset_size", None))
        assert self.paths, f"no images under {opt.dataroot}"
        self._len = len(self.paths)
        self.rng = np.random.default_rng(getattr(opt, "seed", 0))

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        path = self.paths[index % len(self.paths)]
        img = Image.open(path).convert("RGB")
        params = get_params(self.opt, img.size, self.rng)
        return {"A": apply_transform(self.opt, img, params), "A_paths_idx": np.int32(index)}


@register_dataset("unaligned")
class UnalignedDataset(_LegacyBase):
    """trainA/trainB unpaired domains (reference data/unaligned_dataset.py)."""

    def __init__(self, opt):
        self.opt = opt
        phase = getattr(opt, "phase", "train")
        self.A_paths = list_images(os.path.join(opt.dataroot, phase + "A"))
        self.B_paths = list_images(os.path.join(opt.dataroot, phase + "B"))
        assert self.A_paths and self.B_paths
        self._len = max(len(self.A_paths), len(self.B_paths))
        self.rng = np.random.default_rng(getattr(opt, "seed", 0))

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        a_path = self.A_paths[index % len(self.A_paths)]
        if getattr(self.opt, "serial_batches", False):
            b_path = self.B_paths[index % len(self.B_paths)]
        else:
            b_path = self.B_paths[int(self.rng.integers(0, len(self.B_paths)))]
        a = Image.open(a_path).convert("RGB")
        b = Image.open(b_path).convert("RGB")
        pa = get_params(self.opt, a.size, self.rng)
        pb = get_params(self.opt, b.size, self.rng)
        return {"A": apply_transform(self.opt, a, pa),
                "B": apply_transform(self.opt, b, pb)}


@register_dataset("singleimage")
class SingleImageDataset(_LegacyBase):
    """One image per domain; each item is a random augmented view
    (reference data/singleimage_dataset.py)."""

    def __init__(self, opt):
        self.opt = opt
        phase = getattr(opt, "phase", "train")
        a = list_images(os.path.join(opt.dataroot, phase + "A"))
        b_dir = os.path.join(opt.dataroot, phase + "B")
        b = list_images(b_dir) if os.path.isdir(b_dir) else []
        assert len(a) == 1, "singleimage expects exactly one A image"
        self.A_img = Image.open(a[0]).convert("RGB")
        self.B_img = Image.open(b[0]).convert("RGB") if b else None
        self._len = int(getattr(opt, "data_len", 1000))
        self.rng = np.random.default_rng(getattr(opt, "seed", 0))

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        pa = get_params(self.opt, self.A_img.size, self.rng)
        out = {"A": apply_transform(self.opt, self.A_img, pa)}
        if self.B_img is not None:
            pb = get_params(self.opt, self.B_img.size, self.rng)
            out["B"] = apply_transform(self.opt, self.B_img, pb)
        return out


@register_dataset("template")
class TemplateDataset(_LegacyBase):
    """Minimal example dataset (reference data/template_dataset.py) — a
    documented starting point for new datasets."""

    @staticmethod
    def modify_commandline_options(parser, is_train):
        parser.add_argument("--new_dataset_option", type=float, default=1.0)
        return parser

    def __init__(self, opt):
        self.opt = opt
        self.paths = list_images(opt.dataroot) if os.path.isdir(opt.dataroot) else []
        self._len = max(len(self.paths), 1)
        self.rng = np.random.default_rng(getattr(opt, "seed", 0))

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        if self.paths:
            img = Image.open(self.paths[index % len(self.paths)]).convert("RGB")
            params = get_params(self.opt, img.size, self.rng)
            data = apply_transform(self.opt, img, params)
        else:
            data = np.zeros((self.opt.crop_size, self.opt.crop_size, 3), np.float32)
        return {"data_A": data, "data_B": data.copy()}
