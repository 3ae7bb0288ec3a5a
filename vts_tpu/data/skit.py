"""Multi-garment SKIT dataset (reference data/skit_dataset.py:25-500).

One ``SingleSkitDataset`` per material in ``--material_list``; item ``index``
resolves to material ``index % n_materials`` and that garment's augmented view
``index // n_materials`` (round-robin, matching the reference's
``material_index = index % len(material_list)``).  Each sample additionally
carries ``material_index`` and, when a style-image root is configured, the
style image for the CLIP style encoder (skitG).
"""

from __future__ import annotations

import copy
import os
from typing import Dict, List

import numpy as np
from PIL import Image

from ..utils.registry import register_dataset
from .singleskit import SingleSkitDataset
from .transforms import to_array


@register_dataset("skit")
class SkitDataset:

    @staticmethod
    def modify_commandline_options(parser, is_train):
        parser = SingleSkitDataset.modify_commandline_options(parser, is_train)
        parser.add_argument("--material_list", type=str, default="",
                            help="comma-separated material names; each maps to "
                                 "<dataroot_prefix><material><dataroot_suffix>")
        parser.add_argument("--dataroot_prefix", type=str, default="singleskit_")
        parser.add_argument("--dataroot_suffix", type=str, default="_padded_1800_x1")
        parser.add_argument("--style_image_dir", type=str, default="",
                            help="external style images for cross-material style swap")
        parser.add_argument("--style_image_size", type=int, default=224)
        return parser

    def __init__(self, opt, verbose: bool = False):
        self.opt = opt
        materials = [m for m in getattr(opt, "material_list", "").split(",") if m]
        if not materials and opt.dataroot.startswith("synthetic://"):
            materials = ["synthA", "synthB"]
        assert materials, "skit dataset needs --material_list"
        self.materials = materials
        self.datasets: List[SingleSkitDataset] = []
        base = os.path.dirname(opt.dataroot.rstrip("/")) if not opt.dataroot.startswith("synthetic://") else None
        for m in materials:
            sub_opt = copy.copy(opt)
            if opt.dataroot.startswith("synthetic://"):
                sub_opt.dataroot = f"synthetic://{m}?size=1800" \
                    if "?" not in opt.dataroot else \
                    opt.dataroot.replace(opt.dataroot.split("//")[1].split("?")[0], m, 1)
            else:
                sub_opt.dataroot = os.path.join(
                    base or "", f"{opt.dataroot_prefix}{m}{opt.dataroot_suffix}")
            self.datasets.append(SingleSkitDataset(sub_opt, verbose=verbose))
        self.data_len = int(getattr(opt, "data_len", 1)) * len(materials)
        self.style_paths: List[str] = []
        style_dir = getattr(opt, "style_image_dir", "")
        if style_dir and os.path.isdir(style_dir):
            from .npz import list_images
            self.style_paths = list_images(style_dir)

    @property
    def name(self) -> str:
        return "+".join(self.materials)

    def material_of(self, index: int) -> int:
        return index % len(self.materials)

    def __len__(self) -> int:
        return self.data_len

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        mat = self.material_of(index)
        inner = index // len(self.materials)
        sample = dict(self.datasets[mat][inner % len(self.datasets[mat])])
        sample["material_index"] = np.int32(mat)
        if self.style_paths:
            img = Image.open(self.style_paths[index % len(self.style_paths)]).convert("RGB")
            img = img.resize((self.opt.style_image_size, self.opt.style_image_size))
            sample["style_image"] = to_array(img, normalize=True)
        else:
            # default style source: the garment's own visual image, resized
            i_img = sample.get("I")
            if i_img is not None:
                size = int(getattr(self.opt, "style_image_size", 224))
                pil = Image.fromarray(
                    ((i_img * 0.5 + 0.5) * 255).astype(np.uint8).squeeze())
                sample["style_image"] = to_array(
                    pil.resize((size, size)), normalize=True)
        return sample
