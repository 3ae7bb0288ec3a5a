"""Paired SIMT-patch dataset for the pix2pix/pix2pixHD/SPADE baselines.

Re-design of ``PatchSkitDataset`` (reference data/patchskit_dataset.py:20-340):
one augmented view of the garment (center-protected crop of the padded
canvas), then EVERY valid touch square becomes one dataset item carrying the
paired (S, I, M, T) 32²·mult patches; ``return_patch=False`` (test) returns
the full-image record like SingleSkit so baselines run full-canvas inference.
A held-out val split uses the valT records.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..utils.registry import register_dataset
from .singleskit import SingleSkitDataset, pack_aug_params
from .coords import patch_offsets


@register_dataset("patchskit")
class PatchSkitDataset(SingleSkitDataset):

    @staticmethod
    def modify_commandline_options(parser, is_train):
        parser = SingleSkitDataset.modify_commandline_options(parser, is_train)
        return parser

    def __init__(self, opt, verbose: bool = False):
        self.return_patch = bool(getattr(opt, "return_patch", True))
        super().__init__(opt, verbose=verbose)
        # one deterministic augmented view; all patches from it
        self._full = super().build_sample(0)
        if self.return_patch:
            valid = self._full["T_valid"] > 0
            self._patches = self._extract_sim_patches(self._full, valid)
            self.data_len = int(valid.sum())
        else:
            self.data_len = int(getattr(opt, "data_len", 1))

    def _extract_sim_patches(self, full: Dict[str, np.ndarray], valid) -> Dict[str, np.ndarray]:
        coords = full["T_coords"][valid]
        off_x, off_y, cut = patch_offsets(coords, 1)
        pc = full["T_images"].shape[1]
        s_list, i_list, m_list = [], [], []
        for ox, oy in zip(off_x, off_y):
            sl = np.s_[oy : oy + 32, ox : ox + 32]
            s_list.append(full["S"][sl])
            i_list.append(full["I"][sl])
            m_list.append(full["M"][sl])
        return {
            "S": np.stack(s_list), "I": np.stack(i_list), "M": np.stack(m_list),
            "T_images": full["T_images"][valid],
            "I_masks": full["I_masks"][valid],
        }

    def build_sample(self, index: int) -> Dict[str, np.ndarray]:
        # deterministic view: index folds into the same augmented canvas
        return super().build_sample(0)

    def __len__(self) -> int:
        return self.data_len

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        if not self.return_patch:
            return self._full
        p = self._patches
        return {
            "S": p["S"][index], "I": p["I"][index], "M": p["M"][index],
            "T_images": p["T_images"][index][None],      # (1, pc, pc, 2)
            "I_masks": p["I_masks"][index][None],
            "T_valid": np.ones((1,), np.float32),
            "augmentation_params": self._full["augmentation_params"],
        }
