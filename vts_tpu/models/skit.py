"""SKIT — the multi-garment model with a CLIP style code.

Re-design of ``SKITGModel`` (reference models/skitG_model.py:35-1773):
everything sinskitG does, plus a frozen CLIP ViT-B/32 image tower producing a
512-d style code from a style image (the garment's own visual image during
training; arbitrary style images at test for cross-material style swap,
reference skitG_model.py:484-486, :705-721, :1294-1302), injected into the
generator decoder via tile/project mapping × concat/adain mode
(reference networks.py:1440-1468, :1600-1633).

Style-code computation is a separate small jit (224² CLIP forward) executed
at ``set_input`` time; with ``--precomputed_style_codes`` the dataset may
supply ``style_code`` directly and the tower never runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config.options import str2bool
from ..networks.clip_vit import clip_style_code
from ..utils.registry import register_model
from .sinskit import SinSKITModel


@register_model("skit")
@register_model("skitG")
class SKITModel(SinSKITModel):

    @staticmethod
    def modify_commandline_options(parser, is_train=True):
        parser = SinSKITModel.modify_commandline_options(parser, is_train)
        parser.add_argument("--use_style_code", type=str2bool, default=True)
        parser.add_argument("--style_code_dim", type=int, default=512)
        parser.add_argument("--style_code_mode", type=str, default="concat",
                            choices=["concat", "adain"])
        parser.add_argument("--style_code_mapping_mode", type=str, default="tile",
                            choices=["tile", "project"])
        # reference default is 1 — inject the code at ONE decoder level
        # (skitG_model.py:274; -1 = every level is supported there but never
        # shipped, networks.py:1440)
        parser.add_argument("--num_layer_style_code", type=int, default=1)
        parser.add_argument("--precomputed_style_codes", type=str2bool, default=False)
        parser.set_defaults(model="skit", dataset_mode="skit")
        return parser

    def __init__(self, opt):
        super().__init__(opt)
        self._jit_style = None

    def encode_style(self, style_images: jnp.ndarray) -> jnp.ndarray:
        if self._jit_style is None:
            # params ride as an argument — capturing them would embed the
            # ~350 MB tower in the HLO (remote-compile upload limit)
            self._jit_style = jax.jit(clip_style_code)
        return self._jit_style(self.clip_params, jnp.asarray(style_images))

    def set_input(self, batch, phase: str = "train") -> None:
        super().set_input(batch, phase)
        if not getattr(self.opt, "use_style_code", False):
            return
        if "style_code" in batch:
            self._input["style_code"] = jnp.asarray(batch["style_code"])
        elif "style_image" in batch:
            self._input["style_code"] = self.encode_style(batch["style_image"])
        else:
            # fall back to encoding the garment's own visual image — at full
            # resolution: clip_image_features resizes non-224 inputs itself
            # (ops/resize_mm matmul form, inside the jit), where the previous
            # eager resize_bilinear here was a per-sample gather-chain
            # dispatch on the tunneled backend.  Same values: the resize and
            # CLIP's affine normalization commute exactly (the interpolation
            # weights sum to 1).
            assert "I" in self._input, "skitG needs a style image or visual image"
            self._input["style_code"] = self.encode_style(self._input["I"])
        self.material_index = int(np.asarray(batch.get("material_index", [0])).reshape(-1)[0])
