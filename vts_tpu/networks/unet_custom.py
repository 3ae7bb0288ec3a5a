"""Dual-head custom U-Net — the sinskitG/skitG generator.

TPU-native re-design of ``CustomUnetGenerator`` (reference
models/networks.py:1430-1645).  Architecture contract (num_downs=8, ngf=g):

  encoder:  down0 conv only   in→g        (1536² → 768²)
            down1..down3      g→2g→4g→8g  (… → 96²)
            down4..down6      8g→8g       (… → 12²)
            down7 innermost   8g→8g, no norm (→ 6²)
  decoder:  up7 innermost     8g→8g (no skip)
            up6..up4          cat(skip)·16g→8g
            up3..up1          16g→4g, 8g→2g, 4g→g
            up0 outermost     g→out (tanh, NO down0 skip)
  The top ``num_layer_separate`` decoder levels are duplicated into a
  tactile branch (`up{i}_T`), forked from the shared feature right before
  level ``num_layer_separate-1``; the visual head emits 3 channels, the
  tactile head 2, concatenated on channels (reference networks.py:1635-1645).

Style-code hooks (skitG): at each decoder level i ≥ num_downs −
num_layer_style_code, a per-level style tensor is merged into both branches
either by channel-concat or AdaIN (reference networks.py:1600-1633); the
style tensor is the raw code tiled spatially ('tile') or a per-level linear
projection reshaped to the level's map ('project').
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from .blocks import (Down, Up, make_initializer, make_norm_layer,
                     norm_uses_bias, packed_concat)


def adaptive_instance_norm(content: jnp.ndarray, style: jnp.ndarray, eps: float = 1e-5):
    """AdaIN over NHWC (reference thirdparty/AdaIN/function.py:4-33)."""
    c_mean = jnp.mean(content, axis=(1, 2), keepdims=True)
    c_std = jnp.sqrt(jnp.var(content, axis=(1, 2), keepdims=True) + eps)
    s_mean = jnp.mean(style, axis=(1, 2), keepdims=True)
    s_std = jnp.sqrt(jnp.var(style, axis=(1, 2), keepdims=True) + eps)
    return (content - c_mean) / c_std * s_std + s_mean


class StyleMapping(nn.Module):
    """Per-decoder-level style projection: Dense → norm → ReLU, reshaped to
    (N, H_i, W_i, C_i) (reference networks.py:1444-1466)."""

    out_hw: int
    out_nc: int
    dtype: Optional[Any] = None
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, style_code):
        n = style_code.shape[0]
        pred_dim = self.out_hw * self.out_hw * self.out_nc
        x = nn.Dense(pred_dim, use_bias=False, kernel_init=self.kernel_init,
                     dtype=self.dtype)(style_code.astype(jnp.float32))
        # instance-norm-1d equivalent (batch_size==1 default): normalize features
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mean) / jnp.sqrt(var + 1e-5)
        x = nn.relu(x)
        return x.reshape(n, self.out_hw, self.out_hw, self.out_nc)


class CustomUNet(nn.Module):
    """Dual-head U-Net generator (NHWC)."""

    ngf: int = 10
    out_nc: int = 5                   # 3 visual + 2 tactile
    num_downs: int = 8
    num_layer_separate: int = 4
    norm_type: str = "instance"
    use_dropout: bool = False
    input_size: int = 1536            # only used to size 'project' style maps
    # style code (skitG)
    use_style_code: bool = False
    style_code_dim: int = 512
    style_code_mode: str = "concat"        # concat | adain
    style_code_mapping_mode: str = "tile"  # tile | project
    num_layer_style_code: int = -1         # -1 → all decoder levels
    # tactile super-resolution: log2(t_mult) extra up stages in the tactile
    # branch so fake_T comes out at t_mult× the canvas (the flagship analogue
    # of the reference G2-resnet's n_upsampling += log2(T_resolution_multiplier),
    # models/networks.py:1099-1105 — the reference's own unet_custom emits T
    # at canvas res and its x2 gather would index out of range).  When
    # t_mult > 1 the forward returns a (visual, tactile) TUPLE.
    t_mult: int = 1
    # policy
    init_type: str = "xavier"
    init_gain: float = 0.02
    dtype: Optional[Any] = None
    train: bool = True
    axis_name: Optional[str] = None
    # garment packing: `pack` independent garments' weights ride grouped
    # convs over channel-stacked inputs (N, H, W, pack·in_nc) — the MXU
    # lane-filling fleet layout (vts_tpu/parallel/packing.py).
    pack: int = 1

    @nn.compact
    def __call__(self, x, style_code=None, *, deterministic: bool = True):
        assert self.out_nc == 5, "architecture emits 3 RGB + 2 touch channels"
        if self.t_mult < 1 or (self.t_mult & (self.t_mult - 1)):
            raise ValueError(
                f"t_mult={self.t_mult} must be a power of two: the tactile "
                "head gains bit_length-1 extra up stages, so a non-power-of-2 "
                "multiplier would emit a canvas that mismatches the resized "
                "M_T mask deep inside the jitted step")
        if self.pack > 1 and self.use_style_code:
            raise NotImplementedError("style codes are per-model; packing is "
                                      "for independent per-garment models")
        if x.shape[1] % (2 ** self.num_downs) or x.shape[2] % (2 ** self.num_downs):
            raise ValueError(
                f"input spatial size {x.shape[1]}x{x.shape[2]} must be divisible by "
                f"2^num_downs = {2 ** self.num_downs} (use the make-power-2 transform)")
        g = self.ngf
        nd = self.num_downs
        norm = make_norm_layer(self.norm_type, train=self.train, axis_name=self.axis_name,
                               dtype=self.dtype)
        winit = make_initializer(self.init_type, self.init_gain)
        use_bias = norm_uses_bias(self.norm_type)
        n_style = nd if self.num_layer_style_code == -1 else self.num_layer_style_code

        def down(feats, i):
            return Down(feats * self.pack, norm=norm, outermost=(i == 0),
                        innermost=(i == nd - 1),
                        use_bias=use_bias, kernel_init=winit, dtype=self.dtype,
                        groups=self.pack, name=f"down{i}")

        def up(feats, i, suffix=""):
            mid = nd // 2 <= i < nd - 1
            return Up(feats * self.pack, norm=norm, outermost=(i == 0),
                      innermost=(i == nd - 1),
                      use_bias=use_bias, kernel_init=winit, dtype=self.dtype,
                      dropout=0.5 if (self.use_dropout and mid) else 0.0,
                      groups=self.pack, name=f"up{i}{suffix}")

        # ---- encoder ----
        skips = []
        h = x
        for i in range(nd):
            feats = g * min(2 ** min(i, 3), 8) if i < nd // 2 else g * 8
            h = down(feats, i)(h)
            skips.append(h)

        # ---- decoder (shared trunk, then forked visual/tactile heads) ----
        def style_tensor(i, ref_shape):
            """Per-level style map matching skip level i's (N, H, W, ·)."""
            n_, hh, ww = ref_shape[0], ref_shape[1], ref_shape[2]
            if self.style_code_mapping_mode == "tile":
                return jnp.broadcast_to(
                    style_code[:, None, None, :], (n_, hh, ww, style_code.shape[-1]))
            if self.style_code_mapping_mode == "project":
                out_nc = g * 8 if self.style_code_mode == "adain" else g // 2
                # level index in mapping-layer numbering: nd - i - 1 (innermost=0)
                return StyleMapping(out_hw=hh, out_nc=out_nc, dtype=self.dtype,
                                    kernel_init=winit,
                                    name=f"style_code_mapping{nd - i - 1}")(style_code)
            raise NotImplementedError(self.style_code_mapping_mode)

        h_vis = None
        h_tac = None
        for i in range(nd - 1, -1, -1):
            skip = skips[i]
            if i == nd - 1:
                h_vis = skips[i]  # innermost consumes its own encoder output
            # style injection before the up layer at this level
            if self.use_style_code and style_code is not None and i >= nd - n_style:
                st = style_tensor(i, skips[i].shape)
                if self.style_code_mode == "concat":
                    h_vis = jnp.concatenate([h_vis, st], axis=-1)
                    if h_tac is not None:
                        h_tac = jnp.concatenate([h_tac, st], axis=-1)
                elif self.style_code_mode == "adain":
                    h_vis = adaptive_instance_norm(h_vis, st)
                    if h_tac is not None:
                        h_tac = adaptive_instance_norm(h_tac, st)
                else:
                    raise NotImplementedError(self.style_code_mode)

            separate = i <= self.num_layer_separate - 1
            if separate and h_tac is None:
                h_tac = h_vis  # fork point

            if i == 0:
                feats_vis = 3 if self.num_layer_separate >= 1 else self.out_nc
                h_vis = up(feats_vis, 0)(h_vis, None, deterministic=deterministic)
                if h_tac is not None:
                    for j in range(int(self.t_mult).bit_length() - 1):
                        h_tac = Up(g * self.pack, norm=norm, innermost=True,
                                   use_bias=use_bias, kernel_init=winit,
                                   dtype=self.dtype, groups=self.pack,
                                   name=f"up0_T_extra{j}")(
                                       h_tac, None, deterministic=deterministic)
                    h_tac = up(2, 0, "_T")(h_tac, None, deterministic=deterministic)
            else:
                # decoder level i outputs encoder level (i-1)'s channel count
                feats = g * min(2 ** (i - 1), 8)
                h_vis = up(feats, i)(h_vis, skip, deterministic=deterministic)
                if h_tac is not None:
                    h_tac = up(feats, i, "_T")(h_tac, skip, deterministic=deterministic)

        if h_tac is None:
            return h_vis
        if self.t_mult > 1:
            # resolutions diverge — hand back both heads
            return h_vis, h_tac
        # per-garment (RGB, gxgy) stay contiguous: (…, pack·3) ⊕ (…, pack·2)
        # → (…, pack·5) interleaved by garment
        return packed_concat(h_vis, h_tac, self.pack)
