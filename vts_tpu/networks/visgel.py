"""VisGel image→touch networks (NHWC).

Re-design of the reference's vendored VisGel nets
(models/Image2Touch_networks.py:87-861): a CIFAR-style ResNet encoder for
32² patches (BasicBlocks, 16→32→64 channels; ``resnet_I32``,
reference :309-381) feeding an interpolate+conv decoder with a source skip,
emitting the tactile patch at ``T_resolution_multiplier`` × the input
resolution (``_netG_resnet``, reference :484-688).  Selected via
``--netG visgel`` (the reference's ``define_G('VisGel')``,
networks.py:304-305) and by define_G2's super-resolution path.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .blocks import InstanceNorm, make_initializer


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        conv = lambda f, s, name: nn.Conv(f, (3, 3), strides=(s, s),
                                          padding=((1, 1), (1, 1)), use_bias=False,
                                          kernel_init=self.kernel_init, name=name)
        h = conv(self.features, self.stride, "conv1")(x)
        h = InstanceNorm()(h)
        h = nn.relu(h)
        h = conv(self.features, 1, "conv2")(h)
        h = InstanceNorm()(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, kernel_init=self.kernel_init, name="down")(x)
            x = InstanceNorm()(x)
        return nn.relu(h + x)


class ResNetI32Encoder(nn.Module):
    """3-stage CIFAR ResNet on 32² inputs → (features at /4, stem skip)."""

    inplanes: int = 16
    blocks_per_stage: int = 5   # resnet32
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.inplanes, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    kernel_init=self.kernel_init, name="stem")(x)
        h = InstanceNorm()(h)
        h = nn.relu(h)
        skip = h
        for stage, (feats, stride) in enumerate(((16, 1), (32, 2), (64, 2))):
            for b in range(self.blocks_per_stage):
                h = BasicBlock(feats, stride if b == 0 else 1,
                               kernel_init=self.kernel_init,
                               name=f"s{stage}b{b}")(h)
        return h, skip


class VisGelGenerator(nn.Module):
    """Encoder-decoder: 32² input → tactile patch at 32·mult ²."""

    ngf: int = 16
    out_nc: int = 2
    t_resolution_multiplier: int = 2
    norm_type: str = "instance"
    src_skip: bool = True
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Optional[Any] = None
    train: bool = True

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        winit = make_initializer(self.init_type, self.init_gain)
        up2 = lambda h: jax.image.resize(
            h, (h.shape[0], h.shape[1] * 2, h.shape[2] * 2, h.shape[3]), "linear")

        feats, skip = ResNetI32Encoder(kernel_init=winit, name="encoder")(x)
        ngf = 16
        conv = lambda f, name: nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)),
                                       kernel_init=winit, name=name)
        h = up2(feats)                                # 8 → 16
        h = nn.relu(InstanceNorm()(conv(ngf * 4, "conv_00")(h)))
        h = up2(h)                                    # 16 → 32
        h = nn.relu(InstanceNorm()(conv(ngf * 4, "conv_01")(h)))
        if self.src_skip:
            sk = skip
            if sk.shape[1] != h.shape[1]:
                sk = jax.image.resize(sk, (sk.shape[0], h.shape[1], h.shape[2],
                                           sk.shape[-1]), "linear")
            # channel-match the stem skip by tiling to conv width
            reps = max(1, h.shape[-1] // sk.shape[-1])
            h = jnp.concatenate([h, jnp.tile(sk, (1, 1, 1, reps))], axis=-1)
        # extra upsampling stages to reach mult × input resolution
        n_extra = int(np.log2(max(self.t_resolution_multiplier, 1)))
        cur = ngf * 4
        for i in range(n_extra):
            h = up2(h)
            cur = max(cur // 2, ngf)
            h = nn.relu(InstanceNorm()(conv(cur, f"conv_up{i}")(h)))
        h = conv(self.out_nc, "head")(h)
        return jnp.tanh(h)
