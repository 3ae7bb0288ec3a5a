"""VGG19 perceptual loss (pix2pixHD's VGGLoss).

Reference models/networks.py:2021-2073: feature L1 at relu{1..5}_1 with
weights [1/32, 1/16, 1/8, 1/4, 1]; inputs are fed in [-1,1] *without*
ImageNet normalization (a pix2pixHD quirk, mirrored).  Weight converter from
a torchvision vgg19 state_dict + deterministic random fallback, same policy
as :mod:`vts_tpu.losses.lpips`.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# (out_channels, pool_before) for the 16 convs of VGG19
_VGG19_PLAN = [
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False), (256, False),
    (512, True), (512, False), (512, False), (512, False),
    (512, True), (512, False), (512, False), (512, False),
]
# taps after relu of conv index: relu1_1, relu2_1, relu3_1, relu4_1, relu5_1
_TAPS = (0, 2, 4, 8, 12)
_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


def init_vgg19_params(seed: int = 0) -> Dict:
    rng = np.random.default_rng(seed)
    convs = []
    in_c = 3
    for out_c, _ in _VGG19_PLAN:
        fan_in = in_c * 9
        convs.append({
            "w": jnp.asarray(rng.normal(0, np.sqrt(2.0 / fan_in),
                                        (3, 3, in_c, out_c)).astype(np.float32)),
            "b": jnp.zeros((out_c,), jnp.float32),
        })
        in_c = out_c
    return {"conv": convs}


def load_vgg19_weights(path: str) -> Dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    tv_idx = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
    convs = []
    for li in tv_idx:
        w = np.asarray(sd[f"features.{li}.weight"])
        b = np.asarray(sd[f"features.{li}.bias"])
        convs.append({"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)})
    return {"conv": convs}


def vgg19_taps(params: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    taps = []
    h = x.astype(jnp.float32)
    for i, ((_, pool), p) in enumerate(zip(_VGG19_PLAN, params["conv"])):
        if pool:
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        h = jax.lax.conv_general_dilated(
            h, p["w"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.relu(h + p["b"])
        if i in _TAPS:
            taps.append(h)
        if i >= max(_TAPS):
            break
    return taps


def vgg_loss(params: Dict, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Weighted feature L1; y-branch features are constants."""
    fx = vgg19_taps(params, x)
    fy = vgg19_taps(params, jax.lax.stop_gradient(y))
    total = 0.0
    for w, a, b in zip(_WEIGHTS, fx, fy):
        total = total + w * jnp.mean(jnp.abs(a - b))
    return total
