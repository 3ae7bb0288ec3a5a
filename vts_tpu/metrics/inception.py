"""InceptionV3 first feature block in JAX — the SIFID backbone.

The reference computes SIFID from InceptionV3 *block 0* features (dims=64:
Conv2d_1a_3x3 s2 → Conv2d_2a_3x3 → Conv2d_2b_3x3 — NO maxpool; the 3x3/s2
maxpool opens block 1, reference models/inception.py:61-78) with
``resize_input=False`` (models/inception.py:23) — features are taken at the
image's NATIVE resolution — and ``normalize_input`` mapping [0,1] → [-1,1]
(models/inception.py:134-135).  The visual SIFID feeds [0,1]-rescaled
images with that normalization; the tactile SIFID's convert2tensor
(sifid.py:180-203, vmin=-1 vmax=1) composed with normalize_input is the
identity, so tactile stacks enter the convs untransformed.

Weights: ``load_inception_weights(path)`` converts a torchvision
``inception_v3`` state_dict (``Conv2d_1a_3x3.conv.weight`` naming, BN with
eps=1e-3).  Without a checkpoint, ``init_inception_params`` provides a
deterministic random backbone — SIFID then remains a valid *relative*
single-image Fréchet metric (random-feature FIDs preserve ordering) but is
not numerically the published SIFID until real weights are supplied.
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .frechet import frechet_distance, gaussian_stats

# (name, out_c, kernel, stride, pad)
_BLOCK0 = [
    ("Conv2d_1a_3x3", 32, 3, 2, 0),
    ("Conv2d_2a_3x3", 32, 3, 1, 0),
    ("Conv2d_2b_3x3", 64, 3, 1, 1),
]
_BN_EPS = 1e-3


def init_inception_params(seed: int = 0) -> Dict:
    rng = np.random.default_rng(seed)
    params = {}
    in_c = 3
    for name, out_c, k, _, _ in _BLOCK0:
        fan_in = in_c * k * k
        params[name] = {
            "w": jnp.asarray(rng.normal(0, np.sqrt(2.0 / fan_in), (k, k, in_c, out_c)).astype(np.float32)),
            "scale": jnp.ones((out_c,), jnp.float32),
            "bias": jnp.zeros((out_c,), jnp.float32),
            "mean": jnp.zeros((out_c,), jnp.float32),
            "var": jnp.ones((out_c,), jnp.float32),
        }
        in_c = out_c
    return params


def load_inception_weights(path: str) -> Dict:
    """Convert a torchvision inception_v3 state_dict checkpoint."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params = {}
    for name, *_ in _BLOCK0:
        g = lambda suffix: jnp.asarray(np.asarray(sd[f"{name}.{suffix}"]))
        params[name] = {
            "w": jnp.asarray(np.asarray(sd[f"{name}.conv.weight"]).transpose(2, 3, 1, 0)),
            "scale": g("bn.weight"),
            "bias": g("bn.bias"),
            "mean": g("bn.running_mean"),
            "var": g("bn.running_var"),
        }
    return params


def inception_block0(params: Dict, x: jnp.ndarray,
                     normalize_input: bool = True) -> jnp.ndarray:
    """x: (N, H, W, 3) → (N, h, w, 64) block-0 features at NATIVE resolution
    (resize_input=False like the reference's InceptionV3 wrapper).

    ``normalize_input`` maps [0,1] → [-1,1] (the visual-SIFID path); the
    tactile path passes False (its two range transforms cancel)."""
    x = x.astype(jnp.float32)
    if normalize_input:
        x = x * 2.0 - 1.0
    for name, out_c, k, stride, pad in _BLOCK0:
        p = params[name]
        x = jax.lax.conv_general_dilated(
            x, p["w"], (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = (x - p["mean"]) * jax.lax.rsqrt(p["var"] + _BN_EPS) * p["scale"] + p["bias"]
        x = jax.nn.relu(x)
    return x


_JIT_INCEPTION: Dict[object, object] = {}


def _run_block0(params: Dict, arr: np.ndarray,
                normalize_input: bool = True) -> np.ndarray:
    """Jitted, chunked block-0 features (eager full-res stacks OOM the chip).

    The chunk adapts to the image area: features at native resolution cost
    ~64·H²/4 floats, so full 1536² canvases run one image at a time while
    299² patch stacks batch 8."""
    import jax as _jax

    h, w = arr.shape[1:3]
    chunk = max(1, int(8 * (299 * 299) / (h * w)))
    key = (id(params), normalize_input)
    if key not in _JIT_INCEPTION:
        # params as an argument, not a closure constant (HLO upload size)
        jfn = _jax.jit(functools.partial(inception_block0,
                                         normalize_input=normalize_input))
        _JIT_INCEPTION[key] = lambda x: jfn(params, x)
    fn = _JIT_INCEPTION[key]
    outs = []
    for i in range(0, arr.shape[0], chunk):
        outs.append(np.asarray(fn(jnp.asarray(arr[i : i + chunk]))))
    return np.concatenate(outs) if len(outs) > 1 else outs[0]


def sifid(params: Dict, real: np.ndarray, fake: np.ndarray,
          normalize_input: bool = True) -> List[float]:
    """Single-image FID per pair.

    real/fake: (N, H, W, 3); the visual path feeds [0,1] images with
    normalize_input=True.  For each image pair, fit a Gaussian to the 64-d
    features over spatial positions and take the Fréchet distance
    (reference models/sifid.py:205-233)."""
    feats_r = _run_block0(params, np.asarray(real), normalize_input)
    feats_f = _run_block0(params, np.asarray(fake), normalize_input)
    out = []
    for fr, ff in zip(feats_r, feats_f):
        a = fr.reshape(-1, fr.shape[-1])
        b = ff.reshape(-1, ff.shape[-1])
        out.append(frechet_distance(*gaussian_stats(a), *gaussian_stats(b)))
    return out
