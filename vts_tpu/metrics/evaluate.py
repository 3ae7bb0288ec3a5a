"""Aggregate evaluation — JAX mirror of ``compute_evaluation_metric``
(reference models/model_utils.py:431-561), quirks preserved deliberately:

  * visual images are rescaled to [0,1] with the *real* image's min/max and
    the fake is clamped (model_utils.py:483-488);
  * the fake tactile stack is clamped to [0,1] before T metrics — even though
    tactile range is [-1,1] — matching model_utils.py:521;
  * T_LPIPS resizes patches to 224² with nearest interpolation
    (F.interpolate default, model_utils.py:522-525) and runs per-channel
    LPIPS on gx/gy independently, averaged;
  * T_SIFID tiles each channel to RGB at 299² and averages gx/gy SIFIDs;
    its convert2tensor(vmin=-1,vmax=1) + normalize_input transforms cancel,
    so the tactile values enter the Inception convs untransformed
    (sifid.py:180-203 ∘ inception.py:134-135 = identity);
  * SIFID features come from Inception block 0 WITHOUT the trailing maxpool
    and WITHOUT input resize — the visual SIFID runs at the full canvas
    resolution (inception.py:23, :61-69).

Returned keys use the reference naming: ``metric_{prefix}{name}``.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..losses.lpips import lpips as _lpips_raw
from ..ops.normal import compute_normal
from ..losses.normal import surface_normal_angle_error
from ..ops.resize import resize_nearest
from .inception import sifid
from .psnr_ssim import psnr, ssim
from .tactile_fid import tactile_patch_fid

DEFAULT_EVAL_METRICS = (
    "I_SIFID", "I_LPIPS", "I_PSNR", "I_SSIM",
    "T_SIFID", "T_LPIPS", "T_AE", "T_MSE",
)

_LPIPS_CHUNK = 16  # metric batches run jitted in fixed chunks (memory-bounded)


@functools.lru_cache(maxsize=8)
def _jitted_lpips(params_id: int, h: int, w: int, c: int):
    # params ride as an argument (closure constants embed the VGG weights in
    # the HLO — remote-compile upload size + value-keyed compile cache)
    params = _JIT_PARAMS[params_id]
    fn = jax.jit(_lpips_raw)
    return lambda a, b: fn(params, a, b)


_JIT_PARAMS: Dict[int, dict] = {}


def lpips(params, x, y):
    """Chunked, jitted LPIPS for metric evaluation — eager op-by-op execution
    of a 224²-patch stack materializes every VGG intermediate and OOMs the
    chip; fixed-chunk jit keeps peak memory bounded."""
    _JIT_PARAMS[id(params)] = params
    fn = _jitted_lpips(id(params), x.shape[1], x.shape[2], x.shape[3])
    n = x.shape[0]
    outs = []
    for i in range(0, n, _LPIPS_CHUNK):
        xa = jnp.asarray(x[i : i + _LPIPS_CHUNK])
        ya = jnp.asarray(y[i : i + _LPIPS_CHUNK])
        pad = _LPIPS_CHUNK - xa.shape[0]
        if pad and n > _LPIPS_CHUNK:  # keep one jit shape for full chunks
            xa = jnp.pad(xa, ((0, pad), (0, 0), (0, 0), (0, 0)))
            ya = jnp.pad(ya, ((0, pad), (0, 0), (0, 0), (0, 0)))
            outs.append(np.asarray(fn(xa, ya))[: _LPIPS_CHUNK - pad])
        else:
            outs.append(np.asarray(fn(xa, ya)))
    return np.concatenate(outs) if len(outs) > 1 else outs[0]


def compute_evaluation_metrics(
    real_I: jnp.ndarray,
    fake_I: jnp.ndarray,
    real_T: Optional[jnp.ndarray] = None,
    fake_T: Optional[jnp.ndarray] = None,
    eval_metrics: Sequence[str] = DEFAULT_EVAL_METRICS,
    lpips_params: Optional[dict] = None,
    inception_params: Optional[dict] = None,
    prefix: str = "",
) -> Dict[str, float]:
    out: Dict[str, float] = {}
    key = lambda name: f"metric_{prefix}{name}"

    if "I_LPIPS" in eval_metrics:
        out[key("I_LPIPS")] = float(np.mean(np.asarray(lpips(lpips_params, real_I, fake_I))))

    # rescale with the real image's range; clamp fake
    i_min = jnp.min(real_I)
    i_max = jnp.max(real_I)
    real_In = (real_I - i_min) / (i_max - i_min)
    fake_In = jnp.clip((fake_I - i_min) / (i_max - i_min), 0.0, 1.0)

    if "I_SIFID" in eval_metrics:
        vals = sifid(inception_params, np.asarray(real_In), np.asarray(fake_In))
        out[key("I_SIFID")] = float(vals[0] if len(vals) == 1 else np.mean(vals))
    if "I_PSNR" in eval_metrics:
        out[key("I_PSNR")] = float(psnr(real_In, fake_In, data_range=1.0))
    if "I_SSIM" in eval_metrics:
        out[key("I_SSIM")] = float(ssim(real_In, fake_In, data_range=1.0))

    if real_T is None or fake_T is None:
        return out

    fake_Tc = jnp.clip(fake_T, 0.0, 1.0)  # reference quirk (model_utils.py:521)

    if "T_LPIPS" in eval_metrics:
        r224 = resize_nearest(real_T, (224, 224))
        f224 = resize_nearest(fake_Tc, (224, 224))
        gx = np.mean(np.asarray(lpips(lpips_params, f224[..., 0:1], r224[..., 0:1])))
        gy = np.mean(np.asarray(lpips(lpips_params, f224[..., 1:2], r224[..., 1:2])))
        out[key("T_LPIPS")] = float(gx + gy)

    if "T_AE" in eval_metrics:
        fn = compute_normal(fake_Tc, scale_nz=1.0)
        rn = compute_normal(real_T, scale_nz=1.0)
        ae = surface_normal_angle_error(rn, fn, mode="evaluate")
        out[key("T_AE")] = float(jnp.mean(ae))

    if "T_FID" in eval_metrics:
        out[key("T_FID")] = tactile_patch_fid(np.asarray(real_T), np.asarray(fake_Tc))

    if "T_SIFID" in eval_metrics:
        r299 = resize_nearest(real_T, (299, 299))
        f299 = resize_nearest(fake_Tc, (299, 299))
        tile3 = lambda x, c: jnp.tile(x[..., c : c + 1], (1, 1, 1, 3))
        gx = sifid(inception_params, np.asarray(tile3(r299, 0)),
                   np.asarray(tile3(f299, 0)), normalize_input=False)
        gy = sifid(inception_params, np.asarray(tile3(r299, 1)),
                   np.asarray(tile3(f299, 1)), normalize_input=False)
        out[key("T_SIFID")] = float(np.mean((np.asarray(gx) + np.asarray(gy)) / 2.0))

    if "T_MSE" in eval_metrics:
        out[key("T_MSE")] = float(jnp.mean((real_T - fake_Tc) ** 2))

    return out
