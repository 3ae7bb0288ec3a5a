"""Batched epoch-end evaluation: ONE jitted device pass per coord-set.

The legacy path (`evaluate.compute_evaluation_metrics`, kept as the oracle
surface) dispatches each metric eagerly per sample — dozens of chunked
device chains with host syncs in between, which on a tunneled backend costs
~30 min per epoch (every sync is a network round-trip; RESULTS.md round 2).
Here the device-side work of all 8 metrics runs in one jit over the whole
sample batch and the host fetches ONE small pytree:

  * direct metrics (I_LPIPS/I_PSNR/I_SSIM/T_LPIPS/T_AE/T_MSE) come back as
    per-sample scalars, valid-mask-weighted exactly like the legacy
    subset-indexing (all patches share one shape, so masked means equal
    subset means);
  * SIFID comes back as per-pair Gaussian MOMENTS (mu, sigma) — the only
    non-jittable piece, `scipy.linalg.sqrtm`, runs on host over 64×64
    matrices (sub-ms each), exactly the split the reference makes
    (models/sifid.py:102-153 on host features).

Numerics: feature moments accumulate in fp32 on device (the legacy np.cov
upcasts to f64) — differences land at ~1e-6 relative; `tests/test_eval_batch.py`
pins batched ≡ legacy per-sample loop.

The gather of fake_T patches from the canvas happens inside the jit (same
`gather_patches_from_coords` op the train step uses).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..losses.lpips import lpips as _lpips
from ..losses.normal import surface_normal_angle_error
from ..ops.normal import compute_normal
from ..ops.patch import gather_patches_from_coords
from ..ops.resize import resize_nearest
from .evaluate import DEFAULT_EVAL_METRICS
from .frechet import frechet_distance
from .inception import inception_block0


def _moments(feats: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(P, C) spatial features → (mu (C,), sigma (C, C)) with np.cov's n-1
    normalization."""
    x = feats.astype(jnp.float32)
    n = x.shape[0]
    mu = jnp.mean(x, axis=0)
    xc = x - mu
    sigma = (xc.T @ xc) / jnp.maximum(n - 1, 1)
    return mu, sigma


def _device_pass(lpips_params, inception_params, real_I, fake_I, fake_T,
                 coords, real_T, valid, mult: int,
                 eval_metrics: Tuple[str, ...]):
    """All device-side metric work for a batch.  Shapes:
    real_I/fake_I (N,H,W,3); fake_T (N,Hm,Wm,2); coords (N,K,8);
    real_T (N,K,pc,pc,2); valid (N,K)."""
    out: Dict[str, jnp.ndarray] = {}
    n = real_I.shape[0]
    k = real_T.shape[1]
    pc = real_T.shape[2]
    cnt = jnp.maximum(jnp.sum(valid, axis=1), 1.0)          # (N,)

    if "I_LPIPS" in eval_metrics:
        out["I_LPIPS"] = _lpips(lpips_params, real_I, fake_I)  # (N,)

    # rescale with the real image's per-sample range; clamp fake
    i_min = jnp.min(real_I, axis=(1, 2, 3), keepdims=True)
    i_max = jnp.max(real_I, axis=(1, 2, 3), keepdims=True)
    real_In = (real_I - i_min) / (i_max - i_min)
    fake_In = jnp.clip((fake_I - i_min) / (i_max - i_min), 0.0, 1.0)

    if "I_SIFID" in eval_metrics:
        fr = inception_block0(inception_params, real_In, normalize_input=True)
        ff = inception_block0(inception_params, fake_In, normalize_input=True)
        mr, sr = jax.vmap(lambda t: _moments(t.reshape(-1, t.shape[-1])))(fr)
        mf, sf = jax.vmap(lambda t: _moments(t.reshape(-1, t.shape[-1])))(ff)
        out["I_SIFID_moments"] = (mr, sr, mf, sf)
    if "I_PSNR" in eval_metrics:
        from .psnr_ssim import psnr
        out["I_PSNR"] = jax.vmap(lambda a, b: psnr(a[None], b[None]))(real_In, fake_In)
    if "I_SSIM" in eval_metrics:
        from .psnr_ssim import ssim
        out["I_SSIM"] = jax.vmap(lambda a, b: ssim(a[None], b[None]))(real_In, fake_In)

    # ---- tactile ----
    fake_T_patch = jax.vmap(
        lambda img, c: gather_patches_from_coords(img[None], c, 32, mult)
    )(fake_T, coords)                                        # (N, K, pc, pc, 2)
    fake_Tc = jnp.clip(fake_T_patch, 0.0, 1.0)  # reference quirk (model_utils.py:521)
    rT = real_T.reshape(n * k, pc, pc, 2)
    fT = fake_Tc.reshape(n * k, pc, pc, 2)

    if "T_LPIPS" in eval_metrics:
        r224 = resize_nearest(rT, (224, 224))
        f224 = resize_nearest(fT, (224, 224))
        gx = _lpips(lpips_params, f224[..., 0:1], r224[..., 0:1]).reshape(n, k)
        gy = _lpips(lpips_params, f224[..., 1:2], r224[..., 1:2]).reshape(n, k)
        out["T_LPIPS"] = (jnp.sum(gx * valid, axis=1)
                          + jnp.sum(gy * valid, axis=1)) / cnt

    if "T_AE" in eval_metrics:
        fn_ = compute_normal(fT, scale_nz=1.0)
        rn_ = compute_normal(rT, scale_nz=1.0)
        ae = surface_normal_angle_error(rn_, fn_, mode="evaluate")
        per_patch = jnp.mean(ae.reshape(n, k, -1), axis=-1)
        out["T_AE"] = jnp.sum(per_patch * valid, axis=1) / cnt

    if "T_SIFID" in eval_metrics:
        r299 = resize_nearest(rT, (299, 299))
        f299 = resize_nearest(fT, (299, 299))
        moms = []
        for ch in (0, 1):
            tile3 = lambda x: jnp.tile(x[..., ch : ch + 1], (1, 1, 1, 3))
            fr = inception_block0(inception_params, tile3(r299),
                                  normalize_input=False)
            ff = inception_block0(inception_params, tile3(f299),
                                  normalize_input=False)
            mom = lambda t: jax.vmap(
                lambda u: _moments(u.reshape(-1, u.shape[-1])))(t)
            moms.append((mom(fr), mom(ff)))                  # ((NK,64),(NK,64,64))×2
        out["T_SIFID_moments"] = moms

    if "T_MSE" in eval_metrics:
        per_patch = jnp.mean((real_T - fake_Tc) ** 2, axis=(2, 3, 4))
        out["T_MSE"] = jnp.sum(per_patch * valid, axis=1) / cnt

    return out


_JIT_CACHE: Dict[tuple, object] = {}


def compute_evaluation_metrics_batched(
    real_I, fake_I, fake_T, coords, real_T, valid,
    eval_metrics: Sequence[str] = DEFAULT_EVAL_METRICS,
    lpips_params: Optional[dict] = None,
    inception_params: Optional[dict] = None,
    mult: int = 1,
    prefix: str = "",
) -> List[Dict[str, float]]:
    """One device dispatch + one host fetch for a whole sample batch.

    Inputs are the batch-shaped arrays (see _device_pass).  Returns a list
    of per-sample metric dicts with the legacy key naming
    (``metric_{prefix}{name}``); samples whose valid-mask is empty return {}
    (the legacy loop skips them).
    """
    em = tuple(eval_metrics)
    key = (id(lpips_params), id(inception_params), em, int(mult))
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = jax.jit(functools.partial(
            _device_pass, mult=int(mult), eval_metrics=em))
    dev = _JIT_CACHE[key](lpips_params, inception_params,
                          jnp.asarray(real_I), jnp.asarray(fake_I),
                          jnp.asarray(fake_T), jnp.asarray(coords),
                          jnp.asarray(real_T), jnp.asarray(valid))
    host = jax.tree_util.tree_map(np.asarray, dev)           # ONE sync

    n, k = np.asarray(valid).shape
    valid_np = np.asarray(valid) > 0
    results: List[Dict[str, float]] = []
    for i in range(n):
        if valid_np[i].sum() == 0:
            # the legacy per-sample loop skips valid-less samples entirely
            results.append({})
            continue
        res: Dict[str, float] = {}
        keyf = lambda name: f"metric_{prefix}{name}"
        for name in ("I_LPIPS", "I_PSNR", "I_SSIM", "T_LPIPS", "T_AE", "T_MSE"):
            if name in host:
                res[keyf(name)] = float(host[name][i])
        if "I_SIFID_moments" in host:
            mr, sr, mf, sf = host["I_SIFID_moments"]
            res[keyf("I_SIFID")] = frechet_distance(
                mr[i].astype(np.float64), sr[i].astype(np.float64),
                mf[i].astype(np.float64), sf[i].astype(np.float64))
        if "T_SIFID_moments" in host:
            vals = []
            for (mrs, srs), (mfs, sfs) in [
                    ((host["T_SIFID_moments"][ch][0][0],
                      host["T_SIFID_moments"][ch][0][1]),
                     (host["T_SIFID_moments"][ch][1][0],
                      host["T_SIFID_moments"][ch][1][1]))
                    for ch in (0, 1)]:
                per_patch = [
                    frechet_distance(
                        mrs[i * k + j].astype(np.float64),
                        srs[i * k + j].astype(np.float64),
                        mfs[i * k + j].astype(np.float64),
                        sfs[i * k + j].astype(np.float64))
                    for j in range(k) if valid_np[i, j]]
                vals.append(np.asarray(per_patch))
            res[keyf("T_SIFID")] = float(np.mean((vals[0] + vals[1]) / 2.0))
        results.append(res)
    return results
