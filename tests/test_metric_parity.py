"""End-to-end metric-pipeline parity: the JAX metric stack vs a torch
replica of the reference's compute_evaluation_metric (tests/torch_oracle.py),
sharing ONE set of (fallback) weights — all 8 headline metrics must agree.

This pins the whole pipeline: the [-1,1]→[0,1] real-min/max rescale, the
fake clamps, nearest 224²/299² resizes, per-channel tactile tiling, the
no-maxpool/native-resolution Inception block 0, the identity tactile range
transform, and the LPIPS head/normalize arithmetic.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests.torch_oracle import (torch_compute_evaluation_metric, torch_lpips,
                                torch_sifid)  # noqa: E402
from vts_tpu.losses.lpips import init_lpips_params, lpips  # noqa: E402
from vts_tpu.metrics.evaluate import compute_evaluation_metrics  # noqa: E402
from vts_tpu.metrics.inception import init_inception_params, sifid  # noqa: E402

SIZE = 96      # native-resolution SIFID: keep the torch side CPU-cheap
K = 6          # tactile patches


def _to_nchw(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2).copy())


@pytest.fixture(scope="module")
def weights():
    # docs/WEIGHTS.md hook: point these at real torch checkpoints to re-run
    # the whole parity suite with official weights on BOTH sides
    import os
    from vts_tpu.losses.lpips import load_lpips_weights
    from vts_tpu.metrics.inception import load_inception_weights
    lp_path = os.environ.get("VTS_PARITY_LPIPS", "")
    ip_path = os.environ.get("VTS_PARITY_INCEPTION", "")
    lp = load_lpips_weights(lp_path) if lp_path else init_lpips_params(0)
    ip = load_inception_weights(ip_path) if ip_path else init_inception_params(0)
    return lp, ip


@pytest.fixture(scope="module")
def data():
    r = np.random.default_rng(0)
    real_I = r.uniform(-1, 1, (1, SIZE, SIZE, 3)).astype(np.float32)
    fake_I = np.clip(real_I + r.normal(0, 0.15, real_I.shape), -1, 1).astype(np.float32)
    real_T = r.uniform(-1, 1, (K, 32, 32, 2)).astype(np.float32)
    fake_T = np.clip(real_T + r.normal(0, 0.2, real_T.shape), -1, 1).astype(np.float32)
    return real_I, fake_I, real_T, fake_T


def test_full_metric_dict_matches_torch_oracle(weights, data):
    lp, ip = weights
    real_I, fake_I, real_T, fake_T = data

    got = compute_evaluation_metrics(
        jnp.asarray(real_I), jnp.asarray(fake_I),
        jnp.asarray(real_T), jnp.asarray(fake_T),
        lpips_params=lp, inception_params=ip, prefix="")

    want = torch_compute_evaluation_metric(
        lp, ip, _to_nchw(real_I), _to_nchw(fake_I),
        _to_nchw(real_T), _to_nchw(fake_T), prefix="")

    assert set(got) == set(want)
    for k in sorted(want):
        assert got[k] == pytest.approx(want[k], rel=1e-3, abs=1e-4), \
            f"{k}: jax={got[k]} torch={want[k]}"


def test_gloss_lpips_matches_torch_oracle(weights):
    """The G-loss LPIPS term (full-canvas fake vs real, reference
    sinskitG_model.py:497-506) — per-sample values, fp32 path."""
    lp, _ = weights
    r = np.random.default_rng(3)
    a = r.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    b = r.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(lpips(lp, jnp.asarray(a), jnp.asarray(b)))
    want = torch_lpips(lp, _to_nchw(a), _to_nchw(b)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_single_channel_lpips_broadcast(weights):
    """gx/gy patches are 1-channel; both sides must broadcast them against
    the 3-channel shift identically (the torch-broadcasting trick the
    reference leans on, tactile_patch_fid.py:177-178)."""
    lp, _ = weights
    r = np.random.default_rng(4)
    a = r.uniform(-1, 1, (3, 32, 32, 1)).astype(np.float32)
    b = r.uniform(-1, 1, (3, 32, 32, 1)).astype(np.float32)
    got = np.asarray(lpips(lp, jnp.asarray(a), jnp.asarray(b)))
    want = torch_lpips(lp, _to_nchw(a), _to_nchw(b)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_sifid_native_resolution_no_maxpool(weights):
    """SIFID features must come from block 0 at NATIVE resolution without the
    trailing maxpool (reference inception.py:23,:61-69): feature maps for an
    HxH input have spatial size (H//2 - 3), and values match torch."""
    _, ip = weights
    from vts_tpu.metrics.inception import inception_block0
    r = np.random.default_rng(5)
    x = r.uniform(0, 1, (1, 96, 96, 3)).astype(np.float32)
    f = np.asarray(inception_block0(ip, jnp.asarray(x)))
    assert f.shape[1] == 96 // 2 - 3   # 45: no maxpool, native res
    vals_j = sifid(ip, x, np.clip(x + 0.1, 0, 1))
    vals_t = torch_sifid(ip, _to_nchw(x), _to_nchw(np.clip(x + 0.1, 0, 1)))
    np.testing.assert_allclose(vals_j, vals_t, rtol=1e-3)
