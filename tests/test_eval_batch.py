"""Batched metric evaluation ≡ legacy per-sample loop.

metrics/evaluate_batch.py runs all 8 metrics' device work in one jit and
returns SIFID as Gaussian moments (sqrtm on host).  It must reproduce the
legacy eager path (which tests/test_metric_parity.py pins against the torch
oracle) — masked means over a fixed-shape stack equal the legacy
valid-subset indexing, and fp32 device moments match np.cov's f64 to ~1e-5.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vts_tpu.losses.lpips import init_lpips_params
from vts_tpu.metrics.evaluate import compute_evaluation_metrics
from vts_tpu.metrics.evaluate_batch import compute_evaluation_metrics_batched
from vts_tpu.metrics.inception import init_inception_params
from vts_tpu.ops.patch import gather_patches_from_coords

SIZE = 96
K = 6


def _data(n=2, k_valid=(6, 4)):
    r = np.random.default_rng(7)
    real_I = r.uniform(-1, 1, (n, SIZE, SIZE, 3)).astype(np.float32)
    fake_I = np.clip(real_I + r.normal(0, 0.15, real_I.shape), -1, 1).astype(np.float32)
    fake_T = r.uniform(-1, 1, (n, SIZE, SIZE, 2)).astype(np.float32)
    real_T = r.uniform(-1, 1, (n, K, 32, 32, 2)).astype(np.float32)
    coords = np.tile(np.array([[10, 20, 64, 64, 32, 1.0, 8, 8]], np.float32),
                     (K, 1))[None].repeat(n, axis=0)
    valid = np.zeros((n, K), np.float32)
    for i, kv in enumerate(k_valid):
        valid[i, :kv] = 1.0
    return real_I, fake_I, fake_T, real_T, coords, valid


@pytest.mark.slow
def test_batched_eval_matches_legacy_per_sample():
    lp = init_lpips_params(0)
    ip = init_inception_params(0)
    real_I, fake_I, fake_T, real_T, coords, valid = _data()

    batched = compute_evaluation_metrics_batched(
        real_I, fake_I, fake_T, coords, real_T, valid,
        lpips_params=lp, inception_params=ip, prefix="x_")

    for i in range(real_I.shape[0]):
        v = valid[i] > 0
        fake_T_patch = gather_patches_from_coords(
            jnp.asarray(fake_T[i : i + 1]), jnp.asarray(coords[i]), 32, 1)
        legacy = compute_evaluation_metrics(
            jnp.asarray(real_I[i : i + 1]), jnp.asarray(fake_I[i : i + 1]),
            jnp.asarray(real_T[i][v]), jnp.asarray(np.asarray(fake_T_patch)[v]),
            lpips_params=lp, inception_params=ip, prefix="x_")
        assert set(batched[i]) == set(legacy)
        for k in legacy:
            a, b = batched[i][k], legacy[k]
            assert abs(a - b) <= 2e-4 * (1 + abs(b)), (i, k, a, b)


def test_batched_eval_skips_validless_sample():
    lp = init_lpips_params(0)
    ip = init_inception_params(0)
    real_I, fake_I, fake_T, real_T, coords, valid = _data(n=2, k_valid=(3, 0))
    batched = compute_evaluation_metrics_batched(
        real_I, fake_I, fake_T, coords, real_T, valid,
        lpips_params=lp, inception_params=ip)
    assert batched[0] and batched[1] == {}
