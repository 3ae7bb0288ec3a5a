"""Equivalence: cached real-canvas VGG taps ≡ in-graph recompute.

The --lpips_tap_cache path feeds the CONSTANT real canvas's precomputed VGG
taps (losses/lpips.py lpips_y_taps) into the fused step as loop-invariant
args instead of recomputing the LPIPS y-branch forward every step (the
reference recomputes it every step, sinskitG_model.py:497-506).  The taps
are produced by the same jitted tap function on the same input, so the
step's losses must track the recomputing step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_models import synth_batch, tiny_opt
from vts_tpu.losses.lpips import init_lpips_params, lpips, lpips_y_taps
from vts_tpu.models.sinskit import SinSKITModel


def test_lpips_y_taps_matches_inline():
    """lpips(x, y, y_taps=lpips_y_taps(y)) == lpips(x, y, y_no_grad=True)."""
    params = init_lpips_params(0)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
    for fold in (1, 2):
        ref = lpips(params, x, y, y_no_grad=True, fold=fold)
        taps = lpips_y_taps(params, y, fold=fold)
        got = lpips(params, x, y, y_no_grad=True, fold=fold, y_taps=taps)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-7)
        # gradient wrt x must agree too (the y branch carries none)
        g_ref = jax.grad(lambda a: jnp.sum(
            lpips(params, a, y, y_no_grad=True, fold=fold)))(x)
        g_got = jax.grad(lambda a: jnp.sum(
            lpips(params, a, y, y_no_grad=True, fold=fold, y_taps=taps)))(x)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-6)


def test_lpips_y_taps_shape_mismatch_raises():
    params = init_lpips_params(0)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    taps = lpips_y_taps(params, jnp.zeros((1, 32, 32, 3), jnp.float32))
    with pytest.raises(ValueError, match="y_taps shapes"):
        lpips(params, x, x, y_no_grad=True, y_taps=taps)


def _run_chunk(tap_cache: bool, steps: int = 3):
    opt = tiny_opt(lambda_G1_lpips=1.0, lambda_G2_lpips=10.0,
                   lpips_tap_cache=tap_cache, lpips_fold=2, lpips_crop=0)
    model = SinSKITModel(opt)
    batch = dict(synth_batch(seed=7), sample_idx=np.int64(0))
    model.setup(batch)
    model.set_input(batch)
    key = model._sample_key
    assert key is not None
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * steps), model._input)
    model.optimize_parameters_chunk(stacked, epoch=1,
                                    sample_keys=[key] * steps)
    losses = model.get_current_losses()
    if tap_cache:
        # the cache must actually have fired (1-entry device cache filled)
        assert getattr(model, "_lpips_tap_cache_kv", (None,))[0] == key
    return losses


@pytest.mark.slow
def test_fused_chunk_tap_cache_equivalence():
    """Chunked fused-step losses agree with and without the tap cache."""
    ref = _run_chunk(tap_cache=False)
    got = _run_chunk(tap_cache=True)
    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=2e-4, atol=2e-4,
                                   err_msg=f"loss {k}")
