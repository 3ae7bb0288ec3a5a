"""Split-stage step ≡ fused step (models/sinskit_split.py vs sinskit.py).

The split mode re-linearizes the G forward at the same parameter point and
accumulates per-loss-term cotangents; by linearity of the adjoint this equals
the fused step's joint value_and_grad through the retained vjp.  Verified at
float64 the two gradient paths are BITWISE identical (see the round-3
RESULTS.md note).

Tolerance design: post-Adam parameter comparison is sign-amplified — with
beta1=0 the first Adam step is ≈ ±lr for EVERY parameter (m/√v = g/|g|), so a
last-ulp fp32 compilation difference on a near-zero gradient component flips
that component's update by 2·lr.  The random-VGG G1-LPIPS term has many such
near-zero components, so configs including it are pinned by loss
trajectories (which a materially wrong gradient would derail) while the
remaining terms — whose fp32 gradients match to ≤1e-10 — are pinned at the
parameter level.
"""

import numpy as np
import pytest

import jax

from tests.test_models import synth_batch, tiny_opt
from vts_tpu.models.sinskit import SinSKITModel


def _max_param_diff(a, b):
    return max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda x, y: float(np.max(np.abs(np.asarray(x, np.float32)
                                         - np.asarray(y, np.float32)))), a, b)))


def _run(mode, steps=2, epoch=1, seed=3, **opt_kw):
    opt = tiny_opt(step_mode=mode, **opt_kw)
    model = SinSKITModel(opt)
    batch = synth_batch(seed=seed)
    model.setup(batch)
    model.set_input(batch)
    traj = []
    for _ in range(steps):
        model.optimize_parameters(epoch=epoch)
        traj.append(model.get_current_losses())
    return model, traj


# every G-gradient path except the near-zero-gradient G1-LPIPS term: fp32
# gradients match to ≤1e-10, so params match through Adam
EXACT_CFG = dict(lambda_G1_lpips=0.0, lambda_G2_lpips=10.0,
                 use_more_fakeT=True, use_diffaug=True)
# everything on — pinned via loss trajectory
FULL_CFG = dict(lambda_G1_lpips=1.0, lambda_G2_lpips=10.0,
                use_more_fakeT=True, use_diffaug=True)


@pytest.mark.slow
def test_split_step_matches_fused_params_exact_terms():
    fused, l_f = _run("fused", **EXACT_CFG)
    split, l_s = _run("split", **EXACT_CFG)
    assert set(l_f[-1]) == set(l_s[-1]), (set(l_f[-1]) ^ set(l_s[-1]))
    for k in l_f[-1]:
        assert abs(l_f[-1][k] - l_s[-1][k]) <= 1e-4 * (1 + abs(l_f[-1][k])), \
            (k, l_f[-1][k], l_s[-1][k])
    for name in ("G", "D", "D2"):
        d = _max_param_diff(fused.states[name].params, split.states[name].params)
        assert d < 5e-5, (name, d)


@pytest.mark.slow
def test_split_step_matches_fused_full_trajectory():
    fused, l_f = _run("fused", steps=3, **FULL_CFG)
    split, l_s = _run("split", steps=3, **FULL_CFG)
    for step_f, step_s in zip(l_f, l_s):
        assert set(step_f) == set(step_s)
        for k in step_f:
            assert abs(step_f[k] - step_s[k]) <= 2e-3 * (1 + abs(step_f[k])), \
                (k, step_f[k], step_s[k])


@pytest.mark.slow
def test_split_step_rng_chain_matches_fused():
    # the key fan-out must match so diffaug/more-fake draws are identical:
    # after N steps both modes hold the same successor key
    fused, _ = _run("fused", steps=2, **FULL_CFG)
    split, _ = _run("split", steps=2, **FULL_CFG)
    kf = jax.random.key_data(fused._rng_dev)
    ks = jax.random.key_data(split._rng_dev)
    assert np.array_equal(np.asarray(kf), np.asarray(ks))


@pytest.mark.slow
def test_split_step_matches_fused_wgangp():
    cfg = dict(gan_mode="wgangp", use_more_fakeT=True, lambda_G1_lpips=0.0,
               lambda_G2_lpips=0.0)
    fused, l_f = _run("fused", steps=1, **cfg)
    split, l_s = _run("split", steps=1, **cfg)
    for k in l_f[-1]:
        assert abs(l_f[-1][k] - l_s[-1][k]) <= 1e-4 * (1 + abs(l_f[-1][k])), \
            (k, l_f[-1][k], l_s[-1][k])
    for name in ("G", "D", "D2"):
        d = _max_param_diff(fused.states[name].params, split.states[name].params)
        assert d < 5e-5, (name, d)


@pytest.mark.slow
def test_split_step_matches_fused_with_d3():
    # D3 active from epoch 1: exercises the shared-CLIP(fake) restructure on
    # both paths (fused reuses the G-loss fake logits for the D3_loss log;
    # split runs stage_d3_cot) — loss values must agree between modes
    cfg = dict(use_vision_aided_loss=True, vision_aided_warmup_epoch=1,
               lambda_G1_lpips=0.0)
    fused, l_f = _run("fused", steps=1, **cfg)
    split, l_s = _run("split", steps=1, **cfg)
    assert "D3_loss" in l_f[-1] and "G_D3" in l_f[-1]
    for k in l_f[-1]:
        assert abs(l_f[-1][k] - l_s[-1][k]) <= 1e-3 * (1 + abs(l_f[-1][k])), \
            (k, l_f[-1][k], l_s[-1][k])


@pytest.mark.slow
def test_split_chunk_path_matches_per_step():
    # optimize_parameters_chunk in split mode slices the stacked chunk and
    # must equal the same steps dispatched one by one
    import jax.numpy as jnp
    opt = tiny_opt(step_mode="split")
    a = SinSKITModel(opt)
    batch = synth_batch(seed=5)
    a.setup(batch)
    a.set_input(batch)
    stacked = {k: jnp.stack([v, v]) for k, v in a._input.items()}
    a.optimize_parameters_chunk(stacked, epoch=1)

    b = SinSKITModel(tiny_opt(step_mode="split"))
    b.setup(batch)
    b.set_input(batch)
    for _ in range(2):
        b._input = dict(b._input)
        b.optimize_parameters(epoch=1)
    d = _max_param_diff(a.states["G"].params, b.states["G"].params)
    assert d < 1e-6, d
