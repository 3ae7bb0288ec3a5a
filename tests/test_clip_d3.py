"""CLIP tower + vision-aided D3 tests (fallback weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vts_tpu.losses.vision_aided import (d3_d_loss, d3_g_loss, d3_logits,
                                         init_d3_head_params)
from vts_tpu.networks.clip_vit import (clip_image_features, clip_style_code,
                                       init_clip_params)


@pytest.fixture(scope="module")
def clip_params():
    return init_clip_params(0)


def test_clip_embedding_shape_and_determinism(clip_params):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 224, 224, 3)).astype(np.float32))
    emb, taps = clip_image_features(clip_params, x, tap_layers=(3, 7, 11))
    assert emb.shape == (2, 512)
    assert len(taps) == 3 and taps[0].shape == (2, 50, 768)
    emb2 = clip_style_code(clip_params, x)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb2), rtol=1e-5)
    # different images → different codes
    y = jnp.asarray(rng.uniform(-1, 1, (2, 224, 224, 3)).astype(np.float32))
    assert not np.allclose(np.asarray(clip_style_code(clip_params, y)),
                           np.asarray(emb2))


def test_clip_resizes_nonstandard_input(clip_params):
    x = jnp.zeros((1, 64, 64, 3))
    emb, _ = clip_image_features(clip_params, x)
    assert emb.shape == (1, 512)


def test_d3_losses_finite_and_grad_flows(clip_params):
    heads = init_d3_head_params(0)
    rng = np.random.default_rng(1)
    real = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    fake = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    ld = d3_d_loss(clip_params, heads, real, fake)
    lg = d3_g_loss(clip_params, heads, fake)
    assert np.isfinite(float(ld)) and np.isfinite(float(lg))
    # generator loss must propagate to the fake image (that's its purpose)
    g = jax.grad(lambda f: d3_g_loss(clip_params, heads, f))(fake)
    assert float(jnp.max(jnp.abs(g))) > 0
    # 4 levels of logits: 3 taps + the embedding head
    assert len(d3_logits(clip_params, heads, fake)) == 4


@pytest.mark.slow
def test_fused_step_with_d3_active():
    """use_vision_aided_loss defaults True (reference sinskitG_model.py:126);
    past the warmup epoch the fused step must carry the D3 D-loss log and the
    G_D3 generator term."""
    from tests.test_models import synth_batch, tiny_opt
    from vts_tpu.models.sinskit import SinSKITModel

    opt = tiny_opt(use_vision_aided_loss=True, vision_aided_warmup_epoch=2)
    model = SinSKITModel(opt)
    batch = synth_batch(k=4, seed=7)
    model.setup(batch)

    model.set_input(batch)
    model.optimize_parameters(epoch=1)          # warmup: no D3
    warm = model.get_current_losses()
    assert "G_D3" not in warm and "D3_loss" not in warm

    model.set_input(batch)
    model.optimize_parameters(epoch=2)          # post-warmup: D3 active
    active = model.get_current_losses()
    assert np.isfinite(active["G_D3"]) and np.isfinite(active["D3_loss"])
    assert all(np.isfinite(v) for v in active.values())


@pytest.mark.slow
def test_chunked_step_crosses_d3_warmup_boundary():
    """optimize_parameters_chunk must ship the phase-scoped frozen dict
    (the D3-phase chunk crashed with KeyError('clip') when the phase came
    from stale _d3_active state — caught by the driver bench path)."""
    import sys as _sys
    import os as _os
    _sys.path.insert(0, _os.path.dirname(__file__))
    from test_models import tiny_opt, synth_batch
    from vts_tpu.models.sinskit import SinSKITModel

    opt = tiny_opt(use_vision_aided_loss=True, vision_aided_warmup_epoch=2)
    m = SinSKITModel(opt)
    b = synth_batch()
    m.setup(b)
    m.set_input(b)
    chunk = {k: np.stack([np.asarray(v)] * 2) for k, v in m._input.items()}
    m.optimize_parameters_chunk(chunk, epoch=1)
    warm = m.get_current_losses()
    m.optimize_parameters_chunk(chunk, epoch=3)
    d3 = m.get_current_losses()
    assert "D3_loss" not in warm
    assert "D3_loss" in d3 and np.isfinite(d3["D3_loss"])


@pytest.mark.slow
def test_d3_real_logit_cache_matches_in_graph():
    """Cached per-sample CLIP(real) logits (sinskit._d3_real_logits_cached)
    must reproduce the in-graph computation exactly: same D3_loss/G_D3 and
    same G update over two steps (step 2 is a cache HIT)."""
    from tests.test_models import synth_batch, tiny_opt
    from vts_tpu.models.sinskit import SinSKITModel

    def run(cached):
        opt = tiny_opt(use_vision_aided_loss=True, vision_aided_warmup_epoch=1,
                       d3_logit_cache=cached,
                       # train_d3_heads=True routes the step through the
                       # in-graph CLIP(real) branch (heads still never step —
                       # no optimizer — so values match the frozen path)
                       train_d3_heads=not cached)
        m = SinSKITModel(opt)
        batch = synth_batch(seed=11)
        if cached:
            batch["sample_idx"] = np.int64(7)
        m.setup(batch)
        m.set_input(batch)
        traj = []
        for _ in range(2):
            m.optimize_parameters(epoch=1)
            traj.append(m.get_current_losses())
        return m, traj

    a, la = run(cached=True)
    assert len(a._d3_real_cache) == 1  # one sample, cached once, hit once
    b, lb = run(cached=False)
    for sa, sb in zip(la, lb):
        assert set(sa) == set(sb)
        for k in sa:
            assert abs(sa[k] - sb[k]) <= 1e-4 * (1 + abs(sb[k])), (k, sa[k], sb[k])


@pytest.mark.slow
def test_split_chunk_keys_d3_cache_per_slice():
    """The split-mode chunk path replaces _input per slice; it must carry the
    matching _sample_key too, else the D3 real-logit cache is poisoned with
    another sample's logits (round-3 review finding)."""
    from tests.test_models import synth_batch, tiny_opt
    from vts_tpu.models.sinskit import SinSKITModel

    opt = tiny_opt(use_vision_aided_loss=True, vision_aided_warmup_epoch=1,
                   d3_logit_cache=True, step_mode="split")
    m = SinSKITModel(opt)
    b1, b2 = synth_batch(seed=1), synth_batch(seed=2)
    m.setup(b1)
    m.set_input(b1); in1 = dict(m._input)
    m.set_input(b2); in2 = dict(m._input)
    chunk = {k: np.stack([np.asarray(in1[k]), np.asarray(in2[k])])
             for k in in1}

    # no keys -> no caching (each slice computes in-graph; nothing poisoned)
    m.optimize_parameters_chunk(chunk, epoch=2)
    assert getattr(m, "_d3_real_cache", {}) == {}

    m.optimize_parameters_chunk(chunk, epoch=2, sample_keys=[(1,), (2,)])
    assert set(m._d3_real_cache) == {(1,), (2,)}
    frozen = m._frozen_args(True)
    for key, inp in [((1,), in1), ((2,), in2)]:
        direct = m._d3_logit_jit(frozen["clip"], frozen["d3"], inp["I"])
        for a, b in zip(m._d3_real_cache[key], direct):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_fused_chunk_injected_d3_logits_match_in_graph():
    """With sample_keys, the fused scan chunk ships cached CLIP(real) logits
    as step inputs instead of recomputing them in-graph every step — losses
    must match the in-graph chunk to fp32 tolerance."""
    from tests.test_models import synth_batch, tiny_opt
    from vts_tpu.models.sinskit import SinSKITModel

    def run(keys):
        opt = tiny_opt(use_vision_aided_loss=True, vision_aided_warmup_epoch=1,
                       d3_logit_cache=True)
        m = SinSKITModel(opt)
        b = synth_batch(seed=5)
        m.setup(b)
        m.set_input(b)
        chunk = {k: np.stack([np.asarray(v)] * 2) for k, v in m._input.items()}
        m.optimize_parameters_chunk(chunk, epoch=2, sample_keys=keys)
        return m.get_current_losses()

    ref = run(None)                 # in-graph real logits
    inj = run([(7,), (7,)])         # injected cached logits
    assert "D3_loss" in ref and "D3_loss" in inj
    for k in ref:
        np.testing.assert_allclose(inj[k], ref[k], rtol=2e-2, atol=2e-3,
                                   err_msg=k)
