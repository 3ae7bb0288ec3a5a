"""Folded (space-to-depth) CustomUNet forward ≡ the standard flax forward.

networks/folded.py re-expresses the top U-Net levels on (N,H/b,W/b,b²C)
tensors with in-graph scatter-built block kernels; it must be numerically
equivalent to CustomUNet.apply on the SAME parameter tree.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vts_tpu.networks.folded import (fold, folded_unet_apply, unfold,
                                     folded_conv4x4_s2, folded_convT4x4_s2)
from vts_tpu.networks.unet_custom import CustomUNet


def test_fold_unfold_roundtrip():
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(2, 32, 32, 5)).astype(np.float32))
    for b in (2, 4, 8):
        assert np.array_equal(np.asarray(unfold(fold(x, b), b, 5)), np.asarray(x))


@pytest.mark.parametrize("b_in", [2, 4, 8])
def test_folded_conv_matches_lax(b_in):
    r = np.random.default_rng(1)
    ci, co, h = 3, 5, 32
    x = jnp.asarray(r.normal(size=(1, h, h, ci)).astype(np.float32))
    w = jnp.asarray(r.normal(size=(4, 4, ci, co)).astype(np.float32))
    bias = jnp.asarray(r.normal(size=(co,)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    got = unfold(folded_conv4x4_s2(fold(x, b_in), w, bias, b_in, jnp.float32),
                 b_in // 2, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("b_in", [1, 2, 4])
def test_folded_convT_matches_lax(b_in):
    r = np.random.default_rng(2)
    ci, co, h = 4, 3, 16
    x = jnp.asarray(r.normal(size=(1, h, h, ci)).astype(np.float32))
    w = jnp.asarray(r.normal(size=(4, 4, ci, co)).astype(np.float32))
    bias = jnp.asarray(r.normal(size=(co,)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    got = unfold(folded_convT4x4_s2(fold(x, b_in), w, bias, b_in, jnp.float32),
                 2 * b_in, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("foldf", [2, 4, 8])
def test_folded_unet_matches_flax(foldf):
    net = CustomUNet(ngf=4, num_downs=8, num_layer_separate=4,
                     norm_type="instance", train=True)
    r = np.random.default_rng(3)
    x = jnp.asarray(r.uniform(-1, 1, (1, 256, 256, 9)).astype(np.float32))
    params = net.init(jax.random.key(0), jnp.zeros_like(x))["params"]
    ref = net.apply({"params": params}, x)
    got = folded_unet_apply(params, x, ngf=4, num_downs=8,
                            num_layer_separate=4, canvas_fold=foldf)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_unfold2_is_exact_block_peel():
    """unfold2(fold-2b) ≡ unfold to pixels then re-fold at b."""
    from vts_tpu.networks.folded import unfold2
    r = np.random.default_rng(7)
    for b in (1, 2, 4):
        c = 3
        x = jnp.asarray(r.normal(size=(2, 24, 24, c)).astype(np.float32))
        xf = fold(x, 2 * b)                       # (2, 24/2b, ·, (2b)²c)
        got = unfold2(xf, b, c)                   # (2, 24/b, ·, b²c)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(fold(x, b)))


@pytest.mark.parametrize("t_mult,foldf", [
    (2, 8),                                           # the shipped ×2 config
    pytest.param(2, 2, marks=pytest.mark.slow),
    pytest.param(4, 8, marks=pytest.mark.slow),       # the shipped ×4 config
    pytest.param(4, 2, marks=pytest.mark.slow),
])
def test_folded_unet_t_mult_matches_flax(t_mult, foldf):
    """Folded tactile super-resolution forward ≡ CustomUNet(t_mult) — the
    extra up0_T_extra{j} stages run fold-preserving (convT b→2b + unfold2)."""
    net = CustomUNet(ngf=4, num_downs=8, num_layer_separate=4,
                     norm_type="instance", train=True, t_mult=t_mult)
    r = np.random.default_rng(5)
    x = jnp.asarray(r.uniform(-1, 1, (1, 256, 256, 9)).astype(np.float32))
    params = net.init(jax.random.key(0), jnp.zeros_like(x))["params"]
    ref_vis, ref_tac = net.apply({"params": params}, x)
    got_vis, got_tac = folded_unet_apply(
        params, x, ngf=4, num_downs=8, num_layer_separate=4,
        canvas_fold=foldf, t_mult=t_mult)
    assert got_vis.shape == ref_vis.shape
    assert got_tac.shape == ref_tac.shape == (1, 256 * t_mult, 256 * t_mult, 2)
    np.testing.assert_allclose(np.asarray(got_vis), np.asarray(ref_vis),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_tac), np.asarray(ref_tac),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("n_style", [
    1,   # the reference's shipped default: ONE injection level
         # (skitG_model.py:274) — the parity config
    pytest.param(-1, marks=pytest.mark.slow),
    pytest.param(3, marks=pytest.mark.slow),
])
def test_folded_unet_style_code_matches_flax(n_style):
    """Folded tile+concat style injection ≡ CustomUNet at every
    num_layer_style_code config, incl. the reference default 1
    (reference style hooks: models/networks.py:1600-1633)."""
    net = CustomUNet(ngf=4, num_downs=8, num_layer_separate=4,
                     norm_type="instance", train=True, use_style_code=True,
                     style_code_dim=16, style_code_mode="concat",
                     style_code_mapping_mode="tile",
                     num_layer_style_code=n_style)
    r = np.random.default_rng(8)
    x = jnp.asarray(r.uniform(-1, 1, (1, 256, 256, 9)).astype(np.float32))
    sc = jnp.asarray(r.normal(size=(1, 16)).astype(np.float32))
    params = net.init(jax.random.key(0), jnp.zeros_like(x), sc)["params"]
    ref = net.apply({"params": params}, x, sc)
    got = folded_unet_apply(params, x, sc, ngf=4, num_downs=8,
                            num_layer_separate=4, canvas_fold=8,
                            num_layer_style_code=n_style)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
    # the style path is live: a different code must change the output
    got2 = folded_unet_apply(params, x, sc + 1.0, ngf=4, num_downs=8,
                             num_layer_separate=4, canvas_fold=8,
                             num_layer_style_code=n_style)
    assert float(jnp.max(jnp.abs(got2 - got))) > 1e-4


@pytest.mark.slow
def test_folded_unet_style_t_mult_matches_flax():
    """skitG style injection composed with tactile super-resolution: the
    up0_T_extra stages consume the style-concatenated fork at level 0."""
    net = CustomUNet(ngf=4, num_downs=8, num_layer_separate=4,
                     norm_type="instance", train=True, use_style_code=True,
                     style_code_dim=16, style_code_mode="concat",
                     style_code_mapping_mode="tile", t_mult=2)
    r = np.random.default_rng(9)
    x = jnp.asarray(r.uniform(-1, 1, (1, 256, 256, 9)).astype(np.float32))
    sc = jnp.asarray(r.normal(size=(1, 16)).astype(np.float32))
    params = net.init(jax.random.key(0), jnp.zeros_like(x), sc)["params"]
    ref_v, ref_t = net.apply({"params": params}, x, sc)
    got_v, got_t = folded_unet_apply(params, x, sc, ngf=4, num_downs=8,
                                     num_layer_separate=4, canvas_fold=8,
                                     t_mult=2)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_folded_unet_t_mult_gradients_match():
    """Parameter gradients through the folded t_mult path ≡ flax — incl. the
    up0_T_extra stages' own kernels (the unfold2 permute must be linear-exact
    under transposition)."""
    t_mult = 2
    net = CustomUNet(ngf=2, num_downs=8, num_layer_separate=4,
                     norm_type="instance", train=True, t_mult=t_mult)
    r = np.random.default_rng(6)
    x = jnp.asarray(r.uniform(-1, 1, (1, 256, 256, 9)).astype(np.float32))
    params = net.init(jax.random.key(0), jnp.zeros_like(x))["params"]
    tgt_v = jnp.asarray(r.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32))
    tgt_t = jnp.asarray(
        r.uniform(-1, 1, (1, 256 * t_mult, 256 * t_mult, 2)).astype(np.float32))

    def loss_ref(p):
        v, t = net.apply({"params": p}, x)
        return jnp.mean(jnp.abs(v - tgt_v)) + jnp.mean(jnp.abs(t - tgt_t))

    def loss_fold(p):
        v, t = folded_unet_apply(p, x, ngf=2, num_downs=8,
                                 num_layer_separate=4, canvas_fold=8,
                                 t_mult=t_mult)
        return jnp.mean(jnp.abs(v - tgt_v)) + jnp.mean(jnp.abs(t - tgt_t))

    g_ref = jax.grad(loss_ref)(params)
    g_fold = jax.grad(loss_fold)(params)

    def chk(path, a, bb):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   rtol=2e-3, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(path))
    jax.tree_util.tree_map_with_path(chk, g_ref, g_fold)


@pytest.mark.slow
def test_folded_unet_gradients_match():
    net = CustomUNet(ngf=2, num_downs=8, num_layer_separate=4,
                     norm_type="instance", train=True)
    r = np.random.default_rng(4)
    x = jnp.asarray(r.uniform(-1, 1, (1, 256, 256, 9)).astype(np.float32))
    params = net.init(jax.random.key(0), jnp.zeros_like(x))["params"]
    tgt = jnp.asarray(r.uniform(-1, 1, (1, 256, 256, 5)).astype(np.float32))

    g_ref = jax.grad(lambda p: jnp.mean(
        jnp.abs(net.apply({"params": p}, x) - tgt)))(params)
    g_fold = jax.grad(lambda p: jnp.mean(jnp.abs(folded_unet_apply(
        p, x, ngf=2, num_downs=8, num_layer_separate=4, canvas_fold=8)
        - tgt)))(params)
    def chk(path, a, bb):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   rtol=2e-3, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(path))
    jax.tree_util.tree_map_with_path(chk, g_ref, g_fold)
