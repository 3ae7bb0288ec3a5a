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
