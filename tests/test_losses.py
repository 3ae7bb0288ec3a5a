"""Loss-function tests: reference-exact reductions and golden values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vts_tpu.losses.gan import (feature_matching_loss, gan_loss,
                                gradient_penalty, reduce_d,
                                reduce_g2_patch_sum)
from vts_tpu.losses.lpips import init_lpips_params, lpips
from vts_tpu.losses.normal import surface_normal_angle_error
from vts_tpu.ops.normal import compute_normal


def test_lsgan_golden():
    pred = jnp.asarray([[1.0], [0.0]])
    assert float(gan_loss(pred, True, "lsgan")) == pytest.approx(0.5)   # mean((p-1)^2)
    assert float(gan_loss(pred, False, "lsgan")) == pytest.approx(0.5)  # mean(p^2)
    # label smoothing real=0.8
    assert float(gan_loss(pred, True, "lsgan", real_label=0.8)) == pytest.approx(
        ((1 - 0.8) ** 2 + 0.8 ** 2) / 2)


def test_vanilla_matches_bce_with_logits():
    pred = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32))
    p = np.asarray(pred, np.float64)
    want_real = np.mean(np.logaddexp(0, -p))
    got = float(gan_loss(pred, True, "vanilla"))
    assert got == pytest.approx(want_real, rel=1e-5)
    want_fake = np.mean(np.logaddexp(0, p))
    assert float(gan_loss(pred, False, "vanilla")) == pytest.approx(want_fake, rel=1e-5)


def test_nonsaturating_returns_per_sample_vector():
    pred = jnp.zeros((5, 2, 2, 1))
    v = gan_loss(pred, True, "nonsaturating")
    assert v.shape == (5,)
    np.testing.assert_allclose(np.asarray(v), np.log(2.0), rtol=1e-6)


def test_hinge_golden():
    pred = jnp.asarray([[0.5], [2.0]])
    v = gan_loss(pred, True, "hinge")
    np.testing.assert_allclose(np.asarray(v), [0.5, 0.0])
    v = gan_loss(pred, False, "hinge")
    np.testing.assert_allclose(np.asarray(v), [1.5, 3.0])


def test_multiscale_sums_over_scales():
    pred = [[jnp.zeros((4, 2, 2, 1))] for _ in range(3)]
    v = gan_loss(pred, True, "nonsaturating")
    assert v.shape == (4,)
    np.testing.assert_allclose(np.asarray(v), 3 * np.log(2.0), rtol=1e-6)
    # reductions: D-side mean; G2-side per-patch sum
    assert float(reduce_d(v)) == pytest.approx(3 * np.log(2.0), rel=1e-6)
    assert float(reduce_g2_patch_sum(v, 4)) == pytest.approx(12 * np.log(2.0), rel=1e-6)


def test_feature_matching_ignores_logit_and_stops_real_grad():
    fake = [[jnp.ones((1, 4, 4, 2)), jnp.zeros((1, 2, 2, 1))]]
    real = [[jnp.zeros((1, 4, 4, 2)), jnp.full((1, 2, 2, 1), 99.0)]]
    # n_layers=3 → feat weight 4/4=1; num_d=1 → 1. one feature layer, |1-0| = 1
    v = float(feature_matching_loss(fake, real, n_layers=3, num_d=1))
    assert v == pytest.approx(1.0)


def test_gradient_penalty_zero_for_constant_d():
    real = jnp.ones((2, 8, 8, 1))
    fake = jnp.zeros((2, 8, 8, 1))

    def d_fn(x):
        return jnp.sum(x * 0.0, axis=(1, 2, 3))

    gp = gradient_penalty(d_fn, real, fake, jax.random.key(0))
    # grad norm 0 → penalty = (0-1)^2*10 = 10
    assert float(gp) == pytest.approx(10.0, rel=1e-4)

    def d_lin(x):
        # unit-norm gradient field: d = sum(x)/sqrt(numel)
        return jnp.sum(x, axis=(1, 2, 3)) / np.sqrt(64.0)

    gp2 = gradient_penalty(d_lin, real, fake, jax.random.key(0))
    assert float(gp2) == pytest.approx(0.0, abs=1e-3)


def test_angle_error_golden():
    a = jnp.zeros((1, 2, 2, 2))
    real_n = compute_normal(a, scale_nz=1.0)       # straight up
    t = jnp.ones((1, 2, 2, 2))
    pred_n = compute_normal(t, scale_nz=1.0)       # (1,1,1)/sqrt3
    ae = surface_normal_angle_error(real_n, pred_n, mode="evaluate")
    want = np.degrees(np.arccos(1.0 / np.sqrt(3.0)))
    np.testing.assert_allclose(np.asarray(ae), want, rtol=1e-5)
    # identical normals → 0°
    ae0 = surface_normal_angle_error(real_n, real_n)
    np.testing.assert_allclose(np.asarray(ae0), 0.0, atol=1e-2)


def test_angle_error_train_modes_finite():
    rng = np.random.default_rng(0)
    r = compute_normal(jnp.asarray(rng.normal(size=(2, 4, 4, 2)).astype(np.float32)), 1.0)
    p = compute_normal(jnp.asarray(rng.normal(size=(2, 4, 4, 2)).astype(np.float32)), 1.0)
    for mode in ("train_L2_loss", "train_AL_loss", "train_TAL_loss"):
        v = surface_normal_angle_error(r, p, mode=mode)
        assert np.isfinite(float(v))


# ---------------------------------------------------------------------------
# LPIPS
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def lpips_params():
    return init_lpips_params(0)


def test_lpips_basic_properties(lpips_params):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32))
    d = lpips(lpips_params, x, y)
    assert d.shape == (2,)
    assert (np.asarray(d) > 0).all()
    # identity → 0, symmetry
    np.testing.assert_allclose(np.asarray(lpips(lpips_params, x, x)), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lpips(lpips_params, y, x)),
                               np.asarray(d), rtol=1e-4)


def test_lpips_single_channel_input(lpips_params):
    # gx/gy patches are (N, H, W, 1) — must broadcast like torch
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, size=(3, 32, 32, 1)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, size=(3, 32, 32, 1)).astype(np.float32))
    d = lpips(lpips_params, x, y)
    assert d.shape == (3,)
    assert np.isfinite(np.asarray(d)).all()


def test_lpips_is_differentiable(lpips_params):
    x = jnp.ones((1, 32, 32, 3)) * 0.1
    y = jnp.zeros((1, 32, 32, 3))
    g = jax.grad(lambda a: jnp.sum(lpips(lpips_params, a, y)))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


@pytest.mark.parametrize("foldf", [2, pytest.param(4, marks=pytest.mark.slow)])
def test_lpips_folded_matches_standard(foldf):
    """fold>1 runs the first VGG blocks space-to-depth folded with group-wise
    tap math — values and input gradients must match the standard path."""
    params = init_lpips_params(0)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32))
    ref = lpips(params, x, y)
    got = lpips(params, x, y, fold=foldf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-6)
    # y_no_grad branch + gradients
    g_ref = jax.grad(lambda a: jnp.sum(lpips(params, a, y, y_no_grad=True)))(x)
    g_fold = jax.grad(lambda a: jnp.sum(lpips(params, a, y, y_no_grad=True,
                                              fold=foldf)))(x)
    np.testing.assert_allclose(np.asarray(g_fold), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-6)


@pytest.mark.parametrize("foldf", [pytest.param(1, marks=pytest.mark.slow), 2])
def test_lpips_factored_head_matches(foldf):
    """head_mode='factored' (rx²·Σwx² + ry²·Σwy² − 2·rx·ry·Σwxy) ≡ the
    composed normalize→diff→lin head — values AND input gradients, folded
    and unfolded, 3- and 1-channel inputs."""
    params = init_lpips_params(0)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32))
    kw = dict(fold=foldf, fold_axis="w")
    ref = lpips(params, x, y, **kw)
    got = lpips(params, x, y, head_mode="factored", **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-7)
    g_ref = jax.grad(lambda a: jnp.sum(
        lpips(params, a, y, y_no_grad=True, **kw)))(x)
    g_fac = jax.grad(lambda a: jnp.sum(
        lpips(params, a, y, y_no_grad=True, head_mode="factored", **kw)))(x)
    np.testing.assert_allclose(np.asarray(g_fac), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-6)
    # gray 1-channel input (the gx/gy broadcast path)
    xg, yg = x[..., :1], y[..., :1]
    np.testing.assert_allclose(
        np.asarray(lpips(params, xg, yg, head_mode="factored", **kw)),
        np.asarray(lpips(params, xg, yg, **kw)), rtol=2e-5, atol=2e-7)
    # bf16 tap policy: factored stays within the bf16 tolerance band
    got_bf = lpips(params, x, y, dtype=jnp.bfloat16, y_no_grad=True,
                   head_mode="factored", **kw)
    ref_bf = lpips(params, x, y, dtype=jnp.bfloat16, y_no_grad=True, **kw)
    np.testing.assert_allclose(np.asarray(got_bf), np.asarray(ref_bf),
                               rtol=2e-2, atol=2e-4)


def test_refolded_block2_matches_plain():
    """Correctness pin for the scripts/bench_lpips_blocks.py `b2f` probe:
    re-folding VGG block 2 along W ((W, C) → (W/2, 2C) is a contiguous
    regroup in the px·C+c fold convention) and running its convs through the
    generic lifted-kernel transform `_folded_conv3x3_s1_w` must reproduce the
    plain block exactly — values and input gradients — including the folded
    pool that consumes the fold."""
    from vts_tpu.losses.lpips import _folded_conv3x3_s1_w, init_lpips_params
    params = init_lpips_params(0)
    w21, b21 = params["conv"][2]["w"], params["conv"][2]["b"]
    w22, b22 = params["conv"][3]["w"], params["conv"][3]["b"]
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, 12, 16, 64)).astype(np.float32))

    def plain(x):
        h = x
        for w, b in ((w21, b21), (w22, b22)):
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = jax.nn.relu(h + b)
        n, hh, ww, c = h.shape
        return jnp.max(h.reshape(n, hh // 2, 2, ww // 2, 2, c), axis=(2, 4))

    def refolded(x):
        n, hh, ww, c = x.shape
        h = x.reshape(n, hh, ww // 2, 2 * c)
        h = jax.nn.relu(_folded_conv3x3_s1_w(h, w21, b21, 2))
        h = jax.nn.relu(_folded_conv3x3_s1_w(h, w22, b22, 2))
        n, hh, ww, c = h.shape
        return jnp.max(h.reshape(n, hh // 2, 2, ww, 1, 2, c // 2),
                       axis=(2, 5)).reshape(n, hh // 2, ww, c // 2)

    np.testing.assert_allclose(np.asarray(refolded(x)), np.asarray(plain(x)),
                               rtol=1e-5, atol=1e-5)
    g_ref = jax.grad(lambda a: jnp.sum(plain(a) ** 2))(x)
    g_fold = jax.grad(lambda a: jnp.sum(refolded(a) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_fold), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("foldf", [2, pytest.param(4, marks=pytest.mark.slow)])
def test_lpips_folded_w_matches_standard(foldf):
    """fold_axis='w' (width-only fold: b channel groups, ×b conv FLOPs) must
    match the standard path in values and input gradients, like 'hw'."""
    params = init_lpips_params(0)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32))
    ref = lpips(params, x, y)
    got = lpips(params, x, y, fold=foldf, fold_axis="w")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-6)
    g_ref = jax.grad(lambda a: jnp.sum(lpips(params, a, y, y_no_grad=True)))(x)
    g_fold = jax.grad(lambda a: jnp.sum(lpips(params, a, y, y_no_grad=True,
                                              fold=foldf, fold_axis="w")))(x)
    np.testing.assert_allclose(np.asarray(g_fold), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-6)
    # gray 1-channel input (the reference's gx/gy broadcast path)
    xg = x[..., :1]
    yg = y[..., :1]
    np.testing.assert_allclose(
        np.asarray(lpips(params, xg, yg, fold=foldf, fold_axis="w")),
        np.asarray(lpips(params, xg, yg)), rtol=2e-4, atol=2e-6)
    # cached y-taps interop on the w axis
    from vts_tpu.losses.lpips import lpips_y_taps
    taps = lpips_y_taps(params, y, fold=foldf, fold_axis="w")
    got2 = lpips(params, x, y, y_no_grad=True, fold=foldf, fold_axis="w",
                 y_taps=taps)
    np.testing.assert_allclose(
        np.asarray(got2),
        np.asarray(lpips(params, x, y, y_no_grad=True, fold=foldf,
                         fold_axis="w")), rtol=1e-6, atol=1e-7)


def test_lpips_odd_spatial_sizes():
    """The reshape-max pool must handle sizes that go odd mid-pyramid the way
    the old reduce_window('VALID') did: drop the trailing row/col (round-3
    review finding)."""
    import jax

    params = init_lpips_params(0)
    r = np.random.default_rng(3)
    x = jnp.asarray(r.uniform(-1, 1, (1, 50, 50, 3)).astype(np.float32))
    y = jnp.asarray(r.uniform(-1, 1, (1, 50, 50, 3)).astype(np.float32))
    v = lpips(params, x, y)  # 50->25->12->6->3: odd at pools 2 and 5
    assert np.isfinite(np.asarray(v)).all()
    g = jax.grad(lambda a: jnp.sum(lpips(params, a, y)))(x)
    assert float(jnp.max(jnp.abs(g))) > 0


@pytest.mark.slow
def test_lpips_pallas_conv_backend_matches():
    """conv_backend='pallas_interpret' (the Pallas fused conv kernel routed
    through the folded block-1 conv and block-2 convs, interpreter mode) must
    reproduce the XLA path — values and input gradients, folded-W and
    unfolded, 3- and 1-channel inputs."""
    params = init_lpips_params(0)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.uniform(-1, 1, size=(1, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, size=(1, 64, 64, 3)).astype(np.float32))
    for foldf in (1, 2):
        kw = dict(fold=foldf, fold_axis="w")
        ref = lpips(params, x, y, **kw)
        got = lpips(params, x, y, conv_backend="pallas_interpret", **kw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-6, err_msg=f"fold={foldf}")
        g_ref = jax.grad(lambda a: jnp.sum(
            lpips(params, a, y, y_no_grad=True, **kw)))(x)
        g_pal = jax.grad(lambda a: jnp.sum(
            lpips(params, a, y, y_no_grad=True,
                  conv_backend="pallas_interpret", **kw)))(x)
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   rtol=2e-3, atol=2e-6, err_msg=f"fold={foldf}")
    # gray 1-channel (the tactile branch)
    xg, yg = x[..., :1], y[..., :1]
    np.testing.assert_allclose(
        np.asarray(lpips(params, xg, yg, fold=2, fold_axis="w",
                         conv_backend="pallas_interpret")),
        np.asarray(lpips(params, xg, yg, fold=2, fold_axis="w")),
        rtol=2e-4, atol=2e-6)


def test_entry_conv_folded_cotangent_grad():
    """_folded_conv1_strided_w_fg (the folded-cotangent backward: input grad
    as ONE s1/p1 conv + free reshape) must match AD of the plain
    implementation — dx, dw, db — at fold 2, 3- and 1-channel inputs."""
    from vts_tpu.losses.lpips import (_folded_conv1_strided_w,
                                      _folded_conv1_strided_w_fg)
    rng = np.random.default_rng(21)
    for ci in (3, 1):
        x = jnp.asarray(rng.normal(size=(2, 16, 24, ci)).astype(np.float32))
        w1 = jnp.asarray(
            rng.normal(size=(3, 3, ci, 64)).astype(np.float32) * 0.1)
        b1 = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))

        y_ref = _folded_conv1_strided_w(x, w1, b1, 2)
        y_fg = _folded_conv1_strided_w_fg(x, w1, b1, 2)
        np.testing.assert_allclose(np.asarray(y_fg), np.asarray(y_ref),
                                   rtol=1e-6, atol=1e-6)

        def loss(f, x, w, b):
            return jnp.sum(f(x, w, b, 2) ** 2)

        g_ref = jax.grad(loss, argnums=(1, 2, 3))(
            _folded_conv1_strided_w, x, w1, b1)
        g_fg = jax.grad(loss, argnums=(1, 2, 3))(
            _folded_conv1_strided_w_fg, x, w1, b1)
        for a, r, name in zip(g_fg, g_ref, "dx dw db".split()):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f"ci={ci} {name}")
