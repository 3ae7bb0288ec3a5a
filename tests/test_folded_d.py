"""Folded MultiscaleDiscriminator ≡ the standard flax forward.

networks/folded_d.py runs the D1 PatchGAN pyramid on space-to-depth folded
tensors with pad-2 odd-size geometry (garbage-tail masking + masked-divisor
BatchNorm).  It must match MultiscaleDiscriminator.apply on the SAME
parameter tree: logits, updated batch statistics, and gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vts_tpu.networks.blocks import avg_pool_3x3_s2_nopad_count
from vts_tpu.networks.discriminators import MultiscaleDiscriminator
from vts_tpu.networks.folded import fold
from vts_tpu.networks.folded_d import (folded_avg_pool_3x3_s2,
                                       folded_d_eligible,
                                       folded_multiscale_d_apply)


def _make_d(ndf=8, n_layers=3, num_D=3, size=64, c=4, seed=0):
    net = MultiscaleDiscriminator(ndf=ndf, n_layers=n_layers, num_D=num_D,
                                  norm_type="batch", get_interm_feat=False,
                                  train=True)
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.uniform(-1, 1, (2, size, size, c)).astype(np.float32))
    variables = net.init(jax.random.key(seed), jnp.zeros_like(x))
    return net, variables["params"], variables["batch_stats"], x


@pytest.mark.parametrize("b", [2, 4, 8])
def test_folded_pool_matches_reference(b):
    r = np.random.default_rng(1)
    c, h = 4, 64
    x = jnp.asarray(r.normal(size=(2, h, h, c)).astype(np.float32))
    ref = avg_pool_3x3_s2_nopad_count(x)
    got_f, out_size = folded_avg_pool_3x3_s2(fold(x, b), b, h, c, jnp.float32)
    assert out_size == ref.shape[1]
    from vts_tpu.networks.folded import unfold
    got = unfold(got_f, max(1, b // 2), c)[:, :out_size, :out_size, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cfg", [
    dict(ndf=8, n_layers=3, num_D=3, size=64, fold=8),
    dict(ndf=4, n_layers=2, num_D=2, size=48, fold=4),
    dict(ndf=8, n_layers=3, num_D=3, size=64, fold=4),
])
def test_folded_multiscale_matches_flax(cfg):
    f = cfg.pop("fold")
    net, params, stats, x = _make_d(**cfg)
    (ref, mut) = net.apply({"params": params, "batch_stats": stats}, x,
                           mutable=["batch_stats"])
    got, new_stats = folded_multiscale_d_apply(
        params, stats, x, fold=f, n_layers=cfg["n_layers"],
        num_D=cfg["num_D"])
    assert len(got) == len(ref)
    for g, r_ in zip(got, ref):
        assert g[0].shape == r_[0].shape
        np.testing.assert_allclose(np.asarray(g[0]), np.asarray(r_[0]),
                                   rtol=2e-4, atol=2e-5)
    def chk(path, a, b_):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(path))
    jax.tree_util.tree_map_with_path(chk, mut["batch_stats"], new_stats)


@pytest.mark.slow
def test_folded_multiscale_gradients_match():
    """Param grads AND input grads (the G-loss pass differentiates through
    the D into fake_I) agree between the folded and flax graphs."""
    net, params, stats, x = _make_d(ndf=4, n_layers=3, num_D=3, size=64)

    def loss_ref(p, xx):
        out = net.apply({"params": p, "batch_stats": stats}, xx,
                        mutable=["batch_stats"])[0]
        return sum(jnp.mean(jnp.square(o[-1])) for o in out)

    def loss_fold(p, xx):
        out, _ = folded_multiscale_d_apply(p, stats, xx, fold=8,
                                           n_layers=3, num_D=3)
        return sum(jnp.mean(jnp.square(o[0])) for o in out)

    gp_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gp_fold, gx_fold = jax.grad(loss_fold, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx_fold), np.asarray(gx_ref),
                               rtol=2e-3, atol=2e-5)
    def chk(path, a, b_):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-3, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(path))
    jax.tree_util.tree_map_with_path(chk, gp_ref, gp_fold)


def test_eligibility_gate():
    opt = type("O", (), dict(netD="multiscale", normD="batch",
                             getIntermFeat_D=False, num_D_D1=3))()
    assert folded_d_eligible(opt, 8, 1536)
    assert folded_d_eligible(opt, 8, 256)
    assert not folded_d_eligible(opt, 8, 100)    # 25 at scale2 breaks tiling
    assert not folded_d_eligible(opt, 1, 1536)   # fold disabled
    opt.normD = "instance"
    assert not folded_d_eligible(opt, 8, 1536)   # only batch-norm D folded


@pytest.mark.slow
def test_step_equivalence_folded_vs_flax_d():
    """One full fused train step with the folded D1 ≡ the flax D1 (fp32)."""
    from test_models import synth_batch, tiny_opt
    from vts_tpu.models.sinskit import SinSKITModel

    losses = {}
    for use_folded in (True, False):
        opt = tiny_opt(n_layers_D=3, num_D_D1=3, ndf=4)
        model = SinSKITModel(opt)
        batch = synth_batch(seed=7)
        model.setup(batch)
        if not use_folded:
            model._folded_d_ok = False
        else:
            assert model._folded_d_ok, "tiny config should fold D1"
        model.set_input(batch)
        model.optimize_parameters(epoch=1)
        losses[use_folded] = model.get_current_losses()
    for k in losses[True]:
        np.testing.assert_allclose(losses[True][k], losses[False][k],
                                   rtol=5e-4, atol=5e-5, err_msg=k)
