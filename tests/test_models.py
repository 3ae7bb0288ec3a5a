"""Model-layer tests: fused-step correctness properties on a tiny config."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vts_tpu.models.sinskit import SinSKITModel
from vts_tpu.train import best_vote, metric_improved


def tiny_opt(**kw):
    base = dict(
        isTrain=True, preprocess="crop", crop_size=256, center_w=192, center_h=128,
        batch_size_G2=4, batch_size_G2_val=4, T_resolution_multiplier=1,
        sample_bbox_per_patch=2, use_bg_mask=True, sketch_nc=1, image_nc=3,
        touch_nc=2, seed=0, batch_size=1, model="sinskit", netG="unet256_custom",
        netD="multiscale", netD2="multiscale", gan_mode="nonsaturating",
        ngf=2, ndf=2, lr=1e-3, lr_G2=5e-4, beta1=0.0, beta2=0.99,
        normG="instance", normD="batch", init_type="xavier", init_gain=0.02,
        no_dropout=True, no_antialias=False, no_antialias_up=False,
        use_cGAN=True, lambda_G1_GAN=1.0, lambda_G1_L1=100.0, lambda_G1_lpips=0.0,
        use_cGAN_G2=True, use_cGAN_G2_S=True, use_cGAN_G2_I=True,
        lambda_G2_GAN=5.0, lambda_G2_L1=10.0, lambda_G2_lpips=0.0,
        lambda_G2_GAN_feat=0.0, smooth_GAN_label=True,
        use_vision_aided_loss=False, vision_aided_warmup_epoch=100,
        n_layers_D=2, n_layers_D2=2, num_layer_separate=4, num_D_D1=2, num_D_D2=2,
        use_positional_encoding=True, positional_encoding_mode="spe",
        positional_encoding_dim=4, use_more_fakeT=False, add_fake_T_sample_size=2,
        use_diffaug=False, diffaugment="bs", g2_gan_backprop=False,
        lpips_weights="", inception_weights="", scale_nz=0.25, dtype="float32",
        epoch_count=1, n_epochs=5, n_epochs_decay=400, lr_policy="linear",
        checkpoints_dir="/tmp/vts_test_ckpt", name="ut", getIntermFeat_D=False,
    )
    base.update(kw)
    return types.SimpleNamespace(**base)


def synth_batch(k=4, size=256, seed=0, k_valid=None):
    r = np.random.default_rng(seed)
    m = np.ones((1, size, size, 1), np.float32)
    valid = np.ones((1, k), np.float32)
    if k_valid is not None:
        valid[:, k_valid:] = 0.0
    return {
        "S": r.uniform(-1, 1, (1, size, size, 1)).astype(np.float32),
        "I": r.uniform(-1, 1, (1, size, size, 3)).astype(np.float32),
        "M": m,
        "T_images": r.uniform(-1, 1, (1, k, 32, 32, 2)).astype(np.float32),
        "T_coords": np.tile(np.array([[40, 60, 64, 64, 32, 1.0, 8, 8]], np.float32),
                            (k, 1))[None],
        "I_masks": np.ones((1, k, 32, 32, 1), np.float32),
        "T_valid": valid,
    }


@pytest.fixture(scope="module")
def model_and_batch():
    opt = tiny_opt()
    model = SinSKITModel(opt)
    batch = synth_batch()
    model.setup(batch)
    return model, batch


def test_step_updates_all_nets(model_and_batch):
    model, batch = model_and_batch
    before = {k: jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                                        model.states[k].params)
              for k in ("G", "D", "D2")}
    model.set_input(batch)
    model.optimize_parameters(epoch=1)
    losses = model.get_current_losses()
    assert np.isfinite(list(losses.values())).all()
    for k in ("G", "D", "D2"):
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) - b))),
            model.states[k].params, before[k])
        assert max(jax.tree_util.tree_leaves(diffs)) > 0, f"{k} did not update"


def test_pred_fake_T_full_visual(model_and_batch):
    """The reference renders D2's full-canvas response as the
    ``pred_fake_T_full`` visual (sinskitG_model.py:1495-1501); ours computes
    it on demand in get_current_visuals — finest-scale logit map over the
    whole tactile canvas."""
    model, batch = model_and_batch
    model.set_input(batch)
    model.optimize_parameters(epoch=1)
    vis = model.get_current_visuals()
    assert "pred_fake_T_full" in vis
    pm = vis["pred_fake_T_full"]
    assert pm.ndim == 4 and pm.shape[0] == 1 and pm.shape[-1] == 1
    # PatchGAN logit map: spatially downsampled canvas, > 1/32 of the side
    assert batch["S"].shape[1] // 32 < pm.shape[1] < batch["S"].shape[1]
    assert np.isfinite(pm).all()


@pytest.mark.slow
def test_padded_patches_do_not_change_losses():
    """A batch with K=4 all-valid vs K=8 where the extra 4 are garbage padding
    must produce identical patch losses — the validity-mask contract.

    Uses instance-norm discriminators: with batch norm, padded entries would
    still enter the batch statistics (which is why the DATA pipeline pads by
    duplicating valid patches, never garbage — matching the reference's
    with-replacement resampling)."""
    def snapshot(states):
        return {k: jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)), v)
                for k, v in states.items()}

    opt4 = tiny_opt(batch_size_G2=4, normD="instance")
    m4 = SinSKITModel(opt4)
    b4 = synth_batch(k=4, seed=1)
    m4.setup(b4)
    init_states = snapshot(m4.states)
    m4.set_input(b4)
    m4.optimize_parameters(epoch=1)
    l4 = m4.get_current_losses()

    opt8 = tiny_opt(batch_size_G2=8, normD="instance")
    m8 = SinSKITModel(opt8)
    b8 = synth_batch(k=8, seed=2, k_valid=4)
    # copy the 4 real patches from b4; rows 4..7 are garbage with valid=0
    for key in ("T_images", "T_coords", "I_masks"):
        b8[key][:, :4] = synth_batch(k=4, seed=1)[key]
        if key != "T_coords":
            b8[key][:, 4:] = 99.0
    for key in ("S", "I", "M"):
        b8[key] = b4[key]
    m8.setup(b8)
    m8.states = snapshot(init_states)
    m8.rng = jax.random.key(0)
    m8.set_input(b8)
    m8.optimize_parameters(epoch=1)
    l8 = m8.get_current_losses()
    for key in ("G2_L1", "D_real_T_concat", "D_fake_T_concat", "G2_GAN",
                "G_L1", "D_fake_I"):
        assert l8[key] == pytest.approx(l4[key], rel=1e-4), key


def test_lr_decay_schedule():
    opt = tiny_opt()
    from vts_tpu.models.base import lr_factor
    assert lr_factor("linear", 0, opt) == 1.0
    assert lr_factor("linear", 4, opt) == 1.0          # first n_epochs flat
    # second-to-last epoch → 1/(n_decay+1); last epoch → 0
    total = opt.n_epochs + opt.n_epochs_decay
    assert lr_factor("linear", total - 1, opt) == pytest.approx(
        1.0 / (opt.n_epochs_decay + 1), rel=1e-6)
    assert lr_factor("linear", total, opt) == 0.0


def test_checkpoint_roundtrip(model_and_batch, tmp_path):
    model, batch = model_and_batch
    model.opt.checkpoints_dir = str(tmp_path)
    model.save_networks("unit")
    mutated = jax.tree_util.tree_map(lambda x: x + 1.0, model.states["G"].params)
    model.states["G"] = model.states["G"].replace(params=mutated)
    model.load_networks("unit")
    model.set_input(batch)
    model.test()
    assert np.isfinite(np.asarray(model._outputs["fake_I"])).all()


def test_best_vote_semantics():
    m1 = {"metric_I_LPIPS": 0.5, "metric_I_PSNR": 20.0, "metric_train_I_LPIPS": 9.9}
    best = {}
    assert best_vote(m1, best)          # first epoch always improves
    best = {k: v for k, v in m1.items() if not k.startswith("metric_train_")}
    worse = {"metric_I_LPIPS": 0.6, "metric_I_PSNR": 19.0}
    assert not best_vote(worse, best)
    half = {"metric_I_LPIPS": 0.4, "metric_I_PSNR": 19.0}   # 1 of 2 improved
    assert best_vote(half, best)
    assert metric_improved("metric_I_SIFID", 1.0, 2.0)
    assert metric_improved("metric_I_SSIM", 0.9, 0.8)
    assert not metric_improved("metric_T_AE", 3.0, 2.0)


@pytest.mark.slow
def test_batch_2_step_and_metrics():
    """batch_size > 1 — impossible in the reference (ragged patch collation);
    static-K budgets batch freely. Verifies step + per-sample metrics."""
    opt = tiny_opt(batch_size=2)
    m = SinSKITModel(opt)
    b1, b2 = synth_batch(k=4, seed=1), synth_batch(k=4, seed=2)
    batch = {k: np.concatenate([b1[k], b2[k]], axis=0) for k in b1}
    m.setup(batch)
    m.set_input(batch)
    m.optimize_parameters(epoch=1)
    losses = m.get_current_losses()
    assert np.isfinite(list(losses.values())).all()
    # per-image scaling: batch-2 G2_L1 is comparable to batch-1 magnitudes
    assert losses["G2_L1"] < 200
    m.test()
    vis = m.get_current_visuals()
    assert vis["fake_I"].shape[0] == 2


@pytest.mark.parametrize("cfg", [
    dict(gan_mode="wgangp"),                       # grad-of-grad penalty in-step
    dict(gan_mode="lsgan", netD2="basic"),
    dict(use_positional_encoding=False),
    dict(positional_encoding_mode="csg", positional_encoding_dim=1),
])
@pytest.mark.slow
def test_step_config_variants(cfg):
    opt = tiny_opt(ngf=2, ndf=2, **cfg)
    m = SinSKITModel(opt)
    b = synth_batch(k=4, seed=3)
    m.setup(b)
    m.set_input(b)
    m.optimize_parameters(epoch=1)
    losses = m.get_current_losses()
    assert np.isfinite(list(losses.values())).all(), cfg
    if cfg.get("gan_mode") == "wgangp":
        assert "D_I_grad_penalty" in losses and losses["D_I_grad_penalty"] != 0.0


@pytest.mark.slow
def test_step_t_resolution_multiplier_2():
    _run_t_mult(2)


@pytest.mark.slow
def test_step_t_resolution_multiplier_4():
    """x4 tactile super-resolution (VERDICT r3 item 6): two extra tactile up
    stages, 128² patches, 4x fake_T canvas — end to end through the fused
    step (the reference's flagship unet cannot run any multiplier > 1;
    its x2/x4 path exists only for the G2-resnet baselines,
    models/networks.py:1099-1105)."""
    _run_t_mult(4, ngf=2)


def _run_t_mult(mult, ngf=None):
    """t-mult tactile super-resolution spec (VERDICT r1 item 7): the
    generator's T head emits a (mult·H, mult·W) canvas via extra up stages,
    the fused step consumes (32·mult)² tactile patches with coords in visual
    units, and eval returns the mult× fake_T."""
    k, size = 4, 256
    kw = {} if ngf is None else {"ngf": ngf, "ndf": ngf}
    opt = tiny_opt(T_resolution_multiplier=mult, use_more_fakeT=True,
                   add_fake_T_sample_size=2, **kw)
    model = SinSKITModel(opt)
    r = np.random.default_rng(3)
    pc = 32 * mult
    batch = {
        "S": r.uniform(-1, 1, (1, size, size, 1)).astype(np.float32),
        "I": r.uniform(-1, 1, (1, size, size, 3)).astype(np.float32),
        "M": np.ones((1, size, size, 1), np.float32),
        "T_images": r.uniform(-1, 1, (1, k, pc, pc, 2)).astype(np.float32),
        "T_coords": np.tile(np.array([[40, 60, 64, 64, 32, 1.0, 8, 8]],
                                     np.float32), (k, 1))[None],
        "I_masks": np.ones((1, k, pc, pc, 1), np.float32),
        "T_valid": np.ones((1, k), np.float32),
    }
    model.setup(batch)
    model.set_input(batch)
    model.optimize_parameters(epoch=1)
    losses = model.get_current_losses()
    assert losses and np.isfinite(list(losses.values())).all(), losses
    model.test()
    fake_I = np.asarray(model._outputs["fake_I"])
    fake_T = np.asarray(model._outputs["fake_T"])
    assert fake_I.shape == (1, size, size, 3)
    assert fake_T.shape == (1, mult * size, mult * size, 2)


@pytest.mark.slow
def test_frozen_arg_matches_closure_fallback(model_and_batch):
    """The 'frozen' argument pytree (remote-compile upload fix) must be
    numerically identical to the closure-constant fallback path."""
    model, batch = model_and_batch
    model.set_input(batch)
    args = (model.states["G"], model.states.get("D"), model.states.get("D2"),
            model._input, jax.random.key(7), jnp.float32(1e-3),
            jnp.float32(5e-4), jnp.int32(1))
    out_closure = model._train_step(*args)          # frozen=None fallback
    out_frozen = model._train_step(*args, frozen=model._frozen_args())
    la, lb = out_closure[3], out_frozen[3]
    assert set(la) == set(lb)
    for k in la:
        np.testing.assert_allclose(np.asarray(la[k]), np.asarray(lb[k]),
                                   rtol=1e-6, atol=1e-6, err_msg=k)


def test_lpips_crop_validation():
    """--lpips_crop rejects non-multiple-of-16 / tiny / negative values."""
    for bad in (100, -16, 48):
        with pytest.raises(ValueError):
            SinSKITModel(tiny_opt(lpips_crop=bad, lambda_G1_lpips=1.0))


@pytest.mark.slow
def test_lpips_crop_stochastic():
    """--lpips_crop (NON-parity speed knob, default 0): the G1 canvas LPIPS
    runs on one random aligned window per step — a stochastic estimate of the
    full-canvas spatial mean (the reference pays full canvas every step,
    sinskitG_model.py:497-506).  Machinery pins: crop >= canvas degenerates
    to the exact full-canvas loss (same RNG stream — the offset key is a
    fold_in, so the default stream is untouched); a smaller window yields a
    finite, different G_lpips and the step still updates G."""
    b = synth_batch(k=4, seed=5)
    vals = {}
    for crop in (0, 256, 128):
        m = SinSKITModel(tiny_opt(lpips_crop=crop, lambda_G1_lpips=1.0))
        m.setup(b)
        m.set_input(b)
        m.optimize_parameters(epoch=1)
        losses = m.get_current_losses()
        assert np.isfinite(list(losses.values())).all(), (crop, losses)
        vals[crop] = losses["G_lpips"]
    assert vals[256] == pytest.approx(vals[0], rel=1e-6), \
        "crop == canvas must be exact full-canvas parity"
    assert abs(vals[128] - vals[0]) > 1e-9, \
        "a 128^2 window should not equal the full-canvas mean"


def test_device_sample_cache_roundtrip():
    """--device_sample_cache: the second set_input of the same sample_idx
    returns the SAME device arrays (no re-transfer) and identical values;
    a different sample_idx misses; phase='val' bypasses the cache."""
    opt = tiny_opt(device_sample_cache=True)
    m = SinSKITModel(opt)
    b0 = dict(synth_batch(k=4, seed=7), sample_idx=np.array([0]))
    b1 = dict(synth_batch(k=4, seed=8), sample_idx=np.array([1]))
    m.set_input(b0)
    first = m._input["S"]
    m.set_input(b1)
    assert m._input["S"] is not first
    m.set_input(b0)
    assert m._input["S"] is first, "cache hit must reuse the device array"
    np.testing.assert_array_equal(
        np.asarray(m._input["S"]),
        np.asarray(b0["S"] * b0["M"]))
    m.set_input(b0, phase="val")  # val inputs are not cached
    assert m._input["S"] is not first


def test_apply_anneal_validation():
    """apply_anneal parses k=v lists, mutates opt, and refuses bad input."""
    from vts_tpu.train import apply_anneal
    opt = types.SimpleNamespace(lpips_crop=768, batch_size=4, remat_g="off")
    changed = apply_anneal(opt, "lpips_crop=0, batch_size=2,remat_g=on")
    assert changed == {"lpips_crop": 0, "batch_size": 2, "remat_g": "on"}
    assert (opt.lpips_crop, opt.batch_size, opt.remat_g) == (0, 2, "on")
    with pytest.raises(ValueError):
        apply_anneal(opt, "lambda_G1_L1=0")         # not whitelisted
    with pytest.raises(ValueError):
        apply_anneal(opt, "lpips_crop=50")          # not a multiple of 16
    with pytest.raises(ValueError):
        apply_anneal(opt, "lpips_remat=maybe")      # bad remat enum
    with pytest.raises(ValueError):
        apply_anneal(opt, "batch_size")             # missing '='


@pytest.mark.slow
def test_anneal_epoch_switch(tmp_path):
    """--anneal_epoch end to end on the real train() driver: a 3-epoch run
    that starts cropped-LPIPS at batch 2 and switches to full-canvas batch 1
    at epoch 2 (the round-5 anneal lane's mechanism: cropped fast phase →
    full-canvas quality tail).  Asserts the switch applied, the step
    re-traced (losses stay finite across it), and the DataLoader re-chunked."""
    from vts_tpu.train import train
    argv = [
        "--platform", "cpu", "--model", "sinskit", "--name", "anneal_ut",
        "--dataroot", "synthetic://anneal?size=320&center_w=192&center_h=128"
                      "&patches=6&val_patches=3",
        "--crop_size", "256", "--center_w", "192", "--center_h", "128",
        "--data_len", "2", "--batch_size", "2",
        "--batch_size_G2", "4", "--batch_size_G2_val", "4",
        "--add_fake_T_sample_size", "4",
        "--n_epochs", "1", "--n_epochs_decay", "2", "--ngf", "4", "--ndf", "4",
        "--lpips_crop", "64",
        "--anneal_epoch", "2", "--anneal_set", "lpips_crop=0,batch_size=1",
        "--checkpoints_dir", str(tmp_path / "ck"),
        "--results_dir", str(tmp_path / "rs"),
    ]
    model = train(argv=argv)
    assert model.opt.lpips_crop == 0 and int(model.opt.batch_size) == 1
    losses = model.get_current_losses()
    assert losses and np.isfinite(list(losses.values())).all(), losses
    # the final epoch ran at batch 1 / full canvas through a re-traced step
    assert model._jit_multi_key is None or model._jit_multi_key[0] == "multi"
