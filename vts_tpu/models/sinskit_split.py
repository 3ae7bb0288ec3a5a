"""Split-stage sinskit train step: one jit per pipeline stage.

Round-2 device traces (RESULTS.md "The ~160 ms floor") showed the FUSED
train-step graph pays a ~10-14× lane-padding tax on ~100 materialized canvas
intermediates — XLA's layout assignment for the combined multi-network graph
assigns small-channel canvas tensors space-to-depth channel-minor tiled
layouts — while the SAME sub-computations isolated in their own jits run
10-100× faster (G fwd+bwd 0.4-0.7 ms, D1 triple pass 0.44 ms, D2 2.6 ms,
gathers 1.8 ms vs a 162 ms no-LPIPS fused step).  The structural escape is
therefore to give every stage its own layout assignment: split the step at
network boundaries into small jits and carry only canvas-sized tensors
(few MB each) across them.

Semantics are EXACTLY the fused `SinSKITModel._train_step`
(models/sinskit.py — reference models/sinskitG_model.py:601-700):

  stage_g_forward   G forward (no vjp), PRNG key fan-out
  stage_d1_update   D1 adam update on (S,I)/(S,fake_I)          [D1-only graph]
  stage_d2_update   diffaug + patch gathers + more-fake-T + D2   [D2 + gathers]
  stage_g1_gan_cot  G1 GAN loss vs UPDATED D1 → ∂/∂fake_I       [D1-only graph]
  stage_g1_pix_cot  G1 L1 + full-canvas LPIPS → ∂/∂fake_I       [VGG-only graph]
  stage_g2_cot      G2 patch L1/LPIPS/GAN(+feat) → ∂/∂fake_T    [patch graphs]
  stage_d3_cot      vision-aided D3 (shared CLIP(fake) pass)    [CLIP-only graph]
  stage_g_update    recompute G forward under vjp, apply the summed
                    cotangents, adam                             [G-only graph]

The G update re-linearizes the forward at the SAME parameter point, so the
gradient equals the fused step's retained-graph vjp; the per-term cotangents
sum to the joint value_and_grad cotangent by linearity of the adjoint.
`tests/test_split_step.py` pins split ≡ fused.

D3 sharing: the fused step runs CLIP three times (d3_d_loss: real + detached
fake; d3_g_loss: fake with grad).  Here CLIP(fake) runs ONCE with grad and
its (detached) logits are reused for the D-loss log term — identical values,
one full ViT forward saved.  (The D3 heads are frozen by default — the
reference never adds netD3 to an optimizer — so the D-loss is log-only.)
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..losses.gan import gan_loss, gradient_penalty
from ..losses.gan_masked import (masked_mean, masked_patch_sum,
                                 per_sample_gan_loss)
from ..losses.lpips import lpips
from ..ops.diffaug import diff_augment
from ..ops.patch import (gather_patches, gather_patches_from_coords,
                         sample_offsets_in_mask)
from ..ops.resize import resize_nearest
from .base import adam_step


# ---------------------------------------------------------------------------
# shared small helpers (mirror the closures in SinSKITModel._train_step)
# ---------------------------------------------------------------------------

def _d2_cond(opt, t_patch, s_p, i_p):
    parts = [t_patch]
    if opt.use_cGAN_G2:
        if opt.use_cGAN_G2_S:
            parts.append(s_p)
        if opt.use_cGAN_G2_I:
            parts.append(i_p)
    return jnp.concatenate(parts, -1)


def _mask_t(model, M):
    h, w = M.shape[1:3]
    return M if model.mult == 1 else resize_nearest(
        M, (h * model.mult, w * model.mult))


def _g_apply(model, params, stats, batch):
    """One G forward on the canvas (masked dual-head output)."""
    opt = model.opt
    S = batch["S"]
    M = batch.get("M", jnp.ones_like(S))
    n, h, w, _ = S.shape
    M_T = _mask_t(model, M)
    pe = model._pe(n, h, w)
    x_in = jnp.concatenate([S, pe], axis=-1) if pe is not None else S
    style = batch.get("style_code") if getattr(opt, "use_style_code", False) else None
    variables = {"params": params}
    g_args = (x_in, style) if style is not None else (x_in,)
    if stats:
        variables["batch_stats"] = stats
        out, mut = model.netG.apply(variables, *g_args, mutable=["batch_stats"])
        new_stats = mut["batch_stats"]
    else:
        out = model._g_raw_apply(params, x_in, style, train=True)
        new_stats = stats
    fake_I, fake_T = model._split_g_out(out, M, M_T)
    return (fake_I, fake_T), new_stats


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------

def stage_g_forward(model, g_params, g_stats, batch, rng):
    """G forward (no vjp — the update stage re-linearizes) + key fan-out.

    The key split matches the fused step's `jax.random.split(rng, 6)` so the
    two modes draw identical diffaug/more-fake/gp randomness."""
    rng_next, k_aug_r, k_aug_f, k_more, k_gp1, k_gp2 = jax.random.split(rng, 6)
    (fake_I, fake_T), new_stats = _g_apply(model, g_params, g_stats, batch)
    keys = {"aug_r": k_aug_r, "aug_f": k_aug_f, "more": k_more,
            "gp1": k_gp1, "gp2": k_gp2}
    return fake_I, fake_T, new_stats, keys, rng_next


def stage_d1_update(model, dS, S, I, fake_I_d, k_gp1, lr):
    """D1 adam update — mirrors the fused d1_loss_fn exactly."""
    opt = model.opt
    mode = opt.gan_mode
    real_lbl = 0.8 if opt.smooth_GAN_label else 1.0
    cd = model.dtype or jnp.float32
    S_d = S.astype(cd)
    I_d = I.astype(cd)

    def d1_loss_fn(d_params):
        stats = dS.stats
        fake_in = jnp.concatenate([S_d, fake_I_d], -1) if opt.use_cGAN else fake_I_d
        pred_fake, stats = model._apply_d(d_params, stats, model.netD, fake_in)
        l_fake = jnp.mean(gan_loss(pred_fake, False, mode, real_lbl)) * opt.lambda_G1_GAN
        real_in = jnp.concatenate([S_d, I_d], -1) if opt.use_cGAN else I_d
        pred_real, stats = model._apply_d(d_params, stats, model.netD, real_in)
        l_real = jnp.mean(gan_loss(pred_real, True, mode, real_lbl)) * opt.lambda_G1_GAN
        gp = 0.0
        if mode == "wgangp":
            gp = gradient_penalty(
                lambda z: model._apply_d(d_params, dS.stats, model.netD, z)[0],
                real_in, fake_in, k_gp1)
        total = (l_fake + l_real + gp) * 0.5
        logit_map = pred_fake[-1][-1] if isinstance(pred_fake, (list, tuple)) \
            else pred_fake
        return total, (l_fake, l_real, gp, stats, logit_map)

    (_, (lf, lr_, gp1, d_stats, pred_fake_I)), d_grads = \
        jax.value_and_grad(d1_loss_fn, has_aux=True)(dS.params)
    dS = adam_step(model.tx_d, dS, d_grads, lr, d_stats)
    losses = {"D_fake_I": lf, "D_real_I": lr_, "D_I_grad_penalty": gp1}
    return dS, losses, jax.lax.stop_gradient(pred_fake_I)


def stage_d2_update(model, d2S, batch, fake_I_d, fake_T_d, keys, lr_d2):
    """diffaug + patch gathers + more-fake-T sampling + D2 adam update.

    Returns the patch-stack aux the G2 cotangent stage reuses (S_patch,
    fakeI_cond, pred_real_T) plus the augmented canvases for the visuals."""
    opt = model.opt
    mode = opt.gan_mode
    real_lbl = 0.8 if opt.smooth_GAN_label else 1.0
    cd = model.dtype or jnp.float32
    S = batch["S"]
    I = batch["I"]
    M = batch.get("M", jnp.ones_like(S))
    n = S.shape[0]
    M_T = _mask_t(model, M)
    S_d = S.astype(cd)
    I_d = I.astype(cd)

    if opt.use_diffaug:
        aug_real_I = diff_augment(keys["aug_r"], I_d, opt.diffaugment) * M.astype(cd)
        aug_fake_I = diff_augment(keys["aug_f"], fake_I_d, opt.diffaugment) * M.astype(cd)
    else:
        aug_real_I = I_d
        aug_fake_I = fake_I_d

    real_T = batch["T_images"]
    coords = batch["T_coords"]
    i_masks = batch["I_masks"]
    valid = batch["T_valid"]
    pc = real_T.shape[1]

    fake_T_patch_d = gather_patches_from_coords(fake_T_d, coords, 32, model.mult)
    S_patch = gather_patches_from_coords(S_d, coords, 32, 1)
    realI_patch = gather_patches_from_coords(aug_real_I, coords, 32, 1)
    fakeI_patch = gather_patches_from_coords(aug_fake_I, coords, 32, 1)
    if model.mult != 1:
        from ..ops.resize import resize_bicubic
        S_patch = resize_bicubic(S_patch, (pc, pc))
        realI_patch = resize_bicubic(realI_patch, (pc, pc))
        fakeI_patch = resize_bicubic(fakeI_patch, (pc, pc))
    realI_cond = jnp.concatenate([realI_patch, i_masks], -1)
    fakeI_cond = jnp.concatenate([fakeI_patch, i_masks], -1)

    if opt.use_more_fakeT:
        mk = opt.add_fake_T_sample_size

        def sample_one(key, m_t, f_t, s_img, f_i):
            ox, oy = sample_offsets_in_mask(key, m_t[..., 0], mk, pc)
            return (gather_patches(f_t, ox, oy, pc),
                    gather_patches(s_img, ox // model.mult, oy // model.mult, 32),
                    gather_patches(f_i, ox // model.mult, oy // model.mult, 32))

        if n > 1:
            ks = jax.random.split(keys["more"], n)
            more_T, more_S, more_I = jax.vmap(sample_one)(
                ks, M_T, fake_T_d, S_d, fake_I_d)
            more_T = more_T.reshape((-1,) + more_T.shape[2:])
            more_S = more_S.reshape((-1,) + more_S.shape[2:])
            more_I = more_I.reshape((-1,) + more_I.shape[2:])
        else:
            off_x, off_y = sample_offsets_in_mask(keys["more"], M_T[0, ..., 0], mk, pc)
            more_T = gather_patches(fake_T_d, off_x, off_y, pc)
            more_S = gather_patches(S_d, off_x // model.mult, off_y // model.mult, 32)
            more_I = gather_patches(fake_I_d, off_x // model.mult, off_y // model.mult, 32)
        if model.mult != 1:
            from ..ops.resize import resize_bicubic
            more_S = resize_bicubic(more_S, (pc, pc))
            more_I = resize_bicubic(more_I, (pc, pc))
        more_I = jnp.concatenate([more_I, jnp.ones_like(more_I[..., :1])], -1)
        more_cond = _d2_cond(opt, more_T, more_S, more_I)

    losses: Dict[str, jnp.ndarray] = {}
    pred_real_T = None
    if "D2" in model.model_names:
        def d2_loss_fn(d2_params):
            stats = d2S.stats
            pf, stats = model._apply_d(d2_params, stats, model.netD2,
                                       _d2_cond(opt, fake_T_patch_d, S_patch, fakeI_cond))
            l_fake = masked_mean(per_sample_gan_loss(pf, False, mode, real_lbl),
                                 valid) * opt.lambda_G2_GAN
            l_more = 0.0
            if opt.use_more_fakeT:
                pm, stats = model._apply_d(d2_params, stats, model.netD2, more_cond)
                l_more = jnp.mean(per_sample_gan_loss(pm, False, mode, real_lbl)) \
                    * opt.lambda_G2_GAN
            pr, stats = model._apply_d(d2_params, stats, model.netD2,
                                       _d2_cond(opt, real_T, S_patch, realI_cond))
            l_real = masked_mean(per_sample_gan_loss(pr, True, mode, real_lbl),
                                 valid) * opt.lambda_G2_GAN
            gp = 0.0
            if mode == "wgangp":
                gp = gradient_penalty(
                    lambda z: model._apply_d(d2_params, d2S.stats, model.netD2, z)[0],
                    _d2_cond(opt, real_T, S_patch, realI_cond),
                    _d2_cond(opt, fake_T_patch_d, S_patch, fakeI_cond), keys["gp2"])
            total = (l_fake + l_more + l_real + gp) * 0.5
            return total, (l_fake, l_more, l_real, gp, stats, pr)

        (_, (lf2, lm2, lr2, gp2, d2_stats, pred_real_T)), d2_grads = \
            jax.value_and_grad(d2_loss_fn, has_aux=True)(d2S.params)
        d2S = adam_step(model.tx_d2, d2S, d2_grads, lr_d2, d2_stats)
        losses.update(D_fake_T_concat=lf2, D_more_fake_T=lm2,
                      D_real_T_concat=lr2, D_T_grad_penalty=gp2)

    aux = {"S_patch": S_patch, "fakeI_cond": fakeI_cond,
           "aug_real_I": aug_real_I, "aug_fake_I": aug_fake_I}
    return d2S, losses, aux, pred_real_T


def stage_g1_gan_cot(model, d_params, d_stats, S, fake_I):
    """G1 GAN loss against the UPDATED D1 → (loss, ∂loss/∂fake_I)."""
    opt = model.opt
    real_lbl = 0.8 if opt.smooth_GAN_label else 1.0
    cd = model.dtype or jnp.float32
    S_d = S.astype(cd)

    def f(f_I):
        g_in = jnp.concatenate([S_d.astype(f_I.dtype), f_I], -1) \
            if opt.use_cGAN else f_I
        pred, _ = model._apply_d(d_params, d_stats, model.netD, g_in)
        return jnp.mean(gan_loss(pred, True, opt.gan_mode, real_lbl)) * opt.lambda_G1_GAN

    val, cot = jax.value_and_grad(f)(fake_I)
    return val, cot


def stage_g1_pix_cot(model, frozen_lpips, fake_I, I):
    """G1 L1 + full-canvas LPIPS → (l1, lpips, ∂/∂fake_I).

    The real branch's VGG taps are computed forward-only (`y_no_grad`): the
    fused joint pass paid the VGG backward for the constant real image too."""
    opt = model.opt

    def f(f_I):
        aux = {}
        total = 0.0
        if opt.lambda_G1_L1 > 0:
            aux["G_L1"] = jnp.mean(jnp.abs(f_I - I.astype(f_I.dtype)),
                                   dtype=jnp.float32) * opt.lambda_G1_L1
            total += aux["G_L1"]
        if opt.lambda_G1_lpips > 0:
            # same folded block-1 layout escape as the fused step
            # (sinskit.py G-loss lp_fn) — exact, so the split≡fused
            # equivalence tests hold either way; fold_axis / head_mode ride
            # the same opt knobs as the fused path so A/Bs of those flags
            # mean the same thing under --step_mode split
            lp_fn = lambda a, b: lpips(
                frozen_lpips, a, b, dtype=model.dtype, y_no_grad=True,
                fold=int(getattr(opt, "lpips_fold", 2)),
                fold_axis=getattr(opt, "lpips_fold_axis", "w"),
                head_mode=getattr(opt, "lpips_head", "composed"),
                conv_backend=getattr(opt, "lpips_conv", "xla"))
            if f_I.shape[0] > 1:
                lp_fn = jax.checkpoint(lp_fn)
            aux["G_lpips"] = jnp.mean(lp_fn(f_I, I.astype(f_I.dtype))) \
                * opt.lambda_G1_lpips
            total += aux["G_lpips"]
        return total, aux

    (_, aux), cot = jax.value_and_grad(f, has_aux=True)(fake_I)
    return aux, cot


def stage_g2_cot(model, frozen_lpips, d2_params, d2_stats, fake_T, coords,
                 real_T, valid, S_patch, fakeI_cond, pred_real_T):
    """G2 patch losses → (aux, ∂/∂fake_T).  GAN terms detached unless
    --g2_gan_backprop (the reference detaches them — see sinskit.py)."""
    opt = model.opt
    real_lbl = 0.8 if opt.smooth_GAN_label else 1.0
    n = 1 if coords.ndim == 2 else coords.shape[0]
    k = real_T.shape[0]

    def f(f_T):
        aux: Dict[str, jnp.ndarray] = {}
        total = 0.0
        f_T_patch = gather_patches_from_coords(f_T, coords, 32, model.mult)
        if opt.lambda_G2_L1 > 0:
            l1map = jnp.abs(f_T_patch.astype(jnp.float32) - real_T) \
                * valid[:, None, None, None]
            aux["G2_L1"] = jnp.sum(jnp.mean(l1map, axis=(1, 2, 3))) \
                * opt.lambda_G2_L1 / n
            total += aux["G2_L1"]
        if opt.lambda_G2_lpips > 0:
            lp_both = lpips(
                frozen_lpips,
                jnp.concatenate([f_T_patch[..., 0:1], f_T_patch[..., 1:2]], 0),
                jnp.concatenate([real_T[..., 0:1], real_T[..., 1:2]], 0),
                dtype=model.dtype, y_no_grad=True,
                head_mode=getattr(opt, "lpips_head", "composed"))
            lp_gx, lp_gy = lp_both[:k], lp_both[k:]
            aux["G2_lpips"] = (masked_patch_sum(lp_gx, valid) / jnp.maximum(n, 1)
                               + masked_patch_sum(lp_gy, valid) / jnp.maximum(n, 1)) \
                * opt.lambda_G2_lpips
            total += aux["G2_lpips"]
        if opt.lambda_G2_GAN > 0 and "D2" in model.model_names:
            t_for_gan = f_T_patch if opt.g2_gan_backprop \
                else jax.lax.stop_gradient(f_T_patch)
            pf, _ = model._apply_d(d2_params, d2_stats, model.netD2,
                                   _d2_cond(opt, t_for_gan, S_patch, fakeI_cond))
            vec = per_sample_gan_loss(pf, True, opt.gan_mode, real_lbl) \
                * opt.lambda_G2_GAN
            aux["G2_GAN"] = masked_patch_sum(vec, valid) / n
            total += aux["G2_GAN"]
            if opt.lambda_G2_GAN_feat > 0 and opt.netD2 == "multiscale" \
                    and pred_real_T is not None and isinstance(pf, (list, tuple)) \
                    and len(pf[0]) > 1:
                from ..losses.gan import feature_matching_loss
                aux["G2_GAN_feat"] = feature_matching_loss(
                    pf, pred_real_T, opt.n_layers_D, opt.num_D_D2) \
                    * opt.lambda_G2_GAN_feat
                total += aux["G2_GAN_feat"]
        return total, aux

    (_, aux), cot = jax.value_and_grad(f, has_aux=True)(fake_T)
    return aux, cot


def stage_d3_cot(model, clip_params, d3_heads, fake_I, I, real_logits=None):
    """Vision-aided D3 with a SHARED CLIP(fake) pass.

    Returns (G_D3, D3_loss, ∂G_D3/∂fake_I).  D3_loss (the log-only D
    objective — heads frozen, reference never optimizes them) reuses the
    detached fake logits, so CLIP runs twice (fake w/ grad + real fwd-only)
    instead of the fused step's three times — identical values.
    ``real_logits``: the per-sample device cache of the constant CLIP(real_I)
    logits (sinskit._d3_real_logits_cached) — skips the real forward too."""
    opt = model.opt
    from ..losses.vision_aided import d3_logits

    def f(f_I):
        lf = d3_logits(clip_params, d3_heads, f_I)
        g_d3 = sum(jnp.mean(jax.nn.softplus(-l)) for l in lf) * opt.lambda_G1_GAN
        return g_d3, [jax.lax.stop_gradient(l) for l in lf]

    (g_d3, lf_det), cot = jax.value_and_grad(f, has_aux=True)(fake_I)
    lr_ = real_logits if real_logits is not None \
        else d3_logits(clip_params, d3_heads, jax.lax.stop_gradient(I))
    d3_d = 0.0
    for a, b in zip(lr_, lf_det):
        d3_d = d3_d + jnp.mean(jax.nn.softplus(-a)) + jnp.mean(jax.nn.softplus(b))
    d3_loss = d3_d * 0.5 * opt.lambda_G1_GAN
    return g_d3, d3_loss, cot


def stage_g_update(model, gS, batch, new_g_stats, cot_I_list, cot_T,
                   g_loss_terms, lr):
    """Recompute the G forward under vjp at the same parameter point, apply
    the summed loss cotangents, adam-update.  Also folds the per-term G-loss
    scalars into G_total in-jit (one dispatch instead of N scalar adds)."""
    def g_fn(params):
        (fake_I, fake_T), _ = _g_apply(model, params, gS.stats, batch)
        return fake_I, fake_T

    _, g_vjp = jax.vjp(g_fn, gS.params)
    cot_I = functools.reduce(jnp.add, cot_I_list) if cot_I_list \
        else _zero_like_output(model, batch, tactile=False)
    if cot_T is None:
        cot_T = _zero_like_output(model, batch, tactile=True)
    g_grads = g_vjp((cot_I, cot_T))[0]
    gS = adam_step(model.tx_g, gS, g_grads, lr, new_g_stats)
    g_total = functools.reduce(
        jnp.add, [jnp.asarray(v, jnp.float32) for v in g_loss_terms.values()]) \
        if g_loss_terms else jnp.float32(0.0)
    return gS, g_total


def _zero_like_output(model, batch, tactile: bool):
    S = batch["S"]
    n, h, w, _ = S.shape
    m = model.mult if tactile else 1
    c = model.opt.touch_nc if tactile else model.opt.image_nc
    dt = model.dtype or jnp.float32
    return jnp.zeros((n, h * m, w * m, c), dt)


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------

def make_stage_fns(model, jit: bool = True) -> Dict[str, Any]:
    """Build the per-stage callables (each its own jit → its own XLA layout
    assignment).  States donate; canvas tensors / batch arrays do not (they
    feed multiple stages)."""
    fns = {
        "g_forward": functools.partial(stage_g_forward, model),
        "d1": functools.partial(stage_d1_update, model),
        "d2": functools.partial(stage_d2_update, model),
        "g1_gan": functools.partial(stage_g1_gan_cot, model),
        "g1_pix": functools.partial(stage_g1_pix_cot, model),
        "g2": functools.partial(stage_g2_cot, model),
        "d3": functools.partial(stage_d3_cot, model),
        "g_update": functools.partial(stage_g_update, model),
    }
    if jit:
        donate = {"d1": (0,), "d2": (0,), "g_update": (0,)}
        fns = {k: jax.jit(v, donate_argnums=donate.get(k, ()))
               for k, v in fns.items()}
    return fns


def split_step(model, fns, gS, dS, d2S, batch, rng, lr, lr_d2,
               frozen, use_d3: bool):
    """One full optimization step as a sequence of stage dispatches.

    Identical update math to `SinSKITModel._train_step` (the fused jit) —
    pinned by tests/test_split_step.py.  All stage calls are async; nothing
    here blocks on device results."""
    opt = model.opt
    fake_I, fake_T, new_g_stats, keys, rng_next = fns["g_forward"](
        gS.params, gS.stats, batch, rng)

    losses: Dict[str, Any] = {}
    pred_fake_I = None
    if dS is not None and "D" in model.model_names:
        dS, d1_losses, pred_fake_I = fns["d1"](
            dS, batch["S"], batch["I"], fake_I, keys["gp1"], lr)
        losses.update(d1_losses)

    d2S, d2_losses, stacks, pred_real_T = fns["d2"](
        d2S, batch, fake_I, fake_T, keys, lr_d2)
    losses.update(d2_losses)

    cot_I_list = []
    g_terms: Dict[str, Any] = {}
    if dS is not None and "D" in model.model_names and opt.lambda_G1_GAN > 0:
        g_gan, cot = fns["g1_gan"](dS.params, dS.stats, batch["S"], fake_I)
        g_terms["G_GAN"] = g_gan
        cot_I_list.append(cot)
    if opt.lambda_G1_L1 > 0 or opt.lambda_G1_lpips > 0:
        pix_aux, cot = fns["g1_pix"](frozen["lpips"], fake_I, batch["I"])
        g_terms.update(pix_aux)
        cot_I_list.append(cot)
    cot_T = None
    if (opt.lambda_G2_L1 > 0 or opt.lambda_G2_lpips > 0
            or (opt.lambda_G2_GAN > 0 and "D2" in model.model_names)):
        g2_aux, cot_T = fns["g2"](
            frozen["lpips"],
            d2S.params if d2S is not None else None,
            d2S.stats if d2S is not None else None,
            fake_T, batch["T_coords"], batch["T_images"], batch["T_valid"],
            stacks["S_patch"], stacks["fakeI_cond"], pred_real_T)
        g_terms.update(g2_aux)
    if use_d3:
        g_d3, d3_loss, cot = fns["d3"](frozen["clip"], frozen["d3"],
                                       fake_I, batch["I"],
                                       batch.get("d3_real_logits"))
        g_terms["G_D3"] = g_d3
        losses["D3_loss"] = d3_loss
        cot_I_list.append(cot)

    gS, g_total = fns["g_update"](gS, batch, new_g_stats, cot_I_list, cot_T,
                                  g_terms, lr)
    losses.update(g_terms)
    losses["G_total"] = g_total

    outputs = {"fake_I": fake_I, "fake_T": fake_T,
               "aug_real_I": stacks["aug_real_I"],
               "aug_fake_I": stacks["aug_fake_I"], "next_rng": rng_next}
    if pred_fake_I is not None:
        outputs["pred_fake_I"] = pred_fake_I
    return gS, dS, d2S, losses, outputs
