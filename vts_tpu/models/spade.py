"""SPADE (GauGAN) baseline.

Re-design of ``SPADEModel`` (reference models/spade_model.py:25-884):
SPADEGenerator with a 5-channel head conditioned on the sketch-as-segmap,
two multiscale spectral-instance discriminators with intermediate features
(cat(S, I) and cat(S, T)), hinge GAN, GAN-feat(λ=10) + VGG19(λ=10, tiled
gx/gy) losses, optional KLD-VAE (λ=0.05), TTUR (G lr/2, D 2·lr, β=(0, 0.9)).
Trains on 32² SIMT patches (batch 16), tests full-canvas with
``output_width`` switched to the crop size.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config.options import str2bool
from ..losses.gan import feature_matching_loss, gan_loss
from ..losses.vgg import vgg_loss
from ..networks import define_D, define_G
from ..networks.spade_nets import ConvEncoder, kld_loss, reparameterize
from ..ops.resize import resize_nearest
from ..utils.registry import register_model
from .base import adam_step, init_net_state, lr_factor, make_adam
from .pix2pixhd import Pix2PixHDModel


@register_model("spade")
class SPADEModel(Pix2PixHDModel):

    @staticmethod
    def modify_commandline_options(parser, is_train=True):
        parser = Pix2PixHDModel.modify_commandline_options(parser, is_train)
        parser.add_argument("--use_vae", type=str2bool, default=False)
        parser.add_argument("--z_dim", type=int, default=256)
        parser.add_argument("--semantic_nc", type=int, default=1)
        parser.add_argument("--no_TTUR", action="store_true")
        parser.add_argument("--lambda_kld", type=float, default=0.05)
        parser.add_argument("--num_upsampling_layers", type=int, default=3)
        parser.add_argument("--output_width", type=int, default=32)
        parser.add_argument("--aspect_ratio", type=float, default=1.0)
        parser.set_defaults(
            ngf=64, dataset_mode="patchskit", crop_size=1536, pool_size=0,
            n_epochs=50, n_epochs_decay=0, netG="spade", netD="multiscale",
            normG="spectralspadesyncbatch3x3", normD="spectralinstance",
            lr=0.0002, gan_mode="hinge", num_D_D1=2, num_D_D2=2,
            beta1=0.0, beta2=0.9)
        if is_train:
            parser.set_defaults(return_patch=True, batch_size=16, display_freq=320,
                                print_freq=320, save_latest_freq=320,
                                validation_freq=320, save_epoch_freq=50,
                                display_id=0, output_width=32)
        else:
            parser.set_defaults(return_patch=False, batch_size=1, save_S_patch=True,
                                sample_bbox_per_patch=1, data_len=1,
                                load_size=1800, output_width=1536)
        return parser

    # ------------------------------------------------------------------
    def __init__(self, opt):
        super().__init__(opt)
        self.use_vae = bool(getattr(opt, "use_vae", False))
        if self.use_vae and self.isTrain:
            self.netE = ConvEncoder(ndf=opt.ngf, z_dim=opt.z_dim,
                                    crop_size=opt.crop_size, train=True,
                                    dtype=self.dtype)
            self.model_names.append("E")
        self.tx_e = make_adam(opt.beta1, opt.beta2) if self.isTrain else None

    def setup(self, example_batch) -> None:
        super().setup(example_batch)
        if self.use_vae and self.isTrain:
            k = jax.random.split(self.rng, 1)[0]
            i = jnp.asarray(example_batch["I"])
            self.states["E"] = init_net_state(self.netE, k, self.tx_e, i)

    def _g_lr(self, lr):
        return lr if getattr(self.opt, "no_TTUR", False) else lr / 2.0

    def _d_lr(self, lr):
        return lr if getattr(self.opt, "no_TTUR", False) else lr * 2.0

    # ------------------------------------------------------------------
    def _train_step(self, gS, dS, d2S, batch, rng, lr, lr_d2, epoch):
        opt = self.opt
        mode = opt.gan_mode
        S = batch["S"]
        I = batch["I"]
        M = batch.get("M", jnp.ones_like(S))
        real_T = batch["T_images"]
        M_T = M if self.mult == 1 else resize_nearest(
            M, (M.shape[1] * self.mult, M.shape[2] * self.mult))
        losses = {}
        g_lr = self._g_lr(lr)
        d_lr = self._d_lr(lr)
        k_vae, rng_next = jax.random.split(rng)

        e_state = self.states.get("E") if self.use_vae else None

        def g_fn(params):
            variables = {"params": params}
            z = None
            kld = 0.0
            if self.use_vae:
                mu, logvar = self.netE.apply(e_state.variables(), I)
                z = reparameterize(k_vae, mu, logvar)
                kld = kld_loss(mu, logvar) * opt.lambda_kld
            if gS.stats:
                variables["batch_stats"] = gS.stats
                out, mut = self.netG.apply(variables, S, z, mutable=["batch_stats"])
                new_stats = mut["batch_stats"]
            else:
                out = self.netG.apply(variables, S, z)
                new_stats = gS.stats
            out = out.astype(jnp.float32)
            return (out[..., : opt.image_nc] * M,
                    out[..., opt.image_nc :] * M_T), (new_stats, kld)

        (fake_I, fake_T), g_vjp, (new_g_stats, kld) = jax.vjp(
            g_fn, gS.params, has_aux=True)
        fake_I_d = jax.lax.stop_gradient(fake_I)
        fake_T_d = jax.lax.stop_gradient(fake_T)

        # ImagePool on the D1 fake pass — the reference spade model
        # instantiates the pool too (reference models/spade_model.py:333);
        # state rides the batch dict exactly like pix2pixHD's (pix2pixhd.py).
        # (fold_in keeps the k_vae/rng_next stream unchanged)
        rng_pool = jax.random.fold_in(rng, 1)
        fake_concat_I = jnp.concatenate([S, fake_I_d], -1)
        pool_out = {}
        if "pool_buf" in batch:
            from ..utils.image_pool import pool_query
            new_buf, new_n, fake_concat_I = pool_query(
                batch["pool_buf"], batch["pool_n"], fake_concat_I, rng_pool)
            pool_out = {"pool_buf": new_buf, "pool_n": new_n}

        def d_loss(params, state, net, fake, real, fake_concat=None):
            stats = state.stats
            fc = fake_concat if fake_concat is not None \
                else jnp.concatenate([S, fake], -1)
            pf, stats = self._apply_d(params, stats, net, fc)
            lf = jnp.mean(gan_loss(pf, False, mode))
            pr, stats = self._apply_d(params, stats, net, jnp.concatenate([S, real], -1))
            lrr = jnp.mean(gan_loss(pr, True, mode))
            return (lf + lrr) * 0.5, (lf, lrr, stats, pr)

        (l_d1, (lf1, lr1, d_stats, pred_real_I)), d_grads = jax.value_and_grad(
            lambda p: d_loss(p, dS, self.netD, fake_I_d, I,
                             fake_concat=fake_concat_I), has_aux=True)(dS.params)
        dS = adam_step(self.tx_d, dS, d_grads, d_lr, d_stats)
        (l_d2, (lf2, lr2, d2_stats, pred_real_T)), d2_grads = jax.value_and_grad(
            lambda p: d_loss(p, d2S, self.netD2, fake_T_d, real_T), has_aux=True)(d2S.params)
        d2S = adam_step(self.tx_d2, d2S, d2_grads, d_lr, d2_stats)
        losses.update(D_fake=lf1, D_real=lr1, D2_fake=lf2, D2_real=lr2)

        def g_loss_from_fake(fake_pair):
            f_I, f_T = fake_pair
            p_I, _ = self._apply_d(dS.params, dS.stats, self.netD,
                                   jnp.concatenate([S, f_I], -1))
            p_T, _ = self._apply_d(d2S.params, d2S.stats, self.netD2,
                                   jnp.concatenate([S, f_T], -1))
            aux = {}
            aux["G_GAN"] = jnp.mean(gan_loss(p_I, True, mode)) \
                + jnp.mean(gan_loss(p_T, True, mode))
            total = aux["G_GAN"]
            if not getattr(opt, "no_ganFeat_loss", False) and opt.getIntermFeat_D:
                fm = feature_matching_loss(p_I, pred_real_I, opt.n_layers_D,
                                           opt.num_D_D1) \
                    + feature_matching_loss(p_T, pred_real_T, opt.n_layers_D,
                                            opt.num_D_D2)
                aux["G_GAN_Feat"] = fm * opt.lambda_feat
                total = total + aux["G_GAN_Feat"]
            if not getattr(opt, "no_vgg_loss", False):
                v_i = vgg_loss(self.vgg_params, f_I, I)
                tile3 = lambda x, c: jnp.tile(x[..., c : c + 1], (1, 1, 1, 3))
                v_t = vgg_loss(self.vgg_params, tile3(f_T, 0), tile3(real_T, 0)) \
                    + vgg_loss(self.vgg_params, tile3(f_T, 1), tile3(real_T, 1))
                aux["G_VGG"] = (v_i + v_t) * opt.lambda_vgg
                total = total + aux["G_VGG"]
            return total, aux

        (loss_g, g_aux), cot = jax.value_and_grad(g_loss_from_fake, has_aux=True)(
            (fake_I, fake_T))
        gS = adam_step(self.tx_g, gS, g_vjp(cot)[0], g_lr, new_g_stats)
        losses.update(g_aux)
        if self.use_vae:
            losses["G_KLD"] = kld
        losses["G_total"] = loss_g + (kld if self.use_vae else 0.0)
        outputs = {"fake_I": fake_I_d, "fake_T": fake_T_d,
                   "next_rng": rng_next}
        outputs.update(pool_out)  # carry the ImagePool state like pix2pixhd
        return gS, dS, d2S, losses, outputs
