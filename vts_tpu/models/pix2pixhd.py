"""Pix2PixHD baseline.

Re-design of ``Pix2PixHDModel`` (reference models/pix2pixHD_model.py:24-968):
GlobalGenerator with a 5-channel head on 32² SIMT patches (batch 32), two
multiscale discriminators with intermediate features (D on cat(S, I), D2 on
cat(S, T)), lsgan, losses GAN + GAN-feat(λ=10) + VGG19(λ=10, I plus tiled
gx/gy); two-stage schedule (``--niter_fix_global`` freezes the global stem).

Reference quirk preserved: the shipped GAN-feat term compares the fake
features with themselves detached (pix2pixHD_model.py:663-677) and is
therefore identically zero — logged but inert.  ``--correct_gan_feat true``
matches against the real-side features instead (the upstream pix2pixHD
formulation).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config.options import str2bool
from ..losses.gan import feature_matching_loss, gan_loss
from ..losses.vgg import init_vgg19_params, load_vgg19_weights, vgg_loss
from ..networks import define_D, define_G
from ..ops.resize import resize_nearest
from ..utils.registry import register_model
from .base import NetState, adam_step, count_params, init_net_state, lr_factor, make_adam
from .pix2pix import Pix2PixModel


@register_model("pix2pixhd")  # registry is case-insensitive: also '--model pix2pixHD'
class Pix2PixHDModel(Pix2PixModel):

    supports_image_pool = True  # D1 fake pass queries the pool when pool_size>0

    @staticmethod
    def modify_commandline_options(parser, is_train=True):
        parser.add_argument("--lambda_L1", type=float, default=100.0)
        parser.add_argument("--lr_G2", type=float, default=0.0005)
        parser.add_argument("--sketch_nc", type=int, default=1)
        parser.add_argument("--image_nc", type=int, default=3)
        parser.add_argument("--touch_nc", type=int, default=2)
        parser.add_argument("--data_len", type=int, default=200)
        parser.add_argument("--center_w", type=int, default=1280)
        parser.add_argument("--center_h", type=int, default=960)
        parser.add_argument("--num_touch_patch_for_logging", type=int, default=10)
        parser.add_argument("--use_bg_mask", type=str2bool, default=True)
        parser.add_argument("--T_resolution_multiplier", type=int, default=1)
        parser.add_argument("--padded_size", type=int, default=1800)
        parser.add_argument("--sample_bbox_per_patch", type=int, default=2)
        parser.add_argument("--save_S_patch", type=str2bool, default=False)
        parser.add_argument("--save_T_concat_tensor", type=str2bool, default=False)
        parser.add_argument("--save_raw_arr_vis", type=str2bool, default=False)
        parser.add_argument("--scale_nz", type=float, default=0.25)
        parser.add_argument("--return_patch", type=str2bool, default=False)
        parser.add_argument("--batch_size_G2", type=int, default=64)
        parser.add_argument("--batch_size_G2_val", type=int, default=128)
        parser.add_argument("--w_resampling", type=str2bool, default=True)
        parser.add_argument("--resampling_w_min", type=int, default=1)
        parser.add_argument("--resampling_w_max", type=int, default=10)
        parser.add_argument("--lpips_weights", type=str, default="")
        parser.add_argument("--inception_weights", type=str, default="")
        # pix2pixHD-specific
        parser.add_argument("--feat_num", type=int, default=3)
        parser.add_argument("--load_features", action="store_true")
        parser.add_argument("--n_downsample_E", type=int, default=4)
        parser.add_argument("--nef", type=int, default=16)
        parser.add_argument("--n_clusters", type=int, default=10)
        parser.add_argument("--n_downsample_global", type=int, default=4)
        parser.add_argument("--n_blocks_global", type=int, default=9)
        parser.add_argument("--n_blocks_local", type=int, default=3)
        parser.add_argument("--n_local_enhancers", type=int, default=1)
        parser.add_argument("--niter_fix_global", type=int, default=0)
        parser.add_argument("--getIntermFeat_D", type=str2bool, default=True)
        parser.add_argument("--num_D_D1", type=int, default=2)
        parser.add_argument("--num_D_D2", type=int, default=2)
        parser.add_argument("--no_ganFeat_loss", action="store_true")
        parser.add_argument("--no_vgg_loss", action="store_true")
        parser.add_argument("--lambda_feat", type=float, default=10.0)
        parser.add_argument("--lambda_vgg", type=float, default=10.0)
        parser.add_argument("--correct_gan_feat", type=str2bool, default=False)
        parser.add_argument("--vgg_weights", type=str, default="",
                            help="torchvision vgg19 checkpoint for the exact VGG loss")

        parser.set_defaults(netG="global", netD="multiscale", ngf=64,
                            dataset_mode="patchskit", crop_size=1536,
                            normG="instance", normD="instance", pool_size=0,
                            n_epochs=50, n_epochs_decay=150, gan_mode="lsgan")
        if is_train:
            parser.set_defaults(return_patch=True, batch_size=32, display_freq=320,
                                print_freq=320, save_latest_freq=320,
                                validation_freq=320, save_epoch_freq=50, display_id=0)
        else:
            parser.set_defaults(return_patch=False, batch_size=1, save_S_patch=True,
                                sample_bbox_per_patch=1, data_len=1)
        return parser

    # ------------------------------------------------------------------
    def __init__(self, opt):
        self.opt = opt
        self.isTrain = bool(getattr(opt, "isTrain", True))
        self.mult = int(getattr(opt, "T_resolution_multiplier", 1))
        self.dtype = jnp.bfloat16 if getattr(opt, "dtype", "float32") == "bfloat16" else None
        self.rng = jax.random.key(getattr(opt, "seed", 0))

        out_nc = opt.image_nc + opt.touch_nc
        self.netG = define_G(opt, opt.sketch_nc, out_nc, train=True, dtype=self.dtype)
        self.netG_eval = define_G(opt, opt.sketch_nc, out_nc, train=False, dtype=None)
        self.model_names = ["G"]
        if self.isTrain:
            self.netD = define_D(opt, opt.sketch_nc + opt.image_nc, netD="multiscale",
                                 num_D=opt.num_D_D1, train=True, dtype=self.dtype)
            self.netD2 = define_D(opt, opt.sketch_nc + opt.touch_nc, netD="multiscale",
                                  num_D=opt.num_D_D2, train=True, dtype=self.dtype)
            self.model_names += ["D", "D2"]
        vw = getattr(opt, "vgg_weights", "")
        self.vgg_params = load_vgg19_weights(vw) if vw else init_vgg19_params(0)
        from ..losses.lpips import init_lpips_params, load_lpips_weights
        from ..metrics.inception import init_inception_params, load_inception_weights
        lw = getattr(opt, "lpips_weights", "")
        self.lpips_params = load_lpips_weights(lw) if lw else init_lpips_params(0)
        iw = getattr(opt, "inception_weights", "")
        self.inception_params = load_inception_weights(iw) if iw else init_inception_params(0)
        self.tx_g = make_adam(opt.beta1, opt.beta2) if self.isTrain else None
        self.tx_d = make_adam(opt.beta1, opt.beta2) if self.isTrain else None
        self.tx_d2 = make_adam(opt.beta1, opt.beta2) if self.isTrain else None
        self.states: Dict[str, NetState] = {}
        self._jit_step = None
        self._jit_forward = None
        self.losses: Dict[str, float] = {}
        self.metrics: Dict[str, float] = {}
        from ..metrics.evaluate import DEFAULT_EVAL_METRICS
        self.eval_metrics = list(DEFAULT_EVAL_METRICS)
        self._input: Dict[str, jnp.ndarray] = {}
        self._g_frozen_mask = None

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
        rng_next, rng_pool = jax.random.split(rng)

        def g_fn(params):
            variables = {"params": params}
            if gS.stats:
                variables["batch_stats"] = gS.stats
                out, mut = self.netG.apply(variables, S, mutable=["batch_stats"])
                new_stats = mut["batch_stats"]
            else:
                out = self.netG.apply(variables, S)
                new_stats = gS.stats
            out = out.astype(jnp.float32)
            return (out[..., : opt.image_nc] * M, out[..., opt.image_nc :] * M_T), new_stats

        (fake_I, fake_T), g_vjp, new_g_stats = jax.vjp(g_fn, gS.params, has_aux=True)
        fake_I_d = jax.lax.stop_gradient(fake_I)
        fake_T_d = jax.lax.stop_gradient(fake_T)

        # ImagePool on the D1 fake pass (reference pix2pixHD_model.py:582:
        # the pooled entity is cat(label, fake.detach())); pool state rides
        # the batch dict as device arrays and is updated in-jit.
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
        dS = adam_step(self.tx_d, dS, d_grads, lr, d_stats)
        (l_d2, (lf2, lr2, d2_stats, pred_real_T)), d2_grads = jax.value_and_grad(
            lambda p: d_loss(p, d2S, self.netD2, fake_T_d, real_T), has_aux=True)(d2S.params)
        dS2_new = adam_step(self.tx_d2, d2S, d2_grads, lr_d2, d2_stats)
        d2S = dS2_new
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
                if opt.correct_gan_feat:
                    fm = feature_matching_loss(p_I, pred_real_I, opt.n_layers_D,
                                               opt.num_D_D1) \
                        + feature_matching_loss(p_T, pred_real_T, opt.n_layers_D,
                                                opt.num_D_D2)
                else:
                    # reference quirk: compares fake features to themselves → 0
                    fm = 0.0 * aux["G_GAN"]
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
        g_grads = g_vjp(cot)[0]
        if self._g_frozen_mask is not None:
            g_grads = jax.tree_util.tree_map(
                lambda g, m: g * m, g_grads, self._g_frozen_mask)
        gS = adam_step(self.tx_g, gS, g_grads, lr, new_g_stats)
        losses.update(g_aux)
        losses["G_total"] = loss_g
        outputs = {"fake_I": fake_I_d, "fake_T": fake_T_d, "next_rng": rng_next}
        outputs.update(pool_out)
        return gS, dS, d2S, losses, outputs

    # ------------------------------------------------------------------
    def optimize_parameters(self, epoch: int = 0) -> None:
        pool_size = int(getattr(self.opt, "pool_size", 0))
        if pool_size > 0 and self.isTrain:
            if getattr(self, "_pool_state", None) is None:
                s = self._input["S"]
                shape = (pool_size, s.shape[1], s.shape[2],
                         self.opt.sketch_nc + self.opt.image_nc)
                self._pool_state = {"pool_buf": jnp.zeros(shape, jnp.float32),
                                    "pool_n": jnp.int32(0)}
            self._input = dict(self._input, **self._pool_state)
        super().optimize_parameters(epoch)
        if pool_size > 0 and self.isTrain:
            self._pool_state = {"pool_buf": self._outputs.pop("pool_buf"),
                                "pool_n": self._outputs.pop("pool_n")}

    # ------------------------------------------------------------------
    def update_fixed_params(self, epoch: int) -> None:
        """Two-stage schedule: while epoch < niter_fix_global, only the local
        enhancer trains (global stem gradient-masked); afterwards everything
        (reference pix2pixHD_model.py:942-963)."""
        nf = int(getattr(self.opt, "niter_fix_global", 0))
        if nf <= 0 or "G" not in self.states:
            return
        if epoch < nf and self._g_frozen_mask is None:
            params = self.states["G"].params

            def mask_fn(path, leaf):
                frozen = any("global" in str(p) or "core" in str(p) for p in path)
                return jnp.zeros_like(leaf) if frozen else jnp.ones_like(leaf)

            self._g_frozen_mask = jax.tree_util.tree_map_with_path(mask_fn, params)
            self._jit_step = jax.jit(self._train_step, donate_argnums=(0, 1, 2))
        elif epoch >= nf and self._g_frozen_mask is not None:
            print("------------ Now also finetuning global generator -----------")
            self._g_frozen_mask = None
            self._jit_step = jax.jit(self._train_step, donate_argnums=(0, 1, 2))
