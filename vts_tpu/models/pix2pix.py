"""Pix2pix baseline: one shared 5-channel ResNet generator on SIMT patches,
two PatchGAN discriminators (S→I and S→T cGANs), vanilla GAN + L1·100.

Re-design of ``Pix2PixModel`` (reference models/pix2pix_model.py:20-592):
trains on 32² patch batches (patchskit, batch 32), tests on the full 1536²
sketch.  Fused jitted step: G forward under vjp → D and D2 updates (shared
0.5·(fake+real) losses) → G update (GAN_I + GAN_T + L1_I·λ + L1_T·λ).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config.options import str2bool
from ..losses.gan import gan_loss
from ..networks import define_D, define_G
from ..ops.normal import compute_normal
from ..ops.patch import gather_patches_from_coords
from ..ops.resize import resize_nearest
from ..utils.registry import register_model
from .base import NetState, adam_step, count_params, init_net_state, lr_factor, make_adam
from .sinskit import SinSKITModel


@register_model("pix2pix")
class Pix2PixModel(SinSKITModel):
    """Inherits the lifecycle/checkpoint/metric plumbing from SinSKITModel and
    replaces networks + the fused step."""

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

        parser.set_defaults(normG="batch", normD="batch", netG="resnet_9blocks",
                            dataset_mode="patchskit", crop_size=1536)
        if is_train:
            parser.set_defaults(pool_size=0, gan_mode="vanilla", return_patch=True,
                                batch_size=32, display_freq=320, print_freq=320,
                                save_latest_freq=320, validation_freq=320,
                                save_epoch_freq=50, display_id=0)
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
            self.netD = define_D(opt, opt.sketch_nc + opt.image_nc, netD="basic",
                                 train=True, dtype=self.dtype)
            self.netD2 = define_D(opt, opt.sketch_nc + opt.touch_nc, netD="basic",
                                  train=True, dtype=self.dtype)
            self.model_names += ["D", "D2"]
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

    # ------------------------------------------------------------------
    def setup(self, example_batch: Dict[str, np.ndarray]) -> None:
        opt = self.opt
        s = jnp.asarray(example_batch["S"])
        k0, k1, k2 = jax.random.split(self.rng, 3)
        self.states["G"] = init_net_state(self.netG, k0, self.tx_g, s)
        print(f"[pix2pix] netG params: {count_params(self.states['G'].params)/1e6:.3f} M")
        if self.isTrain:
            n, h, w, _ = s.shape
            d1_in = jnp.zeros((n, h, w, opt.sketch_nc + opt.image_nc))
            d2_in = jnp.zeros((n, h * self.mult, w * self.mult,
                               opt.sketch_nc + opt.touch_nc))
            self.states["D"] = init_net_state(self.netD, k1, self.tx_d, d1_in)
            self.states["D2"] = init_net_state(self.netD2, k2, self.tx_d2, d2_in)
            self._jit_step = jax.jit(self._train_step, donate_argnums=(0, 1, 2))
        self._jit_forward = jax.jit(self._forward_eval)

    def set_input(self, batch: Dict[str, np.ndarray], phase: str = "train") -> None:
        dev = {k: jnp.asarray(v) for k, v in batch.items() if k != "name"}
        if "M" in dev:
            dev["S"] = dev["S"] * dev["M"]
            if "I" in dev:
                dev["I"] = dev["I"] * dev["M"]
        for key in ("T_images", "I_masks", "T_coords", "T_valid",
                    "val_T_images", "val_I_masks", "val_T_coords", "val_T_valid"):
            if key in dev and dev[key].ndim >= 2:
                dev[key] = dev[key].reshape((-1,) + dev[key].shape[2:])
        if "T_images" in dev:
            dev["T_images"] = dev["T_images"] * dev["I_masks"]
        self._input = dev
        self.data_phase = phase

    # ------------------------------------------------------------------
    def _train_step(self, gS, dS, d2S, batch, rng, lr, lr_d2, epoch):
        opt = self.opt
        mode = opt.gan_mode
        S = batch["S"]
        I = batch["I"]
        M = batch.get("M", jnp.ones_like(S))
        # patch batch: T_images already folded to (B, pc, pc, 2)
        real_T = batch["T_images"]
        M_T = M if self.mult == 1 else resize_nearest(
            M, (M.shape[1] * self.mult, M.shape[2] * self.mult))
        losses = {}
        rng_next, _ = jax.random.split(rng)

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

        def d_loss(params, state, net, fake, real):
            stats = state.stats
            pf, stats = self._apply_d(params, stats, net, jnp.concatenate([S, fake], -1))
            lf = gan_loss(pf, False, mode)
            pr, stats = self._apply_d(params, stats, net, jnp.concatenate([S, real], -1))
            lrr = gan_loss(pr, True, mode)
            return (jnp.mean(lf) + jnp.mean(lrr)) * 0.5, (jnp.mean(lf), jnp.mean(lrr), stats)

        (l_d1, (lf1, lr1, d_stats)), d_grads = jax.value_and_grad(
            lambda p: d_loss(p, dS, self.netD, fake_I_d, I), has_aux=True)(dS.params)
        dS = adam_step(self.tx_d, dS, d_grads, lr, d_stats)
        (l_d2, (lf2, lr2, d2_stats)), d2_grads = jax.value_and_grad(
            lambda p: d_loss(p, d2S, self.netD2, fake_T_d, real_T), has_aux=True)(d2S.params)
        d2S = adam_step(self.tx_d2, d2S, d2_grads, lr_d2, d2_stats)
        losses.update(D_fake=lf1, D_real=lr1, D2_fake=lf2, D2_real=lr2)

        def g_loss_from_fake(fake_pair):
            f_I, f_T = fake_pair
            p_I, _ = self._apply_d(dS.params, dS.stats, self.netD,
                                   jnp.concatenate([S, f_I], -1))
            p_T, _ = self._apply_d(d2S.params, d2S.stats, self.netD2,
                                   jnp.concatenate([S, f_T], -1))
            g_gan_i = jnp.mean(gan_loss(p_I, True, mode))
            g_gan_t = jnp.mean(gan_loss(p_T, True, mode))
            g_l1 = (jnp.mean(jnp.abs(f_I - I)) + jnp.mean(jnp.abs(f_T - real_T))) \
                * opt.lambda_L1
            total = g_gan_i + g_gan_t + g_l1
            return total, {"G_GAN_I": g_gan_i, "G_GAN_T": g_gan_t, "G_L1": g_l1}

        (loss_g, g_aux), cot = jax.value_and_grad(g_loss_from_fake, has_aux=True)(
            (fake_I, fake_T))
        gS = adam_step(self.tx_g, gS, g_vjp(cot)[0], lr, new_g_stats)
        losses.update(g_aux)
        losses["G_total"] = loss_g
        outputs = {"fake_I": fake_I_d, "fake_T": fake_T_d, "next_rng": rng_next}
        return gS, dS, d2S, losses, outputs

    # ------------------------------------------------------------------
    def _forward_eval(self, g_vars, S, M, M_T):
        out = self.netG_eval.apply(g_vars, S).astype(jnp.float32)
        fake_I = out[..., : self.opt.image_nc] * M
        fake_T = out[..., self.opt.image_nc :] * M_T
        return fake_I, fake_T

    def optimize_parameters(self, epoch: int = 0) -> None:
        assert self._jit_step is not None, "call setup(batch) first"
        # one round-trip per step (see SinSKITModel.optimize_parameters)
        if getattr(self, "_scalar_epoch", None) != (epoch, getattr(self, "lr_override", 1.0)):
            scale = float(getattr(self, "lr_override", 1.0))
            f = lr_factor(self.opt.lr_policy, epoch - 1, self.opt)
            self._lr_dev = jnp.float32(self.opt.lr * scale * f)
            self._lr2_dev = jnp.float32(self.opt.lr_G2 * scale * f)
            self._epoch_dev = jnp.int32(epoch)
            self._scalar_epoch = (epoch, scale)
        if getattr(self, "_rng_dev", None) is None:
            self._rng_dev = self.rng
        gS, dS, d2S, losses, outputs = self._jit_step(
            self.states["G"], self.states["D"], self.states["D2"],
            self._input, self._rng_dev, self._lr_dev, self._lr2_dev,
            self._epoch_dev)
        self._rng_dev = outputs.pop("next_rng", None)
        self.states.update(G=gS, D=dS, D2=d2S)
        self._losses_dev = losses
        self._outputs = outputs
